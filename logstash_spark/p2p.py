"""Pipeline-to-pipeline bus: virtual addresses between pipelines.

Reference counterpart: org/logstash/plugins/pipeline/PipelineBus.java —
upstream pipelines communicate through in-memory virtual addresses:
``output { pipeline { send_to => [addr] } }`` publishes each event
verbatim, ``input { pipeline { address => addr } }`` subscribes; many
senders may feed one address (the bus merges streams).

Spark re-expression: **an address IS an intermediate table** — a
parquet directory under the upstream pipeline's run dir. A ``send_to``
lowers to an ordinary full-row sink (so conditional routing, per-sink
metrics, and the idempotent bucket-overwrite resume contract are
uniform with every other output), and a downstream ``address`` input is
a plain ``spark.read.parquet`` over every sender's address path,
union-by-name (the bus merge). ``PipelineGraph.run`` topologically
orders the pipelines by address edges and runs each once — the batch
analog of the bus; a streaming deployment maps the same directory
layout onto readStream/writeStream per address. Cycles (legal upstream
because queues decouple them) cannot terminate in a batch DAG and are
rejected at plan time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from .metrics import PipelineMetrics
from .pipeline import Pipeline

P2P_PREFIX = "_addr_"


class PipelineGraph:
    """A set of pipeline specs wired by pipeline-to-pipeline addresses.

    Spec extensions over ``Pipeline``:
      * output entry ``{"pipeline": {"send_to": ["addr", …]}, "when": …}``
      * top-level ``"input": {"pipeline": {"address": "addr"}}``
    Root pipelines (no address input) take their source DataFrame from
    the ``inputs`` dict keyed by pipeline id.
    """

    def __init__(self, specs: list[dict]):
        self.specs = []
        self.sends: dict[str, list[str]] = {}
        self.listens: dict[str, str] = {}
        # addr → [(sender pid, sink name)] — one entry PER send_to
        # occurrence (a pid may feed an address from several branches)
        self.sender_sinks: dict[str, list[tuple[str, str]]] = {}
        ids = []
        for s in specs:
            s = dict(s)
            pid = s.get("id", "main")
            ids.append(pid)
            outs = []
            seen_addr: dict[str, int] = {}
            for o in s.get("outputs", []):
                if "pipeline" in o:
                    addrs = o["pipeline"]["send_to"]
                    addrs = [addrs] if isinstance(addrs, str) else list(addrs)
                    for a in addrs:
                        # several output entries may send to the SAME
                        # address (PipelineBus merges them) — each needs
                        # its own sink name/path, else they'd clobber
                        # each other's bucket partitions concurrently
                        k = seen_addr.get(a, 0)
                        seen_addr[a] = k + 1
                        name = P2P_PREFIX + a + (f"__{k + 1}" if k else "")
                        sink = {"name": name}
                        if o.get("when"):
                            sink["when"] = o["when"]
                        outs.append(sink)
                        self.sends.setdefault(pid, []).append(a)
                        self.sender_sinks.setdefault(a, []).append(
                            (pid, name))
                else:
                    outs.append(o)
            s["outputs"] = outs
            inp = s.get("input")
            if isinstance(inp, dict) and "pipeline" in inp:
                self.listens[pid] = inp["pipeline"]["address"]
            self.specs.append(s)
        if len(set(ids)) != len(ids):
            raise ValueError(f"duplicate pipeline ids: {ids}")
        self.writers: dict[str, list[str]] = {}
        for pid, addrs in self.sends.items():
            for a in addrs:
                if pid not in self.writers.setdefault(a, []):
                    self.writers[a].append(pid)
        missing = [
            (pid, a) for pid, a in self.listens.items() if a not in self.writers
        ]
        if missing:
            raise ValueError(
                f"pipeline inputs listen on addresses nobody sends to: {missing}"
            )
        self.order = self._toposort(ids)

    def _toposort(self, ids: list[str]) -> list[str]:
        deps = {
            pid: set(self.writers.get(addr, []))
            for pid, addr in self.listens.items()
        }
        done: list[str] = []
        pending = list(ids)
        while pending:
            ready = [p for p in pending if deps.get(p, set()) <= set(done)]
            if not ready:
                raise ValueError(
                    f"pipeline-to-pipeline cycle among {sorted(pending)} — "
                    "cycles need a queue to terminate (PipelineBus semantics); "
                    "a batch DAG cannot express them"
                )
            for p in ready:
                done.append(p)
                pending.remove(p)
        return done

    def run(
        self,
        spark: SparkSession,
        inputs: dict[str, DataFrame],
        run_dir: str,
        **run_kwargs,
    ) -> dict[str, PipelineMetrics]:
        by_id = {s.get("id", "main"): s for s in self.specs}
        metrics: dict[str, PipelineMetrics] = {}
        for pid in self.order:
            spec = by_id[pid]
            if pid in self.listens:
                addr = self.listens[pid]
                frames = []
                for w, sink_name in self.sender_sinks[addr]:
                    # a sender whose `when` matched zero rows this batch
                    # writes no parquet parts (only _SUCCESS) — an empty
                    # stream is legal PipelineBus behavior, so skip the
                    # unreadable path rather than crash on schema inference
                    try:
                        frames.append(
                            spark.read.parquet(f"{run_dir}/{w}/{sink_name}")
                        )
                    except Exception as e:
                        # structured condition first, message substring as
                        # the fallback (router._write_catalog_table stance)
                        cond = (e.getCondition()
                                if hasattr(e, "getCondition") else None)
                        legal_empty = cond == "UNABLE_TO_INFER_SCHEMA" or (
                            cond is None and "UNABLE_TO_INFER_SCHEMA" in str(e)
                        )
                        if not legal_empty:
                            raise
                if not frames:
                    raise ValueError(
                        f"pipeline {pid!r}: address {addr!r} received zero "
                        "rows from every sender in this batch — a batch DAG "
                        "needs at least one row (or run the downstream "
                        "pipeline with an explicit source) to carry a schema"
                    )
                df = reduce(
                    lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
                )
                # the downstream pipeline re-buckets on its own key
                if "bucket" in df.columns:
                    df = df.drop("bucket")
            else:
                if pid not in inputs:
                    raise ValueError(
                        f"pipeline {pid!r} has no address input and no entry "
                        f"in inputs{list(inputs)}"
                    )
                df = inputs[pid]
            kw = dict(run_kwargs)
            if "bucket_on" in spec:
                kw["bucket_on"] = spec["bucket_on"]
            metrics[pid] = Pipeline(spec).run(df, f"{run_dir}/{pid}", **kw)
        return metrics
