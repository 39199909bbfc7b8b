"""Per-partition checkpoint manifest — the at-least-once commit point.

Reference counterpart: the persisted queue's checkpoint machinery —
logstash-core/src/main/java/org/logstash/ackedqueue/Checkpoint.java +
io/FileCheckpointIO.java (head/tail checkpoints advance as batches are
acked, Queue#ack being the at-least-once commit). The Spark
re-expression (SURVEY §2.1 PQ row, §7-M6): the unit of work is a
url-hash **bucket group** (micro-batch); each sink write is idempotent
per bucket (dynamic partition overwrite on the ``bucket`` column), and
a JSON manifest entry recorded AFTER all sinks of a batch committed is
the ack. Resume = skip bucket groups present in the manifest; a batch
that died mid-write is simply rewritten (idempotent), giving effective
exactly-once per sink partition.

The manifest also carries per-batch lineage (input path, bucket list,
per-sink row counts, metrics) — the "per-partition lineage + metrics"
the north rule requires.
"""

from __future__ import annotations

import json
from pathlib import Path


class CheckpointManifest:
    def __init__(self, run_dir: str | Path):
        rd = str(run_dir)
        if "://" in rd and not rd.startswith("file://"):
            # pathlib would silently collapse 's3://bucket/x' into a
            # LOCAL './s3:/bucket/x' directory, divorcing the ack
            # manifest from the data it acks (review finding) — refuse
            # loudly; cluster deployments put the manifest on shared
            # local/NFS storage or a file:// mount
            raise ValueError(
                f"checkpoint manifest requires a local run_dir, got "
                f"{rd!r}; remote-object-store manifests are not "
                "supported (sink data may be remote — the manifest "
                "must be driver-local)")
        if rd.startswith("file://"):
            rd = rd[len("file://"):]
        self.dir = Path(rd) / "_checkpoints"
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, batch_id: int) -> Path:
        return self.dir / f"batch-{batch_id:05d}.json"

    def completed_batches(self) -> dict[int, dict]:
        out = {}
        for p in sorted(self.dir.glob("batch-*.json")):
            try:
                entry = json.loads(p.read_text())
            except json.JSONDecodeError:
                continue  # torn write of the manifest itself → batch not acked
            out[entry["batch_id"]] = entry
        return out

    def ack(self, batch_id: int, entry: dict) -> None:
        """Atomic, durable manifest commit: write temp, fsync, then
        os.replace (atomic on POSIX AND overwrites an existing torn
        file — plain rename raises FileExistsError on non-POSIX when a
        previous crash left a garbage ack behind). A best-effort
        directory fsync pins the rename itself."""
        import os

        entry = {"batch_id": batch_id, **entry}
        tmp = self._path(batch_id).with_suffix(".tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(entry, sort_keys=True))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(batch_id))
        try:
            dfd = os.open(self.dir, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass  # directory fsync unsupported on this platform

    def reset(self) -> None:
        for p in self.dir.glob("batch-*.json"):
            p.unlink()
