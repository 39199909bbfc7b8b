#!/usr/bin/env python
"""Generate literal VALUES oracles for the seeded datapipe suite queries.

Usage:  python scripts/gen_datapipe_oracles.py [sf_dir]   (default sf0.01)

Writes logstash_spark/suite_expected.py with the expected outputs of
* dedup_minhash_lsh        (kept doc_ids)
* dedup_simhash            (kept doc_ids)
* dedup_embedding_neardup  ((a, b, cosine) pairs)
* ANN LSH / IVF top-k      ((vec_id, cosine) rows)

computed by an INDEPENDENT reimplementation: pure-Python XXH64
(scripts/xxh64_pure.py, validated bit-for-bit against Spark's xxhash64
in tests/test_oracle_refimpl.py), plain Python loops and numpy — no
pyspark import anywhere in this script. Shared with the engine are only
the public algorithm parameters (shingle k, permutation count, band
layout, hyperplane seed) — the same relationship the fingerprint HMAC
oracle has to stdlib hmac. Float folds replicate Spark's left-to-right
evaluation order so doubles are bit-identical; rounding replicates
Spark's HALF_UP over the shortest-decimal rendering
(java.math.BigDecimal.valueOf).

The literals are tied to the driver's sf0.01 fixtures (the only scale
the correctness gate runs).
"""

from __future__ import annotations

import re
import sys
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
from xxh64_pure import (  # noqa: E402
    spark_xxhash64_long_intseed,
    spark_xxhash64_str,
    spark_xxhash64_str_intseed,
)

_WS = re.compile(r"\s+")


def spark_round(x: float, scale: int) -> float:
    """Spark F.round on DoubleType: BigDecimal.valueOf(x) (shortest
    decimal rendering, = Python repr) then setScale(scale, HALF_UP)."""
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), ROUND_HALF_UP))


def words(text: str) -> list[str]:
    return _WS.split(text.strip())


def word_shingles(text: str, k: int = 3) -> list[str]:
    ws = words(text)
    if len(ws) >= k:
        out, seen = [], set()
        for i in range(len(ws) - k + 1):
            s = " ".join(ws[i:i + k])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out
    return [" ".join(ws)]


# ------------------------------------------------------------- minhash
_M31 = (1 << 31) - 1


def _perm_coeffs(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M31, size=num_perm)
    b = rng.integers(0, _M31, size=num_perm)
    return [int(x) for x in a], [int(x) for x in b]


def minhash_kept(docs: list[tuple[int, str]], threshold=0.8, num_perm=64,
                 bands=16, hot_cap=32) -> list[int]:
    rows_per_band = num_perm // bands
    pa, pb = _perm_coeffs(num_perm)
    hs: dict[int, frozenset[int]] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in docs:
        sh = word_shingles(text)
        base_hashes = [spark_xxhash64_str(s, 42) for s in sh]  # aligned to sh
        hset = list(dict.fromkeys(base_hashes))
        hs[doc_id] = frozenset(hset)
        h31 = [h % _M31 for h in hset]  # Python % ≡ Spark pmod (nonneg)
        sig = [min((pa[p] * h + pb[p]) % _M31 for h in h31)
               for p in range(num_perm)]
        for b in range(bands):
            key_str = ",".join(
                str(sig[b * rows_per_band + r]) for r in range(rows_per_band)
            )
            key = spark_xxhash64_str(key_str, 42)
            buckets.setdefault((b, key), []).append(doc_id)
    cands: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        if len(members) <= hot_cap:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cands.add((ms[i], ms[j]))
        else:
            rep = min(members)
            for m in members:
                if m != rep:
                    cands.add((rep, m))
    dropped = set()
    for a, b in cands:
        inter = len(hs[a] & hs[b])
        union = len(hs[a] | hs[b])
        if union and inter / union >= threshold:
            dropped.add(b)
    return sorted(d for d, _ in docs if d not in dropped)


# ------------------------------------------------------------- simhash
def simhash_sig(text: str) -> int:
    hashes = [spark_xxhash64_str(w, 42) for w in words(text)]
    votes = [0] * 64
    for h in hashes:
        u = h & ((1 << 64) - 1)
        for j in range(64):
            votes[j] += 1 if (u >> j) & 1 else -1
    sig = 0
    for j in range(64):
        if votes[j] > 0:
            sig |= 1 << j
    return sig


def simhash_kept(docs: list[tuple[int, str]], max_hamming=3) -> list[int]:
    sigs = {d: simhash_sig(t) for d, t in docs}
    ids = sorted(sigs)
    dropped = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= max_hamming:
                dropped.add(b)
    return sorted(d for d in ids if d not in dropped)


# ----------------------------------------------------- embedding ops
def fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def fold_sq(a) -> float:
    acc = 0.0
    for x in a:
        acc += x * x
    return acc


def cosine(a, b) -> float:
    import math

    return fold_dot(a, b) / (math.sqrt(fold_sq(a)) * math.sqrt(fold_sq(b)))


def hyperplane_bucket(emb, planes) -> int:
    bucket = 0
    for p in range(planes.shape[0]):
        if fold_dot(emb, [float(v) for v in planes[p]]) >= 0:
            bucket += 1 << p
    return bucket


def neardup_pairs(vecs: dict[int, list[float]], threshold=0.95, n_planes=12,
                  seed=42) -> list[tuple[int, int, float]]:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, 64))
    by_bucket: dict[int, list[int]] = {}
    for vid in vecs:
        by_bucket.setdefault(hyperplane_bucket(vecs[vid], planes), []).append(vid)
    out = []
    for members in by_bucket.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                c = cosine(vecs[ms[i]], vecs[ms[j]])
                if c >= threshold:
                    out.append((ms[i], ms[j], spark_round(c, 4)))
    return sorted(out)


def ann_lsh(vecs: dict[int, list[float]], qvec, k=10, n_planes=8, multiprobe=2,
            seed=42) -> list[tuple[int, float]]:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, 64))
    q = np.asarray(qvec, dtype=np.float64)
    qbucket = int(sum((1 << p) for p in range(n_planes) if planes[p] @ q >= 0))
    probe = {qbucket}
    probe |= {qbucket ^ (1 << b) for b in range(n_planes)}
    if multiprobe >= 2:
        probe |= {
            qbucket ^ (1 << b1) ^ (1 << b2)
            for b1 in range(n_planes) for b2 in range(b1 + 1, n_planes)
        }
    rows = [
        (vid, spark_round(cosine(vecs[vid], qvec), 6))
        for vid in vecs
        if hyperplane_bucket(vecs[vid], planes) in probe
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def ann_ivf(vecs: dict[int, list[float]], qvec, k=10, n_centroids=16, nprobe=4,
            seed=42) -> list[tuple[int, float]]:
    # centroid init: rows ordered by xxhash64(vec_id, seed) (signed asc)
    order = sorted(vecs, key=lambda v: spark_xxhash64_long_intseed(v, seed))
    centroids = [vecs[v] for v in order[:n_centroids]]
    q = np.asarray(qvec, dtype=np.float64)
    cdist = ((np.asarray(centroids) - q) ** 2).sum(axis=1)
    probe = set(int(i) for i in np.argsort(cdist)[:nprobe])

    def assign(emb) -> int:
        dists = [fold_dot([a - b for a, b in zip(emb, c)],
                          [a - b for a, b in zip(emb, c)]) for c in centroids]
        return dists.index(min(dists))

    rows = [
        (vid, spark_round(cosine(vecs[vid], qvec), 6))
        for vid in vecs if assign(vecs[vid]) in probe
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repo = Path(__file__).resolve().parent.parent

    dt = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(dt["doc_id"].to_pylist(), dt["text"].to_pylist()))

    et = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = {
        int(v): [float(x) for x in e]
        for v, e in zip(et["vec_id"].to_pylist(), et["embedding"].to_pylist())
    }
    # the near-dup suite corpus: originals + scaled copies of ids < 25
    nd_corpus = dict(emb)
    for vid in list(emb):
        if vid < 25:
            nd_corpus[vid + 1_000_000] = [x * 2.0 for x in emb[vid]]

    qvec = [(1.0, 0.5, -0.25)[i % 3] for i in range(64)]

    mh = minhash_kept(docs)
    sh = simhash_kept(docs)
    nd = neardup_pairs(nd_corpus)
    lsh = ann_lsh(emb, qvec)
    ivf = ann_ivf(emb, qvec)

    out = repo / "logstash_spark" / "suite_expected.py"
    with open(out, "w") as f:
        f.write(
            '"""GENERATED by scripts/gen_datapipe_oracles.py — do not edit.\n\n'
            "Expected outputs of the seeded dedup/ANN suite queries at the\n"
            f"driver's correctness scale ({sf_dir}), computed by the\n"
            "independent pure-Python/numpy reimplementation in that script\n"
            "(no pyspark). Embedded as literal VALUES oracles in suite.py.\n"
            '"""\n\n'
        )
        f.write(f"MINHASH_KEPT = {mh!r}\n\n")
        f.write(f"SIMHASH_KEPT = {sh!r}\n\n")
        f.write(f"NEARDUP_PAIRS = {nd!r}\n\n")
        f.write(f"ANN_LSH_TOP10 = {lsh!r}\n\n")
        f.write(f"ANN_IVF_TOP10 = {ivf!r}\n")
    print(f"wrote {out}: minhash {len(mh)} kept, simhash {len(sh)} kept, "
          f"{len(nd)} neardup pairs, lsh/ivf top-{len(lsh)}/{len(ivf)}")


if __name__ == "__main__":
    main()
