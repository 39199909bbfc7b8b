"""Multimodal columns: opaque binary media + typed metadata.

Design (SURVEY brief): image/audio/video travel as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample are ``mapInPandas`` operators over Arrow batches. The
actual codec calls are STUBBED (this container ships no media
libraries): each operator tries the real library import and otherwise
uses a clearly-marked deterministic fake — the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is real and
tested either way.

Media-table schema::

    media(doc_id long, kind string,          -- image|audio|video
          payload binary, media_meta struct<mime:string, bytes:long>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, "
    "media_meta struct<mime:string, bytes:long>"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, kind string, width int, height int, channels int, "
    "embedding array<float>, decoder string"
)

FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_payload binary, decoder string"


def _deterministic_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    return np.random.default_rng(seed)


def _fake_decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decoder: dims + a 16-d 'embedding' derived
    purely from the payload hash. STUB — replace with PIL/turbojpeg on
    a cluster image that has them."""
    rng = _deterministic_rng(payload)
    w = int(rng.integers(16, 512))
    h = int(rng.integers(16, 512))
    emb = rng.standard_normal(16).astype(np.float32)
    return w, h, 3, emb


try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def gen_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    base = spark.range(0, n, 1, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(seed + int(i))
                payload = rng.bytes(256 + int(i) % 512)
                kind = kinds[int(i) % 3]
                mime = {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind]
                rows.append((int(i), kind, payload, (mime, len(payload))))
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "payload", "media_meta"])

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_images(df: DataFrame) -> DataFrame:
    """image rows → (dims, embedding). mapInPandas keeps the binary
    column inside one Arrow batch hop; downstream should drop payload
    immediately (same rule as the html column — SURVEY §4)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if _HAVE_PIL:
                    raise NotImplementedError(
                        "real decoder wiring lands when a media-enabled image exists"
                    )
                w, h, c, emb = _fake_decode_image(bytes(r["payload"]))
                out.append((r["doc_id"], r["kind"], w, h, c, emb.tolist(), "fake-sha256"))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "kind", "width", "height", "channels",
                         "embedding", "decoder"],
            )

    return df.filter(F.col("kind") == "image").mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2, max_frames: int = 4) -> DataFrame:
    """video rows → pseudo frame rows (UDTF-shaped: 1 row in, k out)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                n_frames = min(max_frames, max(1, len(payload) // 128))
                for k in range(0, n_frames, every_n):
                    lo = (k * 64) % max(1, len(payload) - 64)
                    out.append((r["doc_id"], k, payload[lo : lo + 64], "fake-slice"))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_payload", "decoder"]
            )

    return df.filter(F.col("kind") == "video").mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)
