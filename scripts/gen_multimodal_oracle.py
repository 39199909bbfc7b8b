#!/usr/bin/env python
"""Generate the literal VALUES oracle for the multimodal_features row.

Usage:  python scripts/gen_multimodal_oracle.py

Writes logstash_spark/suite_expected_media.py with the expected output
of datapipe.multimodal.media_features over the seeded media fixture
(gen_media n=96 seed=42), derived INDEPENDENTLY of the engine's
decoders:

* the payload-generation RNG sequence is replicated here (that is the
  corpus definition, shared the same way the datagen fixtures are) and
  every expected feature is computed from the PRE-ENCODING arrays —
  image dims/pixel sums from the raw pixel tensor, PCM stats from the
  raw int16 samples — so the engine's encode→Spark→decode round trip
  is differentially tested end-to-end without this script ever calling
  the engine's decoders;
* as a second, genuinely independent decode check, every generated WAV
  payload is ALSO parsed with Python's stdlib ``wave`` module and the
  int16 stats re-derived from its frames — the script fails loudly if
  the two disagree.

No pyspark import anywhere in this script. All compared features are
integers/strings (exact), so there is no float-rounding hazard.
"""

from __future__ import annotations

import io
import struct
import sys
import wave
from pathlib import Path

import numpy as np

N_MEDIA = 96
SEED = 42


def encode_wav_bytes(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Same RIFF layout the engine writes — re-stated here (12 lines of
    published WAVE layout) so the script stays pyspark-import-free."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def main() -> None:
    rows: list[tuple] = []
    for i in range(N_MEDIA):
        rng = np.random.default_rng(SEED + i)
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w = int(rng.integers(8, 33))
            h = int(rng.integers(8, 33))
            pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            if (i // 3) % 2 == 1:
                # jpeg leg (round 5): the fixture encodes a SOLID color,
                # so the decoded pixels are spec-derivable right here —
                # the DC-only arithmetic of T.81 (forward YCbCr → DC
                # quantize/dequantize at the table's [0,0] entry → IDCT
                # of a DC-only block → inverse YCbCr), restated
                # independently of the engine's decoder the same way
                # encode_wav_bytes restates the RIFF layout. 4:2:0
                # subsampling is a mean over IDENTICAL values → no-op.
                color = pixels[0, 0, :].astype(np.float64)
                quality = int(rng.integers(75, 96))
                r, g, b = color
                yy = 0.299 * r + 0.587 * g + 0.114 * b
                cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
                q = min(100, max(1, quality))
                scale = 5000 / q if q < 50 else 200 - 2 * q
                q00_l = float(np.clip(np.floor((16 * scale + 50) / 100), 1, 255))
                q00_c = float(np.clip(np.floor((17 * scale + 50) / 100), 1, 255))

                def _dc_roundtrip(v: float, q00: float) -> float:
                    return float(np.round(8.0 * (v - 128.0) / q00)) * q00 / 8.0 + 128.0

                y2 = _dc_roundtrip(yy, q00_l)
                cb2 = _dc_roundtrip(cb, q00_c) - 128.0
                cr2 = _dc_roundtrip(cr, q00_c) - 128.0
                dec = np.clip(np.round(np.array([
                    y2 + 1.402 * cr2,
                    y2 - 0.344136 * cb2 - 0.714136 * cr2,
                    y2 + 1.772 * cb2,
                ])), 0, 255).astype(np.int64)
                checksum = int(dec.sum()) * h * w
                rows.append((i, "image", w, h, 3, checksum,
                             None, None, None, None, "jpeg-pure"))
            else:
                # checksum over raw RGB bytes: byte-order invariant, so
                # the engine's BGR-on-disk round trip must reproduce it
                checksum = int(pixels.astype(np.int64).sum())
                rows.append((i, "image", w, h, 3, checksum,
                             None, None, None, None, "bmp-pure"))
        elif kind == "audio":
            n = int(rng.integers(400, 1600))
            t = np.arange(n) / 16_000.0
            freq = float(rng.integers(100, 2000))
            amp = float(rng.uniform(0.2, 0.9))
            wave_f = amp * np.sin(2 * np.pi * freq * t)
            wave_f += rng.normal(0, 0.01, n)
            pcm = (np.clip(wave_f, -1.0, 1.0) * 32767.0).astype(np.int16)
            checksum = int((pcm.astype(np.int64) ** 2).sum())

            # independent decode check via stdlib wave
            with wave.open(io.BytesIO(encode_wav_bytes(wave_f))) as wf:
                assert wf.getframerate() == 16_000
                assert wf.getnchannels() == 1
                assert wf.getsampwidth() == 2
                dec = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
            assert len(dec) == n, (len(dec), n)
            dec_sum = int((dec.astype(np.int64) ** 2).sum())
            assert dec_sum == checksum, (dec_sum, checksum)

            rows.append((i, "audio", None, None, 1, None,
                         16_000, n, checksum, None, "wav-pure"))
        else:
            payload_len = 256 + i % 512
            n_frames_total = min(4, max(1, payload_len // 128))
            sampled = len(range(0, n_frames_total, 2))
            rows.append((i, "video", None, None, None, None,
                         None, None, None, sampled, "fake-slice"))

    out = Path(__file__).resolve().parent.parent / (
        "logstash_spark/suite_expected_media.py"
    )
    body = (
        '"""GENERATED by scripts/gen_multimodal_oracle.py — do not edit.\n\n'
        "Expected media_features output over the seeded media fixture\n"
        "(gen_media n=96 seed=42), derived from the pre-encoding arrays\n"
        "plus an independent stdlib-wave decode check — no pyspark and no\n"
        "engine decoder involved. Columns: (doc_id, kind, width, height,\n"
        "channels, pixel_checksum, sample_rate, n_samples, pcm_checksum,\n"
        'n_frames, decoder).\n"""\n\n'
        f"MEDIA_FEATURES = {rows!r}\n"
    )
    out.write_text(body)
    print(f"wrote {out} ({len(rows)} rows)", file=sys.stderr)


if __name__ == "__main__":
    main()
