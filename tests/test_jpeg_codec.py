"""Pure-numpy baseline JPEG codec tests (VERDICT r4 #3).

The encoder exists to differentially test the decoder (and to feed
gen_media): round-trip error is bounded by the quantization step, and
spec-derived exact cases (solid color → DC-only) reconstruct
byte-exactly. Unsupported modes must raise JpegError cleanly so
decode_images falls through to PIL/stub instead of crashing."""

from __future__ import annotations

import numpy as np
import pytest

from logstash_spark.datapipe.jpeg_codec import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 5) % 256, (y * 7) % 256, ((x + y) * 3) % 256], axis=2
    ).astype(np.uint8)


def test_solid_color_roundtrip_exact():
    """DC-only images reconstruct exactly at any quality — a direct
    spec consequence (all AC coefficients are zero)."""
    for color, q, sub in [([120, 64, 200], 90, False),
                          ([3, 250, 128], 75, False),
                          ([30, 180, 77], 85, True)]:
        img = np.full((16, 16, 3), color, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert out.shape == img.shape
        assert np.array_equal(out, img), (color, q, sub)


def test_gradient_roundtrip_bounded():
    img = _gradient(24, 40)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_subsampled_420_roundtrip():
    img = _gradient(32, 48)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    # chroma carries the subsampling loss; luma-dominant mean stays low
    assert err.mean() < 4.0 and err.max() <= 40


def test_odd_dimensions_crop():
    """Non-multiple-of-8 (and of-16 for 4:2:0) dims: pad-encode,
    crop-decode back to the exact original shape."""
    img = np.full((13, 21, 3), [30, 180, 77], dtype=np.uint8)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        assert out.shape == (13, 21, 3)
        assert np.array_equal(out, img)


def test_grayscale_single_component():
    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)[:, :, None]
    out = decode_jpeg(encode_jpeg(g, quality=100))
    assert out.shape == (8, 8, 3)  # replicated to RGB
    assert np.array_equal(out[:, :, 0], g[:, :, 0])
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_byte_stuffing_and_high_entropy():
    """Noise images exercise long Huffman codes and 0xFF byte stuffing."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=98))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape and err.mean() < 12


def test_unsupported_and_corrupt_raise_cleanly():
    with pytest.raises(JpegError, match="no SOI"):
        decode_jpeg(b"not a jpeg")
    payload = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    # flip SOF0 → SOF2 (progressive): must gate, not crash
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(JpegError, match="baseline"):
        decode_jpeg(bytes(payload))
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan


def test_decode_images_picks_jpeg_path(spark):
    """Spark-side: gen_media's jpeg rows decode via jpeg-pure with the
    exact solid-color checksum; bmp rows are untouched."""
    from pyspark.sql import functions as F

    from logstash_spark.datapipe.multimodal import decode_images, gen_media

    media = gen_media(spark, 24, seed=42)
    feats = decode_images(media).collect()
    by_dec = {}
    for r in feats:
        by_dec.setdefault(r.decoder, []).append(r)
    assert set(by_dec) == {"bmp-pure", "jpeg-pure"}
    # doc_ids 0,6,12,18 bmp; 3,9,15,21 jpeg (i//3 parity)
    assert sorted(r.doc_id for r in by_dec["jpeg-pure"]) == [3, 9, 15, 21]
    for r in by_dec["jpeg-pure"]:
        # solid color: checksum divisible by pixel count, dims real
        assert r.pixel_checksum % (r.width * r.height) == 0
        assert r.channels == 3
