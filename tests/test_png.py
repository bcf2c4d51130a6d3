"""Stdlib PNG codec (sources/png.py) + the integrity check's real-decode
PNG mode (format sniff in checks/integrity.py)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from perl_data_validate_sanctions_spark.checks import integrity_violations
from perl_data_validate_sanctions_spark.sources import codec, png
from perl_data_validate_sanctions_spark.sources.synth import logical_partition

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_gray.png")
GOLDEN_ID = "png-golden-1"
W, H = 16, 12

_IMG_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def test_png_roundtrip_every_filter():
    img = codec.render(12345, W, H)
    for filters in ([0] * H, [1] * H, [2] * H, [3] * H, [4] * H,
                    [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 3, 4]):
        blob = png.encode_png_gray(img, filters)
        w, h, out = png.decode_png_gray(blob)
        assert (w, h) == (W, H)
        assert np.array_equal(out, img), f"filters {filters}"


def test_png_golden_fixture_decodes_byte_exactly():
    """The checked-in fixture (mixed per-row filters, incl. Paeth)
    decodes to EXACTLY the reference image its id derives — decode is
    independent of the encoder here: expected pixels come from the
    codec's counter-based renderer, not from a prior decode."""
    with open(GOLDEN, "rb") as f:
        blob = f.read()
    w, h, out = png.decode_png_gray(blob)
    assert (w, h) == (W, H)
    assert np.array_equal(out, codec.decode_reference(GOLDEN_ID, W, H))


def test_png_decode_rejects_malformed():
    img = codec.render(7, 8, 8)
    good = png.encode_png_gray(img)
    # bit flip inside IDAT → CRC failure
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        png.decode_png_gray(bytes(bad))
    # truncated stream
    with pytest.raises(ValueError):
        png.decode_png_gray(good[: len(good) - 20])
    # wrong signature
    with pytest.raises(ValueError):
        png.decode_png_gray(b"\x89PNX" + good[4:])
    # unsupported profile (16-bit depth in IHDR, CRC re-stamped)
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 8, 8, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported"):
        png.decode_png_gray(png.PNG_MAGIC + chunk)


def test_real_decode_png_end_to_end():
    img = codec.render(99, 10, 6)
    assert np.array_equal(codec.real_decode(png.encode_png_gray(img)), img)


def test_integrity_png_mode(spark):
    """Integrity sniffs PNG payloads and validates REAL decoded pixels:
    clean passes, noisy (<40 dB) flagged, corrupted flagged as
    undecodable, header/column mismatch flagged."""
    rng = np.random.default_rng(4)
    clean_ref = codec.decode_reference("png-ok-1", W, H)
    noisy_ref = codec.decode_reference("png-noisy-1", W, H)
    noisy = np.clip(
        noisy_ref.astype(np.int16) + rng.integers(-60, 61, noisy_ref.shape),
        0, 255,
    ).astype(np.uint8)
    corrupt = bytearray(png.encode_png_gray(clean_ref))
    corrupt[len(corrupt) // 2] ^= 0xFF
    rows = [
        ("png-ok-1", bytearray(png.encode_png_gray(clean_ref)),
         W, H, "png", "cap", 1),
        ("png-noisy-1", bytearray(png.encode_png_gray(noisy)),
         W, H, "png", "cap", 2),
        ("png-corrupt-1", corrupt, W, H, "png", "cap", 3),
        ("png-badhdr-1", bytearray(png.encode_png_gray(clean_ref)),
         W + 1, H, "png", "cap", 4),
    ]
    df = spark.createDataFrame(rows, _IMG_SCHEMA)
    v = {
        r["image_id"]: r["detail"]
        for r in integrity_violations(
            df, logical_partition("image_id"), F.lit("cap")
        ).collect()
    }
    assert "png-ok-1" not in v
    assert "psnr" in v["png-noisy-1"]
    assert "undecodable" in v["png-corrupt-1"]
    assert "header" in v["png-badhdr-1"]
    # the noisy verdict is real: independent pure-python recheck
    assert codec.psnr(noisy, noisy_ref) < 40.0
    # and sampled mode agrees (PNG rows always compare full-pixel)
    v_s = {
        r["image_id"]: r["detail"]
        for r in integrity_violations(
            df, logical_partition("image_id"), F.lit("cap"),
            pixel_sample=64,
        ).collect()
    }
    assert v_s == v
