"""Stdlib+numpy baseline JPEG codec (sources/jpeg.py) + the integrity
check's real-decode JPEG mode (format sniff in checks/integrity.py).

JPEG is the LOSSY leg of the north rule's invariant ("decoded-pixel
allclose, PSNR >= 40 dB for lossy formats"): round-trips are graded by
PSNR, not byte equality, and the hand-crafted-stream test pins the
decoder against ITU-T T.81 arithmetic computed by hand — not against
our own encoder's output.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from perl_data_validate_sanctions_spark.checks import integrity_violations
from perl_data_validate_sanctions_spark.sources import codec, jpeg
from perl_data_validate_sanctions_spark.sources.synth import logical_partition

W, H = 16, 12

_IMG_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 200.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def test_jpeg_roundtrip_clears_psnr_gate():
    """Smooth renders AND uniform noise (worst case for DCT) clear the
    40 dB gate at the qualities the fixtures use, across odd shapes
    (block padding / cropping)."""
    rng = np.random.default_rng(11)
    for shape in [(H, W), (17, 23), (8, 8), (1, 1), (3, 65)]:
        # the codec's hash render IS white noise — the hardest content
        # for a DCT codec; q95 (the fixtures' quality) clears the gate
        # even there, smoother content clears it with margin
        rendered = codec.render(12345, shape[1], shape[0])
        noisy = rng.integers(0, 256, shape).astype(np.uint8)
        smooth = np.tile(
            np.linspace(30, 220, shape[1]), (shape[0], 1)
        ).astype(np.uint8)
        for img, qualities in (
            (rendered, (95,)), (noisy, (95,)), (smooth, (85, 95)),
        ):
            for q in qualities:
                blob = jpeg.encode_jpeg_gray(img, quality=q)
                w, h, out = jpeg.decode_jpeg_gray(blob)
                assert (w, h) == (shape[1], shape[0])
                assert out.shape == shape
                assert _psnr(out, img) >= 40.0, (shape, q)


def test_jpeg_handcrafted_dc_only_stream():
    """A stream built BY HAND (headers via struct, entropy bits from
    the T.81 canonical-code construction on the Annex K tables): one
    8x8 block, flat quant table, single DC coefficient c=80 -> every
    pixel is round(80/8) + 128 = 138. The expectation is pencil-and-
    paper DCT arithmetic, independent of encode_jpeg_gray."""

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # flat all-ones luminance quant table, id 0
    dqt = seg(0xDB, b"\x00" + b"\x01" * 64)
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
    dht = seg(
        0xC4, bytes([0x00]) + bytes(jpeg._DC_BITS) + bytes(jpeg._DC_VALS)
    ) + seg(0xC4, bytes([0x10]) + bytes(jpeg._AC_BITS) + bytes(jpeg._AC_VALS))
    sos = seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))

    # entropy: DC category 7 code, then 80 in 7 bits, then EOB
    dc_code, dc_len = jpeg._canonical_codes(jpeg._DC_BITS, jpeg._DC_VALS)[7]
    eob_code, eob_len = jpeg._canonical_codes(jpeg._AC_BITS, jpeg._AC_VALS)[0]
    acc, n = 0, 0
    for code, ln in ((dc_code, dc_len), (80, 7), (eob_code, eob_len)):
        acc = (acc << ln) | code
        n += ln
    pad = (-n) % 8
    acc = (acc << pad) | ((1 << pad) - 1)  # 1-bit padding per T.81
    entropy = acc.to_bytes((n + pad) // 8, "big")
    # T.81 byte stuffing (none expected for these bits, but be correct)
    entropy = entropy.replace(b"\xff", b"\xff\x00")

    blob = b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"
    w, h, out = jpeg.decode_jpeg_gray(blob)
    assert (w, h) == (8, 8)
    assert np.array_equal(out, np.full((8, 8), 138, dtype=np.uint8))


def test_jpeg_decode_rejects_malformed():
    img = codec.render(7, 16, 8)
    good = jpeg.encode_jpeg_gray(img, quality=95)
    # truncated stream (EOI never reached)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(good[: len(good) // 2])
    # wrong signature
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(b"\x00\x01" + good[2:])
    # progressive SOF2 is outside the documented profile
    bad = bytearray(good)
    sof_at = bad.find(b"\xff\xc0")
    bad[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="unsupported"):
        jpeg.decode_jpeg_gray(bytes(bad))
    # restart intervals unsupported
    dri = struct.pack(">BBHH", 0xFF, 0xDD, 4, 8)
    with pytest.raises(ValueError, match="unsupported"):
        jpeg.decode_jpeg_gray(good[:2] + dri + good[2:])
    # zero entry in the quant table
    bad = bytearray(good)
    dqt_at = bad.find(b"\xff\xdb")
    bad[dqt_at + 5] = 0  # first table byte after the Pq/Tq byte
    with pytest.raises(ValueError, match="quant"):
        jpeg.decode_jpeg_gray(bytes(bad))


def test_real_decode_jpeg_end_to_end():
    img = codec.render(99, 24, 16)
    out = codec.real_decode(jpeg.encode_jpeg_gray(img, quality=95))
    assert out.shape == img.shape
    assert _psnr(out, img) >= 40.0


def test_integrity_jpeg_mode(spark):
    """Integrity sniffs the JPEG SOI marker and validates REAL decoded
    pixels under the lossy PSNR gate: a q95 encode of the reference
    passes, a divergent image is flagged by PSNR, a truncated stream
    is undecodable, a header/column mismatch is flagged."""
    rng = np.random.default_rng(4)
    clean_ref = codec.decode_reference("jpg-ok-1", W, H)
    noisy_ref = codec.decode_reference("jpg-noisy-1", W, H)
    noisy = np.clip(
        noisy_ref.astype(np.int16) + rng.integers(-60, 61, noisy_ref.shape),
        0, 255,
    ).astype(np.uint8)
    good = jpeg.encode_jpeg_gray(clean_ref, quality=95)
    rows = [
        ("jpg-ok-1", bytearray(good), W, H, "jpeg", "cap", 1),
        ("jpg-noisy-1", bytearray(jpeg.encode_jpeg_gray(noisy, quality=95)),
         W, H, "jpeg", "cap", 2),
        ("jpg-corrupt-1", bytearray(good[: len(good) - 10]),
         W, H, "jpeg", "cap", 3),
        ("jpg-badhdr-1",
         bytearray(jpeg.encode_jpeg_gray(clean_ref, quality=95)),
         W + 1, H, "jpeg", "cap", 4),
    ]
    df = spark.createDataFrame(rows, _IMG_SCHEMA)
    v = {
        r["image_id"]: r["detail"]
        for r in integrity_violations(
            df, logical_partition("image_id"), F.lit("cap")
        ).collect()
    }
    assert "jpg-ok-1" not in v
    assert "psnr" in v["jpg-noisy-1"]
    assert "undecodable" in v["jpg-corrupt-1"]
    assert "header" in v["jpg-badhdr-1"]
    # the verdicts are real: independent pure-python rechecks
    assert codec.psnr(noisy, noisy_ref) < 40.0
    _, _, dec = jpeg.decode_jpeg_gray(good)
    assert codec.psnr(dec, clean_ref) >= 40.0
    # sampled mode agrees (real-codec rows always compare full-pixel)
    v_s = {
        r["image_id"]: r["detail"]
        for r in integrity_violations(
            df, logical_partition("image_id"), F.lit("cap"),
            pixel_sample=64,
        ).collect()
    }
    assert v_s == v


def test_idct_matmul_matches_einsum():
    """decode_jpeg_gray's IDCT runs as two stacked matmuls (round-7
    speedup). The summation order differs from the old 3-operand
    einsum, so this pins that round+clip never flips a pixel: the
    exact changed computation (dequantized int blocks -> spatial ->
    round/clip) is compared on decoder-realistic inputs — integer
    coefficients times real quant tables — across qualities and a wide
    coefficient fuzz."""
    import numpy as np

    T = jpeg._T
    rng = np.random.default_rng(0xC0FFEE)
    for trial in range(300):
        q = int(rng.integers(30, 98))
        qt = jpeg.quant_table(q)
        n = int(rng.integers(1, 64))
        # decoder-realistic dequantized blocks: small integer coeffs
        # scaled by the quant table (most energy in low frequencies)
        coefs = rng.integers(-64, 65, size=(n, 64)) * (
            rng.random((n, 64)) < 0.3
        )
        d = (coefs * qt).astype(np.float64).reshape(-1, 8, 8)
        spatial_mm = T.T @ d @ T + 128.0
        spatial_es = np.einsum("ji,njk,kl->nil", T, d, T) + 128.0
        px_mm = np.clip(np.round(spatial_mm), 0, 255).astype(np.uint8)
        px_es = np.clip(np.round(spatial_es), 0, 255).astype(np.uint8)
        assert np.array_equal(px_mm, px_es), trial
