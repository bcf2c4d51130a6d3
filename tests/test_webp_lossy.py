"""Lossy-WebP (VP8) leg: system-libwebp ctypes codec round-trip laws,
error contract, dispatch through sources/webp.py, the library-absent
fallback contract, and the Spark integrity check end-to-end.

The from-scratch decoder deliberately covers VP8L only (a from-scratch
VP8 would mean transcribing RFC 6386's ~1k probability constants with
no way to verify them here); the lossy leg binds the SYSTEM libwebp —
the same library tests/test_webp.py already uses as the VP8L
conformance oracle. PSNR>=40dB is the north rule's lossy invariant.
"""

from __future__ import annotations

import numpy as np
import pytest

from perl_data_validate_sanctions_spark.sources import codec, webp, webp_sys

needs_libwebp = pytest.mark.skipif(
    not webp_sys.available(), reason="system libwebp absent"
)


@needs_libwebp
def test_lossy_roundtrip_psnr_gate():
    """Encode→decode round-trip clears the 40 dB lossy gate at the
    fixture quality (95) across sizes, including odd dims (YUV420
    subsampling pads to even macroblock grids internally)."""
    for seed, (w, h) in enumerate([(64, 48), (33, 17), (128, 96), (8, 8)]):
        ref = codec.decode_reference(f"img-lossy{seed:06d}", w, h)
        blob = webp_sys.encode_lossy_gray(ref, quality=95)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
        assert blob[12:16] == b"VP8 "  # simple lossy container
        dw, dh, dec = webp_sys.decode_gray(blob)
        assert (dw, dh) == (w, h)
        assert codec.psnr(ref, dec) >= 40.0


@needs_libwebp
def test_lossy_truncation_and_garbage_raise_valueerror():
    ref = codec.decode_reference("img-lossy-trunc", 64, 48)
    blob = webp_sys.encode_lossy_gray(ref)
    with pytest.raises(ValueError):
        webp_sys.decode_gray(blob[:20])
    with pytest.raises(ValueError):
        webp_sys.decode_gray(b"RIFF\x10\x00\x00\x00WEBPVP8 " + b"\x00" * 8)
    with pytest.raises(ValueError):
        webp_sys.decode_gray(b"not webp at all")


@needs_libwebp
def test_encode_parameter_guards():
    ref = codec.decode_reference("img-lossy-guard", 16, 16)
    with pytest.raises(ValueError):
        webp_sys.encode_lossy_gray(ref, quality=101)
    with pytest.raises(ValueError):
        webp_sys.encode_lossy_gray(ref, quality=-1)
    with pytest.raises(ValueError):
        webp_sys.encode_lossy_gray(np.zeros((0, 0), dtype=np.uint8))
    with pytest.raises(ValueError):
        webp_sys.encode_lossy_gray(np.zeros((1, 16384), dtype=np.uint8))


@needs_libwebp
def test_dispatch_through_webp_module():
    """sources/webp.py's decode_webp_gray routes lossy containers to
    the system codec — same pixels as calling webp_sys directly, while
    VP8L still takes the from-scratch path."""
    ref = codec.decode_reference("img-lossy-disp", 48, 32)
    lossy = webp_sys.encode_lossy_gray(ref)
    w1, h1, p1 = webp.decode_webp_gray(lossy)
    w2, h2, p2 = webp_sys.decode_gray(lossy)
    assert (w1, h1) == (w2, h2) == (48, 32)
    assert np.array_equal(p1, p2)
    # lossless still decodes exactly via the from-scratch decoder
    _, _, pl = webp.decode_webp_gray(webp.encode_webp_gray(ref))
    assert np.array_equal(pl, ref)


def test_library_absent_contract(monkeypatch):
    """With libwebp unloadable, a VALID lossy payload must fall back to
    the conservative path: decode raises the distinct lossless-only
    ValueError and the integrity sniff still names the container, so
    the Spark check reports codec_unavailable — never corruption."""
    from perl_data_validate_sanctions_spark.checks import integrity

    lossy = (
        webp_sys.encode_lossy_gray(
            codec.decode_reference("img-lossy-abs", 32, 24))
        if webp_sys.available()
        else b"RIFF\x14\x00\x00\x00WEBPVP8 \x08\x00\x00\x00" + b"\x00" * 8
    )
    monkeypatch.setattr(webp_sys, "_LIB", None)
    monkeypatch.setattr(webp_sys, "_LOADED", True)
    assert not webp_sys.available()
    assert not integrity._webp_sys_available()
    with pytest.raises(ValueError, match="VP8L lossless only"):
        webp.decode_webp_gray(lossy)
    assert integrity._sniff_unsupported(lossy[:16]) == "webp-vp8"


@needs_libwebp
def test_integrity_lossy_end_to_end(spark):
    """Valid lossy rows pass the PSNR gate, a truncated row is flagged
    undecodable, a valid-stream-wrong-pixels row fails PSNR, and a
    header/column mismatch is named — all through the Spark check."""
    from pyspark.sql import functions as F

    from perl_data_validate_sanctions_spark.checks.integrity import (
        integrity_violations,
    )
    from perl_data_validate_sanctions_spark.sources.synth import (
        logical_partition,
    )

    W, H = 64, 48
    rows = []
    for i in range(10):
        iid = f"img-vp8-{i:07d}"
        ref = codec.decode_reference(iid, W, H)
        rows.append((iid, bytearray(webp_sys.encode_lossy_gray(ref)),
                     W, H, "webp", "a photo", i))
    trunc_id = "img-vp8-trunc01"
    blob = webp_sys.encode_lossy_gray(codec.decode_reference(trunc_id, W, H))
    rows.append((trunc_id, bytearray(blob[:-15]), W, H, "webp",
                 "a photo", 100))
    wrong_id = "img-vp8-wrong01"
    noise = np.random.default_rng(7).integers(0, 256, size=(H, W),
                                              dtype=np.uint8)
    rows.append((wrong_id, bytearray(webp_sys.encode_lossy_gray(noise)),
                 W, H, "webp", "a photo", 101))
    dims_id = "img-vp8-dims001"
    blob = webp_sys.encode_lossy_gray(codec.decode_reference(dims_id, W, H))
    rows.append((dims_id, bytearray(blob), W + 1, H, "webp",
                 "a photo", 102))

    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    v = {
        r["image_id"]: r["detail"]
        for r in integrity_violations(
            df, logical_partition("image_id"), F.lit("a photo")
        ).collect()
    }
    clean = {f"img-vp8-{i:07d}" for i in range(10)}
    assert not clean & set(v), v
    assert v[trunc_id].startswith("undecodable payload")
    assert "psnr" in v[wrong_id]
    assert v[dims_id].startswith("header (webp,64,48) != columns")


@needs_libwebp
def test_lossy_bitflip_fuzz_error_isolated():
    """Entropy streams may decode a flipped bit into different pixels
    (caught by the PSNR gate) — but the decode itself must NEVER
    escape the per-row ValueError contract with any other exception
    type (same law as the VP8L/JPEG fuzz suites; libwebp failures
    surface as the null-return ValueError)."""
    ref = codec.decode_reference("img-lossy-fuzz", 48, 32)
    blob = bytearray(webp_sys.encode_lossy_gray(ref))
    rng = np.random.default_rng(23)
    for _ in range(300):
        i = int(rng.integers(12, len(blob)))
        b = int(rng.integers(0, 8))
        blob[i] ^= 1 << b
        try:
            webp_sys.decode_gray(bytes(blob))
        except ValueError:
            pass
        finally:
            blob[i] ^= 1 << b
