"""The compiled JPEG scan kernel must be indistinguishable from the
pure-Python reference loop (sources/jpeg_scan_c.py).

Three laws, all checked by running ``decode_jpeg_gray`` twice — once
with the kernel enabled (default) and once with ``PDVS_JPEG_C=0``
forcing the reference loop:

1. Valid streams: identical (w, h, pixels) bit-for-bit, arbitrary
   shapes/content/quality (hypothesis).
2. Corrupt streams (deterministic bit-flip fuzz over valid payloads):
   identical outcome — both accept with equal pixels, or both raise
   ``ValueError`` with the SAME message (the kernel never produces an
   error itself; any anomaly falls back to the reference loop, so
   messages must match exactly).
3. The env kill-switch works at runtime (``available()`` honors
   ``PDVS_JPEG_C=0`` per call, no process restart needed).

Skipped wholesale where no C toolchain exists — the kernel is a fast
path, never a dependency."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from perl_data_validate_sanctions_spark.sources import jpeg, jpeg_scan_c

if not jpeg_scan_c.available():  # pragma: no cover - container has cc
    pytest.skip("compiled jpeg scan kernel unavailable (no cc?)",
                allow_module_level=True)

_SETTINGS = dict(max_examples=40, deadline=None, derandomize=True)


def _decode_both(payload: bytes, monkeypatch_env):
    """(outcome_c, outcome_py): ('ok', w, h, pixels) or ('err', msg)."""

    def run() -> tuple:
        try:
            w, h, px = jpeg.decode_jpeg_gray(payload)
            return ("ok", w, h, px)
        except ValueError as e:
            return ("err", str(e))

    monkeypatch_env.delenv("PDVS_JPEG_C", raising=False)
    out_c = run()
    monkeypatch_env.setenv("PDVS_JPEG_C", "0")
    out_py = run()
    monkeypatch_env.delenv("PDVS_JPEG_C", raising=False)
    return out_c, out_py


def _assert_same(out_c: tuple, out_py: tuple) -> None:
    assert out_c[0] == out_py[0], (out_c[:2], out_py[:2])
    if out_c[0] == "ok":
        assert out_c[1:3] == out_py[1:3]
        assert np.array_equal(out_c[3], out_py[3])
    else:
        assert out_c[1] == out_py[1]


@st.composite
def _images(draw, max_side: int = 48):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "flat", "gradient"]))
    if kind == "noise":
        return rng.integers(0, 256, (h, w)).astype(np.uint8)
    if kind == "flat":
        return np.full((h, w), draw(st.integers(0, 255)), dtype=np.uint8)
    return np.tile(np.linspace(0, 255, w), (h, 1)).astype(np.uint8)


# direct os.environ (restored in finally) rather than monkeypatch:
# hypothesis @given is incompatible with function-scoped fixtures
@given(img=_images(), quality=st.integers(35, 95))
@settings(**_SETTINGS)
def test_kernel_matches_python_on_valid_streams(img, quality):
    import os

    payload = jpeg.encode_jpeg_gray(img, quality=quality)
    w, h, px_c = jpeg.decode_jpeg_gray(payload)
    os.environ["PDVS_JPEG_C"] = "0"
    try:
        w2, h2, px_py = jpeg.decode_jpeg_gray(payload)
    finally:
        del os.environ["PDVS_JPEG_C"]
    assert (w, h) == (w2, h2) == (img.shape[1], img.shape[0])
    assert np.array_equal(px_c, px_py)


def test_kernel_matches_python_under_bitflip_fuzz(monkeypatch):
    rng = np.random.default_rng(20260818)
    imgs = [
        rng.integers(0, 256, (rng.integers(8, 72), rng.integers(8, 72)),
                     dtype=np.uint8)
        for _ in range(6)
    ]
    payloads = [jpeg.encode_jpeg_gray(im, quality=int(q))
                for im, q in zip(imgs, rng.integers(40, 96, len(imgs)))]
    n_err = n_ok = 0
    for _ in range(400):
        base = payloads[int(rng.integers(len(payloads)))]
        buf = bytearray(base)
        # flip 1-3 bits anywhere in the stream (headers AND scan data)
        for _f in range(int(rng.integers(1, 4))):
            i = int(rng.integers(len(buf)))
            buf[i] ^= 1 << int(rng.integers(8))
        out_c, out_py = _decode_both(bytes(buf), monkeypatch)
        _assert_same(out_c, out_py)
        n_err += out_c[0] == "err"
        n_ok += out_c[0] == "ok"
    # the corpus must actually exercise both outcomes
    assert n_err > 50 and n_ok > 5, (n_err, n_ok)


def test_truncation_fuzz_identical(monkeypatch):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    payload = jpeg.encode_jpeg_gray(img, quality=88)
    for cut in list(range(1, 40)) + [len(payload) // 2, len(payload) - 3]:
        out_c, out_py = _decode_both(payload[:-cut], monkeypatch)
        _assert_same(out_c, out_py)


def test_env_kill_switch(monkeypatch):
    assert jpeg_scan_c.available()
    monkeypatch.setenv("PDVS_JPEG_C", "0")
    assert not jpeg_scan_c.available()
    monkeypatch.delenv("PDVS_JPEG_C")
    assert jpeg_scan_c.available()
