"""The compiled PNG unfilter kernel must be indistinguishable from the
pure-Python reference loop (sources/png_unfilter_c.py) — same laws as
tests/test_jpeg_c_kernel.py: bit-identical output on valid streams,
identical outcome (value or exact ValueError message) under bit-flip
and truncation fuzz, runtime env kill-switch."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from perl_data_validate_sanctions_spark.sources import png, png_unfilter_c

if not png_unfilter_c.available():  # pragma: no cover - container has cc
    pytest.skip("compiled png unfilter kernel unavailable (no cc?)",
                allow_module_level=True)

_SETTINGS = dict(max_examples=40, deadline=None, derandomize=True)


def _decode_both(payload: bytes, monkeypatch_env):
    def run() -> tuple:
        try:
            w, h, px = png.decode_png_gray(payload)
            return ("ok", w, h, px)
        except ValueError as e:
            return ("err", str(e))

    monkeypatch_env.delenv("PDVS_PNG_C", raising=False)
    out_c = run()
    monkeypatch_env.setenv("PDVS_PNG_C", "0")
    out_py = run()
    monkeypatch_env.delenv("PDVS_PNG_C", raising=False)
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
    kind = draw(st.sampled_from(["noise", "flat", "gradient", "mixed"]))
    if kind == "noise":
        return rng.integers(0, 256, (h, w)).astype(np.uint8)
    if kind == "flat":
        return np.full((h, w), draw(st.integers(0, 255)), dtype=np.uint8)
    if kind == "gradient":
        return np.tile(np.linspace(0, 255, w), (h, 1)).astype(np.uint8)
    # mixed rows push the encoder toward different filters per row
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    img[:: 2] = np.tile(np.linspace(0, 255, w), ((h + 1) // 2, 1)).astype(
        np.uint8
    )
    return img


@given(img=_images())
@settings(**_SETTINGS)
def test_kernel_matches_python_on_valid_streams(img):
    import os

    payload = png.encode_png_gray(img)
    w, h, px_c = png.decode_png_gray(payload)
    os.environ["PDVS_PNG_C"] = "0"
    try:
        w2, h2, px_py = png.decode_png_gray(payload)
    finally:
        del os.environ["PDVS_PNG_C"]
    assert (w, h) == (w2, h2) == (img.shape[1], img.shape[0])
    assert np.array_equal(px_c, img) and np.array_equal(px_py, img)


def test_all_five_filters_explicitly(monkeypatch):
    """Hand-build a scanline stream using every filter byte 0..4 (the
    encoder's heuristic may not cover all five) plus the invalid 5."""
    import zlib

    rng = np.random.default_rng(99)
    w, h = 23, 6
    img_rows = [rng.integers(0, 256, w).astype(np.uint8) for _ in range(h)]

    def encode_with_filters(filters: list[int]) -> bytes:
        # filter each row against the RECONSTRUCTED previous row, i.e.
        # the inverse of the decoder's arithmetic, so decode == img
        prev = np.zeros(w, dtype=int)
        out = bytearray()
        for y, f in enumerate(filters):
            cur = img_rows[y].astype(int)
            if f == 0:
                raw = cur
            elif f == 1:
                left = np.concatenate(([0], cur[:-1]))
                raw = (cur - left) % 256
            elif f == 2:
                raw = (cur - prev) % 256
            elif f == 3:
                left = np.concatenate(([0], cur[:-1]))
                raw = (cur - (left + prev) // 2) % 256
            elif f == 4:
                raw = np.zeros(w, dtype=int)
                a = c = 0
                for x in range(w):
                    b = int(prev[x])
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    raw[x] = (int(cur[x]) - pred) % 256
                    a, c = int(cur[x]), b
            else:
                raw = cur  # filter byte is invalid; payload content moot
            out.append(f)
            out.extend(int(v) & 0xFF for v in raw)
            prev = cur
        # minimal valid container around the stream
        import struct

        def chunk(ctype: bytes, body: bytes) -> bytes:
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", zlib.crc32(ctype + body)))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(out)))
                + chunk(b"IEND", b""))

    payload = encode_with_filters([0, 1, 2, 3, 4, 2])
    out_c, out_py = _decode_both(payload, monkeypatch)
    _assert_same(out_c, out_py)
    assert out_c[0] == "ok"
    assert np.array_equal(out_c[3], np.stack(img_rows))

    bad = encode_with_filters([0, 1, 5, 3, 4, 2])
    out_c, out_py = _decode_both(bad, monkeypatch)
    _assert_same(out_c, out_py)
    assert out_c[0] == "err" and "bad filter byte 5" in out_c[1]


def test_kernel_matches_python_under_bitflip_fuzz(monkeypatch):
    rng = np.random.default_rng(20260819)
    imgs = [
        rng.integers(0, 256, (rng.integers(4, 64), rng.integers(4, 64)),
                     dtype=np.uint8)
        for _ in range(6)
    ]
    payloads = [png.encode_png_gray(im) for im in imgs]
    n_err = n_ok = 0
    for _ in range(300):
        base = payloads[int(rng.integers(len(payloads)))]
        buf = bytearray(base)
        for _f in range(int(rng.integers(1, 4))):
            i = int(rng.integers(len(buf)))
            buf[i] ^= 1 << int(rng.integers(8))
        out_c, out_py = _decode_both(bytes(buf), monkeypatch)
        _assert_same(out_c, out_py)
        n_err += out_c[0] == "err"
        n_ok += out_c[0] == "ok"
    assert n_err > 50, (n_err, n_ok)


def test_truncation_fuzz_identical(monkeypatch):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    payload = png.encode_png_gray(img)
    for cut in list(range(1, 30)) + [len(payload) // 2]:
        out_c, out_py = _decode_both(payload[:-cut], monkeypatch)
        _assert_same(out_c, out_py)


def test_env_kill_switch(monkeypatch):
    assert png_unfilter_c.available()
    monkeypatch.setenv("PDVS_PNG_C", "0")
    assert not png_unfilter_c.available()
    monkeypatch.delenv("PDVS_PNG_C")
    assert png_unfilter_c.available()
