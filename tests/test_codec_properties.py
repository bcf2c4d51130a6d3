"""Property-based round-trip laws for the real codecs (hypothesis).

No Spark session needed — these pin the pure-codec invariants the
engine's integrity/feature paths rely on, over arbitrary shapes and
content rather than hand-picked fixtures:

- PNG:  decode(encode(img)) == img exactly, for every filter choice
        the encoder makes (lossless law).
- JPEG: decode(encode(img, q95)) has PSNR >= 40 dB (the north rule's
        lossy invariant) and exact shape/dtype.
- WAV:  decode(encode(s, rate)) == (rate, s) exactly (PCM is
        lossless).
- AVI:  container round-trip preserves frame count/fps and each frame
        meets the JPEG PSNR law.

Example counts are capped to keep the suite fast; the seeds are
hypothesis's own (deterministic per run via derandomize)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from perl_data_validate_sanctions_spark.sources import avi, jpeg, png, wav, webp

_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 200.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


@st.composite
def _images(draw, max_side: int = 40):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "flat", "gradient"]))
    if kind == "noise":
        return rng.integers(0, 256, (h, w)).astype(np.uint8)
    if kind == "flat":
        return np.full((h, w), draw(st.integers(0, 255)), dtype=np.uint8)
    return np.tile(
        np.linspace(0, 255, w), (h, 1)
    ).astype(np.uint8)


@given(img=_images())
@settings(**_SETTINGS)
def test_png_roundtrip_lossless_property(img):
    w, h, out = png.decode_png_gray(png.encode_png_gray(img))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.array_equal(out, img)


@given(img=_images())
@settings(**_SETTINGS)
def test_jpeg_q95_psnr_property(img):
    w, h, out = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(img, quality=95))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert _psnr(out, img) >= 40.0


@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
)
@settings(**_SETTINGS)
def test_wav_roundtrip_lossless_property(seed, n, rate):
    s = (
        ((np.arange(n, dtype=np.int64) * 2654435761 + seed) % 65536) - 32768
    ).astype(np.int16)
    rate_out, out = wav.decode_wav_pcm16(wav.encode_wav_pcm16(s, rate))
    assert rate_out == rate
    assert np.array_equal(out, s)


@given(
    imgs=st.lists(_images(max_side=24), min_size=1, max_size=4),
    fps=st.integers(1, 60),
)
@settings(max_examples=15, deadline=None, derandomize=True)
def test_avi_roundtrip_property(imgs, fps):
    h, w = imgs[0].shape
    frames = [
        i if i.shape == (h, w) else np.resize(i, (h, w)) for i in imgs
    ]
    fps_out, out = avi.decode_avi_mjpeg(
        avi.encode_avi_mjpeg(frames, fps=fps, quality=95)
    )
    assert fps_out == fps and len(out) == len(frames)
    for f, o in zip(frames, out):
        assert _psnr(o, f) >= 40.0


@given(img=_images())
@settings(**_SETTINGS)
def test_webp_roundtrip_lossless_property(img):
    """VP8L is lossless: decode(encode(img)) == img for every image."""
    w, h, out = webp.decode_webp_gray(webp.encode_webp_gray(img))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.array_equal(out, img)
