"""Stdlib WAV codec (sources/wav.py) + the audio feature extractor
(operators/multimodal.py:extract_audio_features) — the real audio leg
of the multimodal column story."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from perl_data_validate_sanctions_spark.operators.multimodal import (
    extract_audio_features,
)
from perl_data_validate_sanctions_spark.sources import wav


def _clip(seed: int, n: int = 480) -> np.ndarray:
    """Deterministic int16 samples from integer arithmetic only."""
    return (
        ((np.arange(n, dtype=np.int64) * 2654435761 + seed) % 65536)
        - 32768
    ).astype(np.int16)


def test_wav_roundtrip_byte_exact():
    for n, rate in ((1, 8000), (480, 16000), (4801, 44100)):
        s = _clip(7, n)
        rate_out, out = wav.decode_wav_pcm16(wav.encode_wav_pcm16(s, rate))
        assert rate_out == rate
        assert np.array_equal(out, s)  # PCM is lossless: byte-exact


def test_wav_skips_unknown_chunks():
    """RIFF rule: unknown chunks (e.g. LIST metadata) are skipped with
    word alignment; the odd-sized chunk exercises the pad byte."""
    s = _clip(1, 100)
    blob = wav.encode_wav_pcm16(s, 16000)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    patched = blob[:12] + extra + blob[12:]
    riff_size = struct.unpack("<I", patched[4:8])[0] + len(extra)
    patched = patched[:4] + struct.pack("<I", riff_size) + patched[8:]
    rate, out = wav.decode_wav_pcm16(patched)
    assert rate == 16000 and np.array_equal(out, s)


def test_wav_decode_rejects_malformed():
    s = _clip(3, 64)
    good = wav.encode_wav_pcm16(s, 16000)
    with pytest.raises(ValueError):
        wav.decode_wav_pcm16(b"RIFX" + good[4:])  # bad magic
    with pytest.raises(ValueError):
        wav.decode_wav_pcm16(good[: len(good) - 10])  # truncated
    # stereo is outside the profile (patch channels in fmt chunk)
    bad = bytearray(good)
    fmt_at = bad.find(b"fmt ")
    bad[fmt_at + 10:fmt_at + 12] = struct.pack("<H", 2)
    with pytest.raises(ValueError, match="unsupported"):
        wav.decode_wav_pcm16(bytes(bad))
    # IEEE-float format is outside the profile
    bad = bytearray(good)
    bad[fmt_at + 8:fmt_at + 10] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="unsupported"):
        wav.decode_wav_pcm16(bytes(bad))
    # data before fmt
    with pytest.raises(ValueError):
        wav.decode_wav_pcm16(
            good[:12] + b"data\x02\x00\x00\x00\x01\x02"
        )


def test_audio_features(spark):
    """Feature values check against plain-numpy recomputation on the
    same samples; a truncated clip and a null payload are skipped."""
    s1, s2 = _clip(11, 480), _clip(22, 1600)
    rows = [
        ("a1", bytearray(wav.encode_wav_pcm16(s1, 16000))),
        ("a2", bytearray(wav.encode_wav_pcm16(s2, 8000))),
        ("bad", bytearray(wav.encode_wav_pcm16(s1, 16000)[:30])),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    got = {r["audio_id"]: r for r in extract_audio_features(df).collect()}
    assert set(got) == {"a1", "a2"}
    for aid, s, rate in (("a1", s1, 16000), ("a2", s2, 8000)):
        x = s.astype(np.float64)
        r = got[aid]
        assert r["rate"] == rate
        assert r["n_samples"] == len(s)
        assert abs(r["duration_s"] - len(s) / rate) < 1e-12
        assert abs(r["rms"] - float(np.sqrt(np.mean(x * x)))) < 1e-9
        assert r["peak"] == int(np.max(np.abs(x)))
        signs = np.signbit(s)
        zcr = int(np.count_nonzero(signs[1:] != signs[:-1])) / (len(s) - 1)
        assert abs(r["zero_cross_rate"] - zcr) < 1e-12
