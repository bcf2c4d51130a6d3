"""The compiled fused-MSE kernel must be indistinguishable from the
numpy reference pipeline in checks/integrity.py — bit-identical
squared-difference sums (hence bit-identical MSE and PSNR verdicts)
across widths, noise amplitudes, ragged tails, sampled-run mode and
full-u64 seeds; plus the runtime kill-switch contract."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from perl_data_validate_sanctions_spark.checks import integrity
from perl_data_validate_sanctions_spark.sources import codec, mse_c

if not mse_c.available():  # pragma: no cover - container has cc
    pytest.skip("compiled mse kernel unavailable (no cc?)",
                allow_module_level=True)

_SETTINGS = dict(max_examples=30, deadline=None, derandomize=True)


def _numpy_ssd(seeds, ref_seeds, amp, n_pixels, word_idx):
    """The reference pipeline, spelled with the same codec calls the
    numpy branch of integrity._mse_rows uses (fresh arrays, no pools —
    the obviously-correct form)."""
    if word_idx is not None:
        dec = codec.render_batch_runs(seeds, word_idx)
        ref = codec.render_batch_runs(ref_seeds, word_idx)
        noise = codec.noise_batch_runs(seeds, word_idx, amp) if amp else None
    else:
        dec = codec.render_batch(seeds, n_pixels)
        ref = codec.render_batch(ref_seeds, n_pixels)
        noise = codec.noise_batch(seeds, n_pixels, amp) if amp else None
    d = dec.astype(np.int64)
    if noise is not None:
        d = np.clip(d + noise, 0, 255)
    diff = d - ref.astype(np.int64)
    return (diff * diff).sum(axis=1, dtype=np.int64)


@given(
    n_pixels=st.integers(min_value=1, max_value=5000),
    amp=st.sampled_from([0, 1, 8, 9, 16]),
    seed0=st.integers(min_value=0, max_value=(1 << 64) - 1),
)
@settings(**_SETTINGS)
def test_full_mode_bit_identical(n_pixels, amp, seed0):
    n = 7
    seeds = (np.uint64(seed0) + np.arange(n, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
    refs = seeds[::-1].copy()
    got = mse_c.ssd_rows(seeds, refs, amp, n_pixels, None)
    want = _numpy_ssd(seeds, refs, amp, n_pixels, None)
    assert got is not None
    np.testing.assert_array_equal(got, want)


@given(
    n_words_full=st.integers(min_value=1, max_value=600),
    amp=st.sampled_from([0, 1, 9]),
    pick=st.integers(min_value=1, max_value=64),
)
@settings(**_SETTINGS)
def test_sampled_runs_bit_identical(n_words_full, amp, pick):
    seeds = np.arange(5, dtype=np.uint64) * np.uint64(977) + np.uint64(3)
    refs = seeds + np.uint64(12345)
    k = min(pick, n_words_full)
    idx = np.unique(
        (np.arange(k, dtype=np.float64) * n_words_full / k).astype(np.int64)
    ).astype(np.uint64)
    got = mse_c.ssd_rows(seeds, refs, amp, n_words_full * 8, idx)
    want = _numpy_ssd(seeds, refs, amp, n_words_full * 8, idx)
    np.testing.assert_array_equal(got, want)


def test_identical_rows_are_zero():
    seeds = np.array([42, 7, 0, (1 << 64) - 1], dtype=np.uint64)
    got = mse_c.ssd_rows(seeds, seeds.copy(), 0, 3072, None)
    np.testing.assert_array_equal(got, np.zeros(4, dtype=np.int64))


def test_mse_rows_dispatch_matches_numpy(monkeypatch):
    """integrity._mse_rows must return the same float MSE with the
    kernel on and off (the end-to-end dispatch seam, incl. the /m)."""
    seeds = np.arange(20, dtype=np.uint64) * np.uint64(31) + np.uint64(9)
    refs = seeds + np.uint64(1)
    for amp, wh, idx in ((1, 613, None), (0, 613, None),
                         (9, 4096, np.arange(0, 64, 3, dtype=np.uint64))):
        on = integrity._mse_rows(seeds, refs, amp, wh, idx)
        monkeypatch.setenv("PDVS_MSE_C", "0")
        off = integrity._mse_rows(seeds, refs, amp, wh, idx)
        monkeypatch.delenv("PDVS_MSE_C")
        np.testing.assert_array_equal(on, off)


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("PDVS_MSE_C", "0")
    assert not mse_c.available()
    assert mse_c.ssd_rows(
        np.array([1], dtype=np.uint64), np.array([2], dtype=np.uint64),
        0, 64, None,
    ) is None
    monkeypatch.delenv("PDVS_MSE_C")
    assert mse_c.available()
