"""Optional compiled fast path for the synthetic-payload MSE compare.

``checks/integrity.py`` validates a synthetic (PDVS1) payload by
rendering the decoded and reference pixel streams (counter-based
splitmix64 generator, ``sources/codec.py``), adding the payload's noise
stream, and accumulating the squared difference. The numpy path does
that in ~6 full-size array passes (render ×2, noise, widen, clip,
subtract, square, reduce) — measured 131 Mpx/s/core with noise, 293
without. This kernel fuses the whole pipeline into ONE pass that keeps
every intermediate in registers: hash word → 8 pixel lanes → noise →
clip → diff² → accumulator, no arrays materialized at all.

Same layered contract as sources/jpeg_scan_c.py / png_unfilter_c.py:

- compile/load failure → :func:`available` is False and callers stay on
  the numpy reference path (``cc`` via :mod:`cbuild`, never a
  dependency);
- the kernel's per-row sums are BIT-IDENTICAL to the numpy path's
  (integer arithmetic throughout; the division by the pixel count
  happens in the caller, identically for both paths) — pinned by the
  property tests in tests/test_mse_c_kernel.py across widths, noise
  amps, ragged tails and sampled-run mode.
"""

from __future__ import annotations

import ctypes

import numpy as np

from .cbuild import load_kernel

_C_SOURCE = r"""
#include <stdint.h>

/* gcc honors these per-file; other compilers ignore unknown pragmas
   and the kernel still builds at the cbuild default -O2. Measured
   +27% on the no-noise path (754 -> 978 Mpx/s/core) from unrolling
   the 8-lane loop. */
#pragma GCC optimize("O3","unroll-loops")

#define GOLDEN      0x9E3779B97F4A7C15ULL
#define MIX_C1      0xBF58476D1CE4E5B9ULL
#define MIX_C2      0x94D049BB133111EBULL
#define NOISE_SALT  0x5EED5EED5EED5EEDULL

static inline uint64_t mix64(uint64_t z)
{
    z += GOLDEN;
    z = (z ^ (z >> 30)) * MIX_C1;
    z = (z ^ (z >> 27)) * MIX_C2;
    return z ^ (z >> 31);
}

/* One hash word (8 pixel lanes) of decoded-vs-reference squared
   difference. lut: 256-entry noise map nb -> clip-free noise value
   (b % span - amp), NULL when amp == 0. The clip to [0, 255] happens
   on the summed pixel, exactly like the numpy pipeline. */
static inline int64_t word_ssd(uint64_t dw, uint64_t rw, uint64_t nw,
                               const int *lut, long lanes)
{
    int64_t ssd = 0;
    long l;
    for (l = 0; l < lanes; l++) {
        int d = (int)(dw & 0xFF);
        int r = (int)(rw & 0xFF);
        if (lut) {
            d += lut[nw & 0xFF];
            if (d < 0) d = 0; else if (d > 255) d = 255;
            nw >>= 8;
        }
        d -= r;
        ssd += (int64_t)(d * d);
        dw >>= 8; rw >>= 8;
    }
    return ssd;
}

/* Per-row sum of squared differences between the decoded synthetic
   image (render(seed) + uniform noise in [-amp, amp], clipped to
   [0, 255]) and the reference image render(ref_seed).

   word_idx: NULL -> sequential words 0..n_words-1 (full image; the
   LAST word contributes only tail_lanes pixel lanes); non-NULL -> the
   given word indices (aligned 8-pixel runs; every word contributes all
   8 lanes, and tail_lanes is ignored).

   Bit-identical to the numpy pipeline in checks/integrity.py:
   render_batch / noise_batch / clip / diff / square / int64 sum.
   The noise byte map (b % span - amp) is a 256-entry table built once
   per call — the per-byte modulo was the scalar hot spot. */
long pdvs_mse_rows(const uint64_t *seeds, const uint64_t *ref_seeds,
                   long n_rows, const uint64_t *word_idx, long n_words,
                   long tail_lanes, long amp, int64_t *out)
{
    long i, w, b;
    int lut_store[256];
    const int *lut = 0;
    if (amp) {
        int span = (int)(2 * amp + 1);
        for (b = 0; b < 256; b++)
            lut_store[b] = (int)(b % span) - (int)amp;
        lut = lut_store;
    }
    for (i = 0; i < n_rows; i++) {
        uint64_t key  = mix64(seeds[i]);
        uint64_t rkey = mix64(ref_seeds[i]);
        uint64_t nkey = amp ? mix64(seeds[i] ^ NOISE_SALT) : 0;
        int64_t ssd = 0;
        if (word_idx) {
            for (w = 0; w < n_words; w++) {
                uint64_t ctr = (word_idx[w] + 1ULL) * GOLDEN;
                ssd += word_ssd(mix64(key ^ ctr), mix64(rkey ^ ctr),
                                amp ? mix64(nkey ^ ctr) : 0, lut, 8);
            }
        } else {
            for (w = 0; w < n_words - 1; w++) {
                uint64_t ctr = ((uint64_t)w + 1ULL) * GOLDEN;
                ssd += word_ssd(mix64(key ^ ctr), mix64(rkey ^ ctr),
                                amp ? mix64(nkey ^ ctr) : 0, lut, 8);
            }
            if (n_words > 0) {
                uint64_t ctr = ((uint64_t)n_words) * GOLDEN;
                ssd += word_ssd(mix64(key ^ ctr), mix64(rkey ^ ctr),
                                amp ? mix64(nkey ^ ctr) : 0, lut,
                                tail_lanes);
            }
        }
        out[i] = ssd;
    }
    return 0;
}
"""

_U64P = ctypes.POINTER(ctypes.c_uint64)
_I64P = ctypes.POINTER(ctypes.c_int64)

_KERNEL = load_kernel(
    "pdvs_mse",
    _C_SOURCE,
    "pdvs_mse_rows",
    ctypes.c_long,
    [_U64P, _U64P, ctypes.c_long, _U64P, ctypes.c_long, ctypes.c_long,
     ctypes.c_long, _I64P],
)


def available() -> bool:
    """Kernel loadable AND not disabled (``PDVS_MSE_C=0`` is the same
    runtime kill-switch contract as the PNG/JPEG kernels)."""
    import os

    return _KERNEL is not None and os.environ.get("PDVS_MSE_C") != "0"


def ssd_rows(
    seeds: np.ndarray,
    ref_seeds: np.ndarray,
    amp: int,
    n_pixels: int,
    word_idx: np.ndarray | None,
) -> np.ndarray | None:
    """Per-row int64 squared-difference sums, or None when the kernel
    is unavailable (caller falls back to the numpy path).

    ``word_idx=None`` → the full image (``n_pixels`` pixels, ragged
    tail handled); else the given aligned 8-pixel word runs (the
    sampled-estimate mode — every listed word is a full word)."""
    if not available():
        return None
    s = np.ascontiguousarray(seeds, dtype=np.uint64)
    r = np.ascontiguousarray(ref_seeds, dtype=np.uint64)
    n = len(s)
    out = np.empty(n, dtype=np.int64)
    if word_idx is None:
        n_words = (n_pixels + 7) // 8
        tail = n_pixels - 8 * (n_words - 1)
        widx_p = None
    else:
        wi = np.ascontiguousarray(word_idx, dtype=np.uint64)
        n_words = len(wi)
        tail = 8
        widx_p = wi.ctypes.data_as(_U64P)
    _KERNEL(
        s.ctypes.data_as(_U64P),
        r.ctypes.data_as(_U64P),
        ctypes.c_long(n),
        widx_p,
        ctypes.c_long(n_words),
        ctypes.c_long(tail),
        ctypes.c_long(int(amp)),
        out.ctypes.data_as(_I64P),
    )
    return out
