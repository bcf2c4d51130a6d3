"""Optional compiled fast path for the baseline-JPEG entropy scan.

The pure-Python Huffman loop in ``jpeg.decode_jpeg_gray`` is the
reference implementation and the error-semantics authority — it stays
exactly as it is.  This module compiles a ~100-line C transliteration
of that loop once per machine (system ``cc``, no third-party code, no
package installs) and exposes it through ctypes, the same layered
fast-path pattern as the Pillow branch in ``sources/png.py`` and the
system-libwebp binding in ``sources/webp_sys.py``:

- any compile/load problem →  :func:`available` is False and callers
  use the Python loop — the engine never *requires* a compiler;
- any in-stream anomaly (invalid code, bad category, truncation,
  accumulator drift) → the kernel returns a nonzero status and the
  caller re-runs the Python loop from scratch, so every ``ValueError``
  message and acceptance decision is produced by the reference code;
- on status 0 the kernel's coefficient matrix and final bit cursor are
  bit-for-bit what the Python loop computes — pinned by the property
  tests in ``tests/test_jpeg_c_kernel.py``.

Scale note: executors on a gcc-less machine silently run pure Python;
the kernel is a per-process ~10× decode speedup where a toolchain
exists (this container has one), never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .cbuild import load_kernel

# Exact C transliteration of the per-block loop in
# jpeg.decode_jpeg_gray (see that function for the commented Python).
# Status contract: 0 = decoded, anything else = "re-run the Python
# loop" (which then raises the precise ValueError, or — for the
# accumulator-drift guard — reproduces the reference behavior exactly).
_C_SOURCE = r"""
#include <stdint.h>

#define ST_OK 0
#define ST_FALLBACK 1

/* ent must carry 4 zero pad bytes past ent_len (the caller pads),
   mirroring the Python w32 window; valid byte index is 0..ent_len. */
long pdvs_jpeg_scan(const unsigned char *ent, long ent_len,
                    long total_bits, long n_blocks,
                    const int32_t *dc, const int32_t *ac,
                    int32_t *zz, long *out_bitpos)
{
    long bitpos = 0;
    long pred = 0;
    long b, idx;
    uint32_t chunk;
    int32_t hit;
    long s, k, sym, v;

    for (b = 0; b < n_blocks; b++) {
        idx = bitpos >> 3;
        if (idx > ent_len) return ST_FALLBACK;
        chunk = ((uint32_t)ent[idx] << 24) | ((uint32_t)ent[idx + 1] << 16)
              | ((uint32_t)ent[idx + 2] << 8) | (uint32_t)ent[idx + 3];
        hit = dc[(chunk >> (16 - (bitpos & 7))) & 0xFFFF];
        if (!hit) return ST_FALLBACK;          /* invalid DC code */
        s = hit >> 8;
        bitpos += hit & 0xFF;
        if (s > 11) return ST_FALLBACK;        /* bad DC category */
        if (s) {
            idx = bitpos >> 3;
            if (idx > ent_len) return ST_FALLBACK;
            chunk = ((uint32_t)ent[idx] << 24)
                  | ((uint32_t)ent[idx + 1] << 16)
                  | ((uint32_t)ent[idx + 2] << 8) | (uint32_t)ent[idx + 3];
            v = (chunk >> (32 - (bitpos & 7) - s)) & ((1L << s) - 1);
            bitpos += s;
            pred += (v >= (1L << (s - 1))) ? v : v - (1L << s) + 1;
            /* Python's zz is int32 but pred is unbounded; a corrupt
               stream could drift it — defer to the reference loop long
               before the int32 edge so both paths always agree. */
            if (pred > (1L << 30) || pred < -(1L << 30)) return ST_FALLBACK;
        }
        zz[b * 64] = (int32_t)pred;
        k = 1;
        while (k < 64) {
            idx = bitpos >> 3;
            if (idx > ent_len) return ST_FALLBACK;
            chunk = ((uint32_t)ent[idx] << 24)
                  | ((uint32_t)ent[idx + 1] << 16)
                  | ((uint32_t)ent[idx + 2] << 8) | (uint32_t)ent[idx + 3];
            hit = ac[(chunk >> (16 - (bitpos & 7))) & 0xFFFF];
            if (!hit) return ST_FALLBACK;      /* invalid AC code */
            sym = hit >> 8;
            bitpos += hit & 0xFF;
            s = sym & 0x0F;
            if (s == 0) {
                if (sym == 0x00) break;        /* EOB */
                if (sym == 0xF0) { k += 16; continue; }  /* ZRL */
                return ST_FALLBACK;            /* bad AC symbol */
            }
            k += sym >> 4;
            if (k > 63) return ST_FALLBACK;    /* index out of range */
            idx = bitpos >> 3;
            if (idx > ent_len) return ST_FALLBACK;
            chunk = ((uint32_t)ent[idx] << 24)
                  | ((uint32_t)ent[idx + 1] << 16)
                  | ((uint32_t)ent[idx + 2] << 8) | (uint32_t)ent[idx + 3];
            v = (chunk >> (32 - (bitpos & 7) - s)) & ((1L << s) - 1);
            bitpos += s;
            zz[b * 64 + k] =
                (int32_t)((v >= (1L << (s - 1))) ? v : v - (1L << s) + 1);
            k += 1;
        }
        if (bitpos > total_bits) return ST_FALLBACK;  /* truncated */
    }
    *out_bitpos = bitpos;
    return ST_OK;
}
"""

_ENV_FLAG = "PDVS_JPEG_C"  # "0" disables the kernel entirely

_lib = None
_load_attempted = False


def available() -> bool:
    """True when the compiled kernel is loaded (lazy, once per process)."""
    global _lib, _load_attempted
    if os.environ.get(_ENV_FLAG, "1") == "0":
        return False
    if not _load_attempted:
        _load_attempted = True
        _lib = load_kernel(
            "pdvs_jpeg_scan",
            _C_SOURCE,
            "pdvs_jpeg_scan",
            ctypes.c_long,
            [
                ctypes.c_char_p,                  # ent (padded)
                ctypes.c_long,                    # ent_len (unpadded)
                ctypes.c_long,                    # total_bits
                ctypes.c_long,                    # n_blocks
                ctypes.POINTER(ctypes.c_int32),   # dc lut
                ctypes.POINTER(ctypes.c_int32),   # ac lut
                ctypes.POINTER(ctypes.c_int32),   # zz out
                ctypes.POINTER(ctypes.c_long),    # out bitpos
            ],
        )
    return _lib is not None


# id-keyed LUT array cache: the keys are the list objects that
# jpeg._LUT_CACHE itself keeps alive for the life of the process, so an
# id can never be recycled while an entry exists (the value tuple also
# holds a strong reference to the list, making that explicit).
_ARR_CACHE: dict[int, tuple[list, np.ndarray]] = {}


def lut_array(lut: list) -> np.ndarray:
    ent = _ARR_CACHE.get(id(lut))
    if ent is not None:
        return ent[1]
    arr = np.asarray(lut, dtype=np.int32)
    _ARR_CACHE[id(lut)] = (lut, arr)
    return arr


_I32P = ctypes.POINTER(ctypes.c_int32)


def decode_scan(
    ent: bytes,
    total_bits: int,
    n_blocks: int,
    dc: list,
    ac: list,
    zz: np.ndarray,
) -> tuple[int, int]:
    """Run the kernel; returns (status, bitpos). status != 0 means the
    caller must fall back to the Python loop (zz contents are then
    unspecified — re-zero before reuse)."""
    dc_arr = lut_array(dc)
    ac_arr = lut_array(ac)
    out_bitpos = ctypes.c_long(0)
    status = _lib(
        ent + b"\x00\x00\x00\x00",
        len(ent),
        total_bits,
        n_blocks,
        dc_arr.ctypes.data_as(_I32P),
        ac_arr.ctypes.data_as(_I32P),
        zz.ctypes.data_as(_I32P),
        ctypes.byref(out_bitpos),
    )
    return int(status), int(out_bitpos.value)
