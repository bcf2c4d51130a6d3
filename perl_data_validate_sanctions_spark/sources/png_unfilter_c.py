"""Optional compiled fast path for the PNG scanline unfilter.

Filters 0/1/2 vectorize fine in numpy, but Average (3) and Paeth (4)
are left-sequential per pixel — a pure-Python inner loop in
``png.decode_png_gray``.  This kernel is an exact C transliteration of
the whole per-row dispatch (all five filters, RFC 2083 §6), compiled
and loaded through :mod:`cbuild` with the same contract as the JPEG
scan kernel (sources/jpeg_scan_c.py): unavailable toolchain → pure
Python; unknown filter byte → nonzero status and the caller re-runs
the reference loop to raise the exact ValueError; status 0 output is
property-tested byte-for-byte identical
(tests/test_jpeg_c_kernel.py-style laws in tests/test_png_c_kernel.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .cbuild import load_kernel

_C_SOURCE = r"""
#include <string.h>

/* scan: h rows of (1 filter byte + w raw bytes); out: h*w recon.
   Returns 0, or 1 on a filter byte > 4 (caller falls back to the
   Python loop for the exact error). All arithmetic mod 256 per the
   spec (unsigned char wraps). */
long pdvs_png_unfilter(const unsigned char *scan, long h, long w,
                       unsigned char *out)
{
    long y, x;
    const unsigned char *prev = 0;
    for (y = 0; y < h; y++) {
        const unsigned char *row = scan + y * (w + 1);
        unsigned char f = row[0];
        unsigned char *rec = out + y * w;
        row += 1;
        if (f == 0) {
            memcpy(rec, row, (size_t)w);
        } else if (f == 1) {           /* Sub */
            unsigned char a = 0;
            for (x = 0; x < w; x++) { a = (unsigned char)(row[x] + a); rec[x] = a; }
        } else if (f == 2) {           /* Up */
            if (prev)
                for (x = 0; x < w; x++) rec[x] = (unsigned char)(row[x] + prev[x]);
            else
                memcpy(rec, row, (size_t)w);
        } else if (f == 3) {           /* Average */
            int a = 0;
            for (x = 0; x < w; x++) {
                int b = prev ? prev[x] : 0;
                a = (row[x] + ((a + b) >> 1)) & 0xFF;
                rec[x] = (unsigned char)a;
            }
        } else if (f == 4) {           /* Paeth */
            int a = 0, c = 0;
            for (x = 0; x < w; x++) {
                int b = prev ? prev[x] : 0;
                int p = a + b - c;
                int pa = p - a < 0 ? a - p : p - a;
                int pb = p - b < 0 ? b - p : p - b;
                int pc = p - c < 0 ? c - p : p - c;
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                int v = (row[x] + pred) & 0xFF;
                rec[x] = (unsigned char)v;
                a = v; c = b;
            }
        } else {
            return 1;
        }
        prev = rec;
    }
    return 0;
}
"""

_ENV_FLAG = "PDVS_PNG_C"  # "0" disables the kernel entirely

_lib = None
_load_attempted = False


def available() -> bool:
    global _lib, _load_attempted
    if os.environ.get(_ENV_FLAG, "1") == "0":
        return False
    if not _load_attempted:
        _load_attempted = True
        _lib = load_kernel(
            "pdvs_png_unfilter",
            _C_SOURCE,
            "pdvs_png_unfilter",
            ctypes.c_long,
            [
                ctypes.c_char_p,                 # scan (h*(w+1) bytes)
                ctypes.c_long,                   # h
                ctypes.c_long,                   # w
                ctypes.POINTER(ctypes.c_uint8),  # out (h*w)
            ],
        )
    return _lib is not None


_U8P = ctypes.POINTER(ctypes.c_uint8)


def unfilter(raw: bytes, h: int, w: int) -> np.ndarray | None:
    """Reconstruct the (h, w) image from the decompressed scanline
    stream, or None when the caller must fall back to the Python loop
    (unknown filter byte — the reference loop then raises exactly)."""
    out = np.empty((h, w), dtype=np.uint8)
    status = _lib(raw, h, w, out.ctypes.data_as(_U8P))
    if status != 0:
        return None
    return out
