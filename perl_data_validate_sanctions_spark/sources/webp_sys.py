"""System-libwebp (ctypes) decode/encode for LOSSY WebP — VP8/VP8X.

The engine ships from-scratch codecs for PNG (RFC 2083 over stdlib
zlib), baseline JPEG (ITU-T T.81), RIFF/WAVE, AVI/MJPEG and
WebP-lossless (VP8L, sources/webp.py). Lossy VP8 is the one leg where
"from scratch" would mean transcribing RFC 6386's ~1k default
probability-table constants with no network and no reference copy in
this container to verify them against — so, exactly like PNG's use of
the stdlib zlib inflate, the lossy leg binds the SYSTEM libwebp (a
public, universally-packaged C library, already used by
tests/test_webp.py as the VP8L conformance oracle) via ctypes when it
is present. When it is absent, callers keep the distinct
``codec_unavailable`` violation reason (checks/integrity.py:65): a
lossy payload is then reported as *missing codec*, never as
corruption.

Reference analog: the reference delegates transport, zip extraction
and XML parsing to system/CPAN libraries rather than reimplementing
them (Fetcher.pm:258-806, Mojo::UserAgent/xml2hash); bundling a
decoder is its exception, delegating to a library the norm.

Error contract: every public function raises ``ValueError`` on a bad
payload or an encode-parameter violation and ``RuntimeError`` only
when called while ``available()`` is False — matching the per-row
error-isolation contract the other codec modules document.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB: ctypes.CDLL | None = None
_LOADED = False


def _lib() -> ctypes.CDLL | None:
    """Load-and-memoize the system libwebp, or None if unavailable.

    Executor-side safe: each Python worker pays one dlopen on first
    use, then hits the module-level cache."""
    global _LIB, _LOADED
    if _LOADED:
        return _LIB
    _LOADED = True
    lib = None
    for name in ("libwebp.so.7", "libwebp.7.dylib", "libwebp.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        found = ctypes.util.find_library("webp")
        if found:
            try:
                lib = ctypes.CDLL(found)
            except OSError:
                lib = None
    if lib is None:
        return None
    try:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = u8p
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(u8p),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
    except AttributeError:
        # a libwebp too old/stripped to carry the public API — treat
        # as absent rather than half-bound
        return None
    _LIB = lib
    return _LIB


def available() -> bool:
    """True when the system libwebp is loadable with the full API."""
    return _lib() is not None


def decode_gray(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Decode any WebP flavor the system libwebp accepts (lossy VP8,
    VP8X extended, and VP8L too) → ``(w, h, uint8 (h, w))`` from the
    green channel — the channel convention sources/webp.py documents
    (equal to R/B for genuinely gray images; for lossy streams the
    YUV⇄RGB round-trip may differ per channel by ±1, absorbed by the
    PSNR≥40dB gate the integrity check applies to lossy formats).

    Raises ``ValueError`` on anything libwebp rejects."""
    lib = _lib()
    if lib is None:  # pragma: no cover - container ships libwebp7
        raise RuntimeError("system libwebp is not available")
    data = bytes(blob)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w),
                           ctypes.byref(h)):
        raise ValueError("libwebp rejected the WebP header")
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                             ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp failed to decode the WebP bitstream")
    try:
        n = int(w.value) * int(h.value) * 4
        rgba = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    pixels = rgba.reshape(int(h.value), int(w.value), 4)[:, :, 1]
    return int(w.value), int(h.value), np.ascontiguousarray(pixels)


def encode_lossy_gray(pixels: np.ndarray, quality: float = 95.0) -> bytes:
    """Encode a uint8 grayscale image as a LOSSY VP8 WebP via the
    system libwebp (gray replicated to RGB; the encoder's RGB→YUV
    keeps Y ≈ gray and U=V≈128, so the round-trip error is the DCT
    quantization the PSNR gate measures, not a colorspace artifact).

    Raises ``ValueError`` on bad inputs, ``RuntimeError`` when the
    library is absent."""
    lib = _lib()
    if lib is None:  # pragma: no cover - container ships libwebp7
        raise RuntimeError("system libwebp is not available")
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2 or arr.size == 0:
        raise ValueError("pixels must be a non-empty 2-D uint8 array")
    h, w = arr.shape
    if w > 16383 or h > 16383:
        raise ValueError("WebP dimensions cap at 16383")
    if not (0.0 <= float(quality) <= 100.0):
        raise ValueError("quality must be in [0, 100]")
    rgb = np.repeat(arr.reshape(h, w, 1), 3, axis=2)
    buf = np.ascontiguousarray(rgb).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(buf, w, h, w * 3, float(quality),
                             ctypes.byref(out))
    if size == 0 or not out:
        raise ValueError("libwebp failed to encode the image")
    try:
        blob = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return blob
