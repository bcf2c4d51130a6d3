"""Stdlib-only PNG codec (grayscale, 8-bit) — the real-decode path.

The container ships no Pillow/libjpeg, but PNG needs neither: the
format is zlib deflate (stdlib ``zlib``) around per-row filter bytes
(None/Sub/Up/Average/Paeth — RFC 2083 §6), fully invertible with
numpy. This gives the payload-integrity check a REAL end-to-end decode
mode for PNG payloads (``checks/integrity.py`` sniffs the 8-byte PNG
signature and routes here), next to the deterministic stub codec used
for the synthetic PDVS1 payloads.

Scope (documented, enforced): bit depth 8, color type 0 (grayscale),
no interlace — the minimal profile the validation target needs. Other
profiles raise ``ValueError`` (→ an "undecodable payload" violation
row, never a task failure). The encoder exists for fixtures/tests and
supports a per-row filter choice so round-trip tests exercise every
unfilter branch.

Throughput cliff (know before pointing this at large images): the
None/Sub/Up filters unfilter as numpy whole-row ops, but Average and
Paeth have a LEFT-pixel dependency (recon[x] needs recon[x-1] through
a floor-div / three-way-min predictor), which admits no prefix-scan
vectorization — those two branches run a per-pixel pure-Python loop,
~1-2 Mpx/s/core. The bench's 64×48 fixtures hide this; a 4096×4096
Paeth-heavy image costs ~10 s of interpreter time. Mitigation: when
Pillow is importable, payloads ≥ ``_PIL_MIN_PX`` pixels that have
ALREADY passed this module's strict validation walk (signature, CRCs,
profile, zlib stream, size) are pixel-decoded by Pillow's C path —
pure speedup, identical semantics, because every violation class
raises before Pillow is consulted and PNG decoding of a valid stream
is deterministic. This container has no Pillow, so the gate stays
cold here (and the per-pixel cost is recorded in SCALING.md).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import png_unfilter_c as _unfilter_c

try:  # optional C fast path for big Average/Paeth images — see docstring
    from PIL import Image as _PILImage  # pragma: no cover - not in container
except Exception:  # pragma: no cover
    _PILImage = None

_PIL_MIN_PX = 1 << 20  # 1 Mpx: below this the numpy/Python path is fine

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_gray(
    img: np.ndarray, row_filters: list[int] | None = None
) -> bytes:
    """Encode an (h, w) uint8 array as a grayscale 8-bit PNG.

    ``row_filters``: optional per-row filter types (0-4); default all 0.
    Filtering is computed exactly per RFC 2083 §6.1, so a decoder must
    invert every chosen filter to reproduce ``img`` — which is what the
    round-trip test uses to exercise all five unfilter branches."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("expected (h, w) grayscale array")
    h, w = img.shape
    filters = row_filters if row_filters is not None else [0] * h
    if len(filters) != h:
        raise ValueError("row_filters length must equal image height")
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int16)
    for y in range(h):
        row = img[y].astype(np.int16)
        f = filters[y]
        left = np.concatenate(([0], row[:-1]))
        up = prev
        upleft = np.concatenate(([0], prev[:-1]))
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            filt = row - left
        elif f == 2:  # Up
            filt = row - up
        elif f == 3:  # Average
            filt = row - (left + up) // 2
        elif f == 4:  # Paeth
            filt = row - _paeth(left, up, upleft)
        else:
            raise ValueError(f"bad filter type {f}")
        raw.append(f)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (RFC 2083 §6.6), int16 in/out."""
    p = left + up - upleft
    pa = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - upleft)
    return np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))


def decode_png_gray(payload: bytes) -> tuple[int, int, np.ndarray]:
    """payload → (w, h, pixels[(h, w) uint8]). Raises ValueError on
    anything malformed (bad signature/CRC/zlib stream/filter byte) or
    outside the supported profile."""
    data = bytes(payload)
    if data[:8] != PNG_MAGIC:
        raise ValueError("bad PNG signature")
    pos = 8
    w = h = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, ctype_c, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype_c, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG profile (need 8-bit grayscale, "
                    "no interlace)"
                )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if w is None or not idat or not seen_end:
        raise ValueError("missing IHDR/IDAT/IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad zlib stream: {e}") from e
    if len(raw) != h * (w + 1):
        raise ValueError("decompressed size mismatch")
    # Compiled fast path (sources/png_unfilter_c.py): an exact C
    # transliteration of the per-row dispatch below. Every violation
    # class has already raised above; the only in-stream anomaly left
    # is an unknown filter byte, for which the kernel returns None and
    # the reference loop below raises the exact ValueError. Output
    # equality is property-tested (tests/test_png_c_kernel.py).
    if _unfilter_c.available():
        out = _unfilter_c.unfilter(raw, int(h), int(w))
        if out is not None:
            return int(w), int(h), out
    if (
        _PILImage is not None and w * h >= _PIL_MIN_PX
    ):  # pragma: no cover - Pillow absent in this container
        # every violation class has already raised above; a valid
        # stream decodes deterministically, so the C path is a pure
        # speedup for the Average/Paeth per-pixel branches below.
        # Pillow can still raise non-ValueError on its own account
        # (DecompressionBombError at ~178 Mpx, OSError parse quirks) —
        # the per-row error-isolation contract is "ValueError on bad
        # payload", so any Pillow failure falls through to the pure-
        # Python unfilter path instead of escaping as a task failure.
        import io

        try:
            arr = np.asarray(_PILImage.open(io.BytesIO(data)),
                             dtype=np.uint8)
            if arr.shape == (h, w):
                return int(w), int(h), arr
        except Exception:  # noqa: BLE001
            pass
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        f = int(scan[y, 0])
        row = scan[y, 1:]
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-1] — uint8
            # accumulate wraps mod 256, which IS the spec arithmetic
            rec = np.add.accumulate(row, dtype=np.uint8)
        elif f == 2:  # Up
            rec = row + prev  # uint8 wraps mod 256
        elif f == 3:  # Average: left-sequential
            rec = np.empty(w, dtype=np.uint8)
            a = 0
            for x in range(w):
                a = (int(row[x]) + (a + int(prev[x])) // 2) & 0xFF
                rec[x] = a
        elif f == 4:  # Paeth: left-sequential
            rec = np.empty(w, dtype=np.uint8)
            a = c = 0
            for x in range(w):
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (int(row[x]) + pred) & 0xFF
                rec[x] = v
                a, c = v, b
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = rec
        prev = rec
    return int(w), int(h), out
