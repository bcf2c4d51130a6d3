"""Stdlib AVI/MJPEG codec — the REAL video leg of the multimodal
column story.

AVI is RIFF framing (the same public chunk grammar as sources/wav.py)
and Motion-JPEG frames are just baseline JPEGs — which sources/jpeg.py
already decodes for real. Composing the two gives an honest video
container at zero new dependency cost: every byte of a frame travels
the T.81 Huffman/IDCT path, and the container walk is ``struct`` only.

Scope (documented, enforced): RIFF 'AVI ' with a single 'vids' stream,
handler/compression 'MJPG', grayscale frames within the JPEG module's
baseline profile, no interleaved audio, the optional 'idx1' index
ignored (players rebuild it from 'movi' exactly as this decoder does).
Everything outside the profile raises ``ValueError`` — a validation
check maps that to a violation row, never a task failure (the same
per-source error-isolation contract as the other codecs, mirroring
/root/reference/lib/Data/Validate/Sanctions/Fetcher.pm:830-859).

Execution shape: the container walk is a few µs of header parsing per
clip; the cost is the per-frame JPEG entropy decode (~2.4 ms per 64×48
white-noise frame, see sources/jpeg.py). Frames never leave the Arrow
worker — only per-frame summary rows do.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg

AVI_MAGIC = b"RIFF"


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 95
) -> bytes:
    """Encode (h, w) uint8 frames as a single-stream MJPG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one shape")
    if not 1 <= int(fps) <= 0xFFFFFFFF:
        raise ValueError("bad fps")
    # strh packs the frame rect as signed 16-bit; without this guard an
    # oversized frame would surface as struct.error instead of the
    # module's documented ValueError contract (JPEG itself caps at
    # 65535, but the rcFrame fields are the tighter bound here)
    if not (0 < w <= 0x7FFF and 0 < h <= 0x7FFF):
        raise ValueError(f"frame dims {w}x{h} out of AVI rcFrame range "
                         "(1..32767)")

    payloads = [jpeg.encode_jpeg_gray(f, quality=quality) for f in frames]
    max_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // int(fps),  # microseconds per frame
        max_bytes * int(fps),   # suggested max bytes/sec
        0,                      # padding granularity
        0x10,                   # AVIF_HASINDEX unset; 0x10 = WASCAPTUREFILE-free flags kept minimal
        len(payloads), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IIIIIIIIIII", 0, 0, 0, 1, int(fps), 0,
                      len(payloads), max_bytes, 0xFFFFFFFF, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8, b"MJPG", w * h, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """Decode a single-stream MJPG AVI → (fps, [(h, w) uint8 frames]).

    Raises ``ValueError`` on anything outside the documented profile,
    on broken container framing, or on any broken frame bitstream."""
    data = bytes(payload)
    if data[:4] != AVI_MAGIC:
        raise ValueError("bad RIFF signature")
    if len(data) < 12 or data[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    riff_size = struct.unpack("<I", data[4:8])[0]
    if riff_size + 8 > len(data):
        raise ValueError("truncated container (RIFF size past EOF)")

    fps: int | None = None
    hdr_wh: tuple[int, int] | None = None
    frames: list[np.ndarray] | None = None

    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"LIST" and body[:4] == b"hdrl":
            fps, hdr_wh = _parse_hdrl(body[4:])
        elif cid == b"LIST" and body[:4] == b"movi":
            if fps is None or hdr_wh is None:
                raise ValueError("movi before hdrl")
            frames = _parse_movi(body[4:], hdr_wh)
        pos += 8 + size + (size % 2)
    if fps is None or hdr_wh is None:
        raise ValueError("no hdrl list")
    if frames is None:
        raise ValueError("no movi list")
    return fps, frames


def _parse_hdrl(body: bytes) -> tuple[int, tuple[int, int]]:
    fps: int | None = None
    wh: tuple[int, int] | None = None
    pos = 0
    while pos + 8 <= len(body):
        cid = body[pos:pos + 4]
        size = struct.unpack("<I", body[pos + 4:pos + 8])[0]
        sub = body[pos + 8:pos + 8 + size]
        if len(sub) != size:
            raise ValueError(f"truncated {cid!r} chunk in hdrl")
        if cid == b"avih":
            if size < 40:
                raise ValueError("short avih")
            n_streams = struct.unpack("<I", sub[24:28])[0]
            if n_streams != 1:
                raise ValueError(
                    f"unsupported AVI profile ({n_streams} streams, "
                    "need 1)"
                )
            wh = struct.unpack("<II", sub[32:40])
        elif cid == b"LIST" and sub[:4] == b"strl":
            fps = _parse_strl(sub[4:])
        pos += 8 + size + (size % 2)
    if fps is None or wh is None:
        raise ValueError("hdrl missing avih or strl")
    return fps, (int(wh[0]), int(wh[1]))


def _parse_strl(body: bytes) -> int:
    pos = 0
    fps: int | None = None
    while pos + 8 <= len(body):
        cid = body[pos:pos + 4]
        size = struct.unpack("<I", body[pos + 4:pos + 8])[0]
        sub = body[pos + 8:pos + 8 + size]
        if len(sub) != size:
            raise ValueError(f"truncated {cid!r} chunk in strl")
        if cid == b"strh":
            if size < 36:
                raise ValueError("short strh")
            if sub[:4] != b"vids" or sub[4:8] != b"MJPG":
                raise ValueError(
                    "unsupported AVI profile (need a single MJPG "
                    f"video stream, got {sub[:4]!r}/{sub[4:8]!r})"
                )
            scale, rate = struct.unpack("<II", sub[20:28])
            if not scale or not rate or rate % scale:
                raise ValueError("bad strh scale/rate")
            fps = rate // scale
        pos += 8 + size + (size % 2)
    if fps is None:
        raise ValueError("strl missing strh")
    return fps


def _parse_movi(body: bytes, hdr_wh: tuple[int, int]) -> list[np.ndarray]:
    frames: list[np.ndarray] = []
    pos = 0
    while pos + 8 <= len(body):
        cid = body[pos:pos + 4]
        size = struct.unpack("<I", body[pos + 4:pos + 8])[0]
        sub = body[pos + 8:pos + 8 + size]
        if len(sub) != size:
            raise ValueError(f"truncated {cid!r} chunk in movi")
        if cid == b"00dc":
            w, h, px = jpeg.decode_jpeg_gray(sub)
            if (w, h) != hdr_wh:
                raise ValueError(
                    f"frame {len(frames)} is {w}x{h}, header says "
                    f"{hdr_wh[0]}x{hdr_wh[1]}"
                )
            frames.append(px)
        # non-00dc chunks (e.g. idx1 would sit outside movi anyway) skip
        pos += 8 + size + (size % 2)
    if not frames:
        raise ValueError("movi has no frames")
    return frames
