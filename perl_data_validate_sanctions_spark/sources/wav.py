"""Stdlib WAV (RIFF PCM) codec — the REAL audio leg of the multimodal
column story.

The north-star treats image/audio/video as opaque ``binary`` columns
with typed metadata. Round 4/5 made the image leg real (sources/png.py,
sources/jpeg.py); WAV makes audio real at zero dependency cost: RIFF
PCM is an uncompressed container (public spec: the RIFF-WAVE format of
IBM/Microsoft's Multimedia Programming Interface, 1991), so ``struct``
and numpy decode it completely — no audio library, nothing faked.

Scope (documented, enforced): canonical RIFF/WAVE framing, ``fmt ``
chunk with audio format 1 (integer PCM), 16-bit samples, mono. Unknown
chunks are skipped per the RIFF rules (word alignment honored).
Everything outside the profile raises ``ValueError`` — which the
multimodal feature extractor maps to a skipped row and a validation
check would map to a violation row, never a task failure (the same
per-source error-isolation contract as the image codecs, mirroring the
reference's per-source try/except —
/root/reference/lib/Data/Validate/Sanctions/Fetcher.pm:830-859).

Execution shape: decode is a header walk (~µs) plus one zero-copy
``np.frombuffer`` over the data chunk — there is no entropy coding, so
unlike JPEG nothing is per-sample Python. Samples never leave the
Arrow worker; only feature/violation rows do.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Encode a mono int16 sample array as a canonical RIFF/WAVE file."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1 or not s.size:
        raise ValueError("expected a non-empty 1-D int16 sample array")
    # byte-rate (rate*2) must itself fit the 32-bit fmt field
    if not 1 <= int(rate) <= 0x7FFFFFFF:
        raise ValueError("bad sample rate")
    data = s.tobytes()
    # RIFF sizes are 32-bit: oversized data must fail as the module's
    # documented ValueError, not as struct.error mid-pack
    if len(data) + 44 > 0xFFFFFFFF:
        raise ValueError("sample data exceeds the 4 GiB RIFF size field")
    fmt_body = struct.pack(
        "<HHIIHH",
        1,            # audio format: integer PCM
        1,            # channels: mono
        int(rate),
        int(rate) * 2,  # byte rate = rate * block_align
        2,            # block align = channels * bits/8
        16,           # bits per sample
    )
    pad = b"\x00" if len(data) % 2 else b""
    riff_size = 4 + (8 + len(fmt_body)) + (8 + len(data) + len(pad))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE PCM16 mono file → (sample_rate, int16 array).

    Raises ``ValueError`` on anything outside the documented profile or
    on a malformed container — callers map that to a skipped row
    (feature extraction) or a violation row (validation)."""
    data = bytes(payload)
    if data[:4] != WAV_MAGIC:
        raise ValueError("bad RIFF signature")
    if len(data) < 12 or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE container")
    riff_size = struct.unpack("<I", data[4:8])[0]
    if riff_size + 8 > len(data):
        raise ValueError("truncated container (RIFF size past EOF)")
    pos = 12
    rate: int | None = None
    samples: np.ndarray | None = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, channels, rate_, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(
                    f"unsupported WAV profile (format {audio_fmt}, "
                    "need integer PCM)"
                )
            if channels != 1:
                raise ValueError(
                    f"unsupported WAV profile ({channels} channels, "
                    "need mono)"
                )
            if bits != 16:
                raise ValueError(
                    f"unsupported WAV profile ({bits}-bit, need 16)"
                )
            if not rate_:
                raise ValueError("zero sample rate")
            rate = int(rate_)
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            if size % 2:
                raise ValueError("odd data-chunk length for 16-bit PCM")
            samples = np.frombuffer(body, dtype="<i2")
            break  # canonical files end with data; trailing chunks ignored
        # unknown chunk: skip, honoring RIFF word alignment
        pos += 8 + size + (size % 2)
        continue
    if samples is None:
        raise ValueError("no data chunk")
    assert rate is not None
    return rate, samples
