"""Deterministic stand-in image codec.

The container has no image libraries (no Pillow / opencv / libjpeg), so
the *decode* step of the payload-integrity check is STUBBED with a
deterministic fake codec, exactly as the build brief allows. Everything
around it — binary column plumbing, Arrow batch shape, PSNR math,
partitioning — is real and is what the integrity check exercises.

Payload layout (ASCII, so Spark can synthesize it as a pure Column
expression, and numpy can parse it zero-copy-ish)::

    PDVS1|{fmt}|{w}|{h}|{pixel_seed}|{noise_amp}

``decode(payload)`` regenerates an (h, w) uint8 image from
``pixel_seed`` via PCG64 and adds ±noise_amp uniform noise ("lossy"
formats get amp=1 → PSNR ≈ 48 dB ≥ 40; corrupted rows carry a wrong
pixel_seed → PSNR ≈ 8 dB). The reference image for ``image_id`` is
``decode_reference(image_id, w, h)`` seeded with ``crc32(image_id)`` —
CRC-32 because Spark's ``F.crc32`` and Python's ``zlib.crc32`` agree
bit-for-bit, so the generator (JVM) and the checker (Arrow batch in
Python) derive the same seed with no data exchange.

To swap in a real codec, replace :func:`decode` with a Pillow decode —
the check in ``checks/integrity.py`` only consumes (pixels, w, h).
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC = b"PDVS1"

# PSNR of a uniform ±1 noise field vs clean is ~48.1 dB (mse≈2/3);
# corrupting the seed yields two independent uniform images, mse≈5461,
# PSNR≈10.8 dB — cleanly on either side of the 40 dB gate.
LOSSY_NOISE_AMP = 1


def ref_seed_py(image_id: str) -> int:
    """crc32(image_id) — matches Spark's F.crc32(F.encode(image_id,'UTF-8'))."""
    return zlib.crc32(image_id.encode("utf-8")) & 0xFFFFFFFF


def render(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w) uint8 image for a pixel seed."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def decode(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """payload → (fmt, w, h, pixels). Raises ValueError on junk bytes."""
    try:
        parts = bytes(payload).split(b"|")
        if parts[0] != MAGIC or len(parts) != 6:
            raise ValueError("bad magic/layout")
        fmt = parts[1].decode()
        w, h = int(parts[2]), int(parts[3])
        seed, amp = int(parts[4]), int(parts[5])
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"undecodable payload: {e}") from e
    img = render(seed, w, h)
    if amp:
        noise_rng = np.random.Generator(np.random.PCG64(seed ^ 0x5EED))
        noisy = img.astype(np.int16) + noise_rng.integers(
            -amp, amp + 1, size=img.shape, dtype=np.int16
        )
        return fmt, w, h, np.clip(noisy, 0, 255).astype(np.uint8)
    return fmt, w, h, img


def decode_reference(image_id: str, w: int, h: int) -> np.ndarray:
    """The ground-truth pixels the stored payload is validated against."""
    return render(ref_seed_py(image_id), w, h)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def real_decode(payload: bytes):  # pragma: no cover - container has no PIL
    """Real-codec path, stubbed: the container ships no image libraries."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not available in "
            "this environment; the deterministic fake codec (decode()) is "
            "used instead"
        ) from e
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
