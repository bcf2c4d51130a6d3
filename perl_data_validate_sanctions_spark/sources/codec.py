"""Deterministic stand-in image codec.

The container has no image libraries (no Pillow / opencv / libjpeg), so
the *decode* step of the payload-integrity check is STUBBED with a
deterministic fake codec, exactly as the build brief allows. Everything
around it — binary column plumbing, Arrow batch shape, PSNR math,
partitioning — is real and is what the integrity check exercises.

Payload layout (ASCII, so Spark can synthesize it as a pure Column
expression, and numpy can parse it zero-copy-ish)::

    PDVS1|{fmt}|{w}|{h}|{pixel_seed}|{noise_amp}

Pixels are a pure function of ``(pixel_seed, pixel_index)`` via a
**counter-based** generator (splitmix64 finalizer, 8 pixels per 64-bit
hash word). Counter-based beats a sequential PRNG here for two reasons
that matter at 10^12 rows:

- **batch vectorization** — one numpy broadcast renders a whole Arrow
  batch of images as an ``(n_rows, n_pixels)`` matrix (no per-row
  Python), which is what lets ``checks/integrity.py`` validate payloads
  at memory bandwidth instead of interpreter speed;
- **random access** — any pixel subset can be rendered in O(sample)
  without generating the prefix, enabling the integrity check's
  pixel-subsample fast path.

"Lossy" formats add ±noise_amp uniform noise from an independent
counter stream (amp=1 → PSNR ≈ 48 dB ≥ 40); corrupted rows carry a
wrong pixel_seed → two independent uniform images, PSNR ≈ 10.8 dB —
cleanly on either side of the 40 dB gate. A mid-band amp
(``MIDBAND_NOISE_AMP``) lands PSNR in (30, 40) dB to prove the gate
discriminates, not just separates extremes.

The reference image for ``image_id`` is ``decode_reference(image_id,
w, h)`` seeded with ``crc32(image_id)`` — CRC-32 because Spark's
``F.crc32`` and Python's ``zlib.crc32`` agree bit-for-bit, so the
generator (JVM) and the checker (Arrow batch in Python) derive the
same seed with no data exchange.

To swap in a real codec, replace :func:`decode` with a Pillow decode —
the check in ``checks/integrity.py`` only consumes (pixels, w, h).
"""

from __future__ import annotations

import sys
import zlib

import numpy as np

MAGIC = b"PDVS1"

# PSNR of a uniform ±1 noise field vs clean is ~48.1 dB (mse≈2/3);
# corrupting the seed yields two independent uniform images, mse≈5461,
# PSNR≈10.8 dB — cleanly on either side of the 40 dB gate.
LOSSY_NOISE_AMP = 1

# ±9 uniform noise → mse ≈ (2/19)·Σ_{1..9} k² = 30 → PSNR ≈ 33.4 dB:
# inside (30, 40), i.e. a lossy payload the 40 dB gate must REJECT even
# though it decodes fine — proves the threshold discriminates.
MIDBAND_NOISE_AMP = 9

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX_C1 = _U64(0xBF58476D1CE4E5B9)
_MIX_C2 = _U64(0x94D049BB133111EB)
_NOISE_SALT = _U64(0x5EED5EED5EED5EED)
_BIG_ENDIAN = sys.byteorder != "little"


def _mix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = (z + _GOLDEN).astype(_U64, copy=False)
    z = (z ^ (z >> _U64(30))) * _MIX_C1
    z = (z ^ (z >> _U64(27))) * _MIX_C2
    return z ^ (z >> _U64(31))


# Pooled scratch buffers, keyed by slot name, grown on demand. Fresh
# multi-MB allocations fault in pages (and fight khugepaged) on every
# call — measured 4× slower than steady-state on this class of VM — so
# the batch renderers reuse flat buffers per worker process. Arrays
# returned by the pooled paths ALIAS these buffers: each slot's content
# is only valid until the next call using the same slot.
_POOL: dict[str, np.ndarray] = {}


def _pool_buf(slot: str, n: int, dtype=np.uint64) -> np.ndarray:
    buf = _POOL.get(slot)
    if buf is None or buf.dtype != dtype or buf.size < n:
        buf = np.empty(max(n, 1 << 16), dtype)
        _POOL[slot] = buf
    return buf[:n]


def _mix64_into(z: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """In-place splitmix64 finalizer using a same-shape scratch array."""
    np.add(z, _GOLDEN, out=z)
    np.right_shift(z, _U64(30), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    np.multiply(z, _MIX_C1, out=z)
    np.right_shift(z, _U64(27), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    np.multiply(z, _MIX_C2, out=z)
    np.right_shift(z, _U64(31), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    return z


def _hash_words(keys: np.ndarray, ctr: np.ndarray, slot: str) -> np.ndarray:
    """(n_rows,) keys × (n_words,) counters → pooled (n_rows, n_words)
    mixed hash matrix (aliases the slot buffer)."""
    n_rows, n_words = len(keys), len(ctr)
    z = _pool_buf(slot, n_rows * n_words).reshape(n_rows, n_words)
    tmp = _pool_buf("__mix_tmp", n_rows * n_words).reshape(n_rows, n_words)
    np.bitwise_xor(keys[:, None], ctr[None, :], out=z)
    return _mix64_into(z, tmp)


def ref_seed_py(image_id: str) -> int:
    """crc32(image_id) — matches Spark's F.crc32(F.encode(image_id,'UTF-8'))."""
    return zlib.crc32(image_id.encode("utf-8")) & 0xFFFFFFFF


def _words_to_bytes(words: np.ndarray, n_pixels: int) -> np.ndarray:
    """(..., n_words) uint64 → (..., n_pixels) uint8 (little-endian lanes)."""
    if _BIG_ENDIAN:  # pragma: no cover - x86/arm linux is little-endian
        words = words.byteswap()
    return np.ascontiguousarray(words).view(np.uint8)[..., :n_pixels]


def render_batch(
    seeds: np.ndarray, n_pixels: int, slot: str | None = None
) -> np.ndarray:
    """(n_rows,) seeds → (n_rows, n_pixels) uint8 pixel matrix.

    One broadcasted hash per 8 pixels; no per-row Python. With ``slot``
    the result aliases a pooled scratch buffer (valid until the slot's
    next use) — the zero-alloc hot path for the integrity check."""
    n_words = (n_pixels + 7) // 8
    keys = _mix64(np.asarray(seeds, dtype=_U64))
    ctr = np.arange(1, n_words + 1, dtype=_U64) * _GOLDEN
    if slot is None:
        words = _mix64(keys[:, None] ^ ctr[None, :])
    else:
        words = _hash_words(keys, ctr, slot)
    return _words_to_bytes(words, n_pixels)


def render_batch_at(seeds: np.ndarray, pixel_idx: np.ndarray) -> np.ndarray:
    """(n_rows,) seeds × (m,) pixel indices → (n_rows, m) uint8.

    Random access: pixel j is byte (j mod 8) of hash word (j div 8) —
    identical values to the corresponding columns of render_batch."""
    keys = _mix64(np.asarray(seeds, dtype=_U64))
    idx = np.asarray(pixel_idx, dtype=_U64)
    ctr = (idx // _U64(8) + _U64(1)) * _GOLDEN
    shift = (idx % _U64(8)) * _U64(8)
    words = _mix64(keys[:, None] ^ ctr[None, :])
    return ((words >> shift[None, :]) & _U64(0xFF)).astype(np.uint8)


def render_batch_runs(
    seeds: np.ndarray, word_idx: np.ndarray, slot: str | None = None
) -> np.ndarray:
    """(n_rows,) seeds × (r,) word indices → (n_rows, r·8) uint8: the
    pixels of the selected ALIGNED 8-pixel runs (word w covers pixels
    [8w, 8w+8)), bit-identical to the corresponding columns of
    render_batch. One hash per 8 sampled pixels — render_batch_at costs
    one hash per single pixel, 8× the compute and traffic; stratified
    run sampling is the bandwidth-sane estimator."""
    keys = _mix64(np.asarray(seeds, dtype=_U64))
    ctr = (np.asarray(word_idx, dtype=_U64) + _U64(1)) * _GOLDEN
    if slot is None:
        words = _mix64(keys[:, None] ^ ctr[None, :])
    else:
        words = _hash_words(keys, ctr, slot)
    return _words_to_bytes(words, words.shape[-1] * 8)


def noise_batch_runs(
    seeds: np.ndarray, word_idx: np.ndarray, amp: int, slot: str | None = None
) -> np.ndarray:
    """Aligned-run variant of noise_batch (same values per position)."""
    keys = _noise_words(seeds)
    ctr = (np.asarray(word_idx, dtype=_U64) + _U64(1)) * _GOLDEN
    if slot is None:
        words = _mix64(keys[:, None] ^ ctr[None, :])
    else:
        words = _hash_words(keys, ctr, slot)
    b = _words_to_bytes(words, words.shape[-1] * 8)
    span = 2 * amp + 1
    if slot is None:
        return (b % np.uint8(span)).astype(np.int16) - np.int16(amp)
    out = _pool_buf(slot + "_i16", b.size, np.int16).reshape(b.shape)
    np.mod(b, np.uint8(span), out=b)
    np.subtract(b, np.uint8(amp), out=out, dtype=np.int16, casting="unsafe")
    return out


def _noise_words(seeds: np.ndarray) -> np.ndarray:
    return _mix64(np.asarray(seeds, dtype=_U64) ^ _NOISE_SALT)


def noise_batch(
    seeds: np.ndarray, n_pixels: int, amp: int, slot: str | None = None
) -> np.ndarray:
    """(n_rows, n_pixels) int16 uniform noise in [-amp, amp]."""
    n_words = (n_pixels + 7) // 8
    keys = _noise_words(seeds)
    ctr = np.arange(1, n_words + 1, dtype=_U64) * _GOLDEN
    if slot is None:
        words = _mix64(keys[:, None] ^ ctr[None, :])
    else:
        words = _hash_words(keys, ctr, slot)
    b = _words_to_bytes(words, n_pixels)
    span = 2 * amp + 1
    if slot is None:
        return (b % np.uint8(span)).astype(np.int16) - np.int16(amp)
    out = _pool_buf(slot + "_i16", b.size, np.int16).reshape(b.shape)
    np.mod(b, np.uint8(span), out=b)
    np.subtract(b, np.uint8(amp), out=out, dtype=np.int16, casting="unsafe")
    return out


def noise_batch_at(
    seeds: np.ndarray, pixel_idx: np.ndarray, amp: int
) -> np.ndarray:
    """Sampled-index variant of noise_batch (same values per index)."""
    keys = _noise_words(seeds)
    idx = np.asarray(pixel_idx, dtype=_U64)
    ctr = (idx // _U64(8) + _U64(1)) * _GOLDEN
    shift = (idx % _U64(8)) * _U64(8)
    words = _mix64(keys[:, None] ^ ctr[None, :])
    b = ((words >> shift[None, :]) & _U64(0xFF)).astype(np.uint8)
    span = 2 * amp + 1
    return (b % np.uint8(span)).astype(np.int16) - np.int16(amp)


def render(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w) uint8 image for a pixel seed."""
    return render_batch(np.array([seed], dtype=np.uint64), w * h)[0].reshape(h, w)


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
        noisy = img.astype(np.int16) + noise_batch(
            np.array([seed], dtype=np.uint64), w * h, amp
        )[0].reshape(h, w)
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
    return psnr_from_mse(float(mse))


def psnr_from_mse(mse: float) -> float:
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def real_decode(payload: bytes) -> np.ndarray:
    """Real-codec path.

    PNG payloads decode END-TO-END with the stdlib-only decoder
    (sources/png.py: zlib inflate + RFC 2083 unfiltering), baseline
    grayscale JPEG with the stdlib+numpy ITU-T T.81 decoder
    (sources/jpeg.py), and WebP-lossless with the from-scratch VP8L
    decoder (sources/webp.py: prefix codes, LZ77, color cache, all
    four inverse transforms — conformance cross-checked against the
    system libwebp in tests) — no Pillow needed for any of them.
    Lossy VP8 / extended VP8X WebP dispatches to the SYSTEM libwebp
    via ctypes (sources/webp_sys.py) when that library is loadable.
    Remaining formats (gif, …; and lossy webp on a libwebp-free
    machine) require Pillow, which this container does not ship, and
    raise ``NotImplementedError`` / ``ValueError``.
    ``checks/integrity.py`` sniffs the signatures itself and validates
    decoded pixels against the reference image, so the integrity
    check's real-decode mode is live for PNG, JPEG and all WebP
    flavors today."""
    from . import jpeg as _jpeg
    from . import png as _png
    from . import webp as _webp

    blob = bytes(payload)
    if blob[:8] == _png.PNG_MAGIC:
        _, _, pixels = _png.decode_png_gray(blob)
        return pixels
    if blob[:3] == _jpeg.JPEG_MAGIC:
        _, _, pixels = _jpeg.decode_jpeg_gray(blob)
        return pixels
    if blob[:4] == _webp.WEBP_RIFF and blob[8:12] == _webp.WEBP_FOURCC:
        # VP8L decodes for real (from scratch); lossy VP8/VP8X via the
        # system libwebp when loadable, else ValueError inside
        _, _, pixels = _webp.decode_webp_gray(blob)
        return pixels
    try:  # pragma: no cover - container has no PIL
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "non-PNG/JPEG/WebP real decode requires Pillow, which is "
            "not available in this environment; PNG, baseline JPEG and "
            "WebP-lossless payloads decode via the from-scratch codecs "
            "(sources/png.py, sources/jpeg.py, sources/webp.py), lossy "
            "WebP via the system libwebp (sources/webp_sys.py) when "
            "loadable, and the deterministic fake codec (decode()) "
            "covers the synthetic PDVS1 format"
        ) from e
    import io  # pragma: no cover

    from PIL import Image  # pragma: no cover

    return np.asarray(  # pragma: no cover
        Image.open(io.BytesIO(blob)).convert("L")
    )
