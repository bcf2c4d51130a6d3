"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed via ``mapInPandas`` over Arrow
batches.

The Spark-side plumbing (schemas, batch iteration, partitioning, output
contracts) is real and tested. Decode is format-sniffed per row, same
as checks/integrity.py: PNG and baseline-JPEG payloads decode FOR REAL
through the stdlib codecs (sources/png.py, sources/jpeg.py — per-row,
as any real bitstream demands, inside the Arrow worker); synthetic
PDVS1 payloads use the deterministic stub codec (sources/codec.py)
whose batch renderer keeps per-row Python to the header parse. Other
formats (webp) still document the one line to swap for a Pillow-backed
decoder (``codec.real_decode``)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import codec

FEATURE_SCHEMA = (
    "image_id string, fmt string, w int, h int, mean_luma double, "
    "std_luma double, edge_energy double"
)


def _parse_headers(pdf: pd.DataFrame):
    """Per-row header parse (µs each) → groups keyed by (w, h, amp) of
    (row_idx, seed) pairs for synthetic PDVS1 payloads, plus a list of
    (row_idx, fmt, blob) for REAL-format rows (PNG signature / JPEG SOI
    / RIFF-WEBP
    — same sniff as checks/integrity.py), which decode per-row through
    the stdlib codecs. Undecodable rows are silently skipped (the
    feature extractor's contract — the integrity check is where bad
    payloads get FLAGGED)."""
    from ..sources import jpeg as _jpeg
    from ..sources import png as _png
    from ..sources import webp as _webp

    groups: dict[tuple[int, int, int], list[tuple[int, int]]] = {}
    real: list[tuple[int, str, bytes]] = []
    fmts: list[str | None] = []
    for i, blob in enumerate(pdf["bytes"]):
        fmts.append(None)
        if blob is None:
            continue
        head = bytes(blob[:12])
        if head[:8] == _png.PNG_MAGIC:
            fmts[-1] = "png"
            real.append((i, "png", bytes(blob)))
            continue
        if head[:3] == _jpeg.JPEG_MAGIC:
            fmts[-1] = "jpeg"
            real.append((i, "jpeg", bytes(blob)))
            continue
        if head[:4] == _webp.WEBP_RIFF and head[8:12] == _webp.WEBP_FOURCC:
            fmts[-1] = "webp"
            real.append((i, "webp", bytes(blob)))
            continue
        try:
            p = bytes(blob).split(b"|")
            if p[0] != codec.MAGIC or len(p) != 6:
                continue
            fmts[-1] = p[1].decode()
            w, h, seed, amp = int(p[2]), int(p[3]), int(p[4]), int(p[5])
        except Exception:  # noqa: BLE001 - skip undecodable rows
            fmts[-1] = None
            continue
        groups.setdefault((w, h, amp), []).append((i, seed))
    return groups, fmts, real


def _decode_real(fmt: str, blob: bytes) -> np.ndarray | None:
    """(h, w) uint8 pixels of a real-format payload, or None if the
    stream is broken / out of profile (skip — integrity flags it)."""
    from ..sources import jpeg as _jpeg
    from ..sources import png as _png
    from ..sources import webp as _webp

    try:
        if fmt == "png":
            _, _, px = _png.decode_png_gray(blob)
        elif fmt == "webp":
            _, _, px = _webp.decode_webp_gray(blob)
        else:
            _, _, px = _jpeg.decode_jpeg_gray(blob)
        return px
    except ValueError:
        return None


def extract_image_features(df: DataFrame) -> DataFrame:
    """Per-image features (mean/std luminance, gradient energy) from the
    decoded pixels. One Arrow hop; emits only the feature row, never the
    pixels. Rows group by (w, h, amp) and each group's pixels render as
    ONE (rows, h, w) numpy block via the counter-based codec — per-row
    Python is only the header parse. Swap codec.render_batch for a real
    decoder to productionize (the decode step is then per-row again,
    but the feature math stays batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["image_id"].to_numpy(dtype=object)
            groups, fmts, real = _parse_headers(pdf)
            out = []
            # real-format rows: per-row stdlib decode (inherent to a
            # real codec), the same vectorized feature math per image
            for i, fmt, blob in real:
                px = _decode_real(fmt, blob)
                if px is None:
                    continue
                h, w = px.shape
                gx = (
                    float(np.abs(np.diff(px.astype(np.int16), axis=1)).mean())
                    if w > 1 else 0.0
                )
                gy = (
                    float(np.abs(np.diff(px.astype(np.int16), axis=0)).mean())
                    if h > 1 else 0.0
                )
                out.append(
                    (ids[i], fmt, w, h, float(px.mean()), float(px.std()),
                     gx + gy)
                )
            for (w, h, amp), members in groups.items():
                idxs = np.array([m[0] for m in members], dtype=np.int64)
                seeds = np.array([m[1] for m in members], dtype=np.uint64)
                # chunk rows to the codec's pixel budget
                rows_per_chunk = max(1, 4_000_000 // (w * h))
                for lo in range(0, len(idxs), rows_per_chunk):
                    sub = slice(lo, lo + rows_per_chunk)
                    px = codec.render_batch(seeds[sub], w * h, slot="mm_px")
                    d16 = codec._pool_buf(
                        "mm_d16", px.size, np.int16
                    ).reshape(px.shape)
                    d16[...] = px
                    if amp:
                        d16 += codec.noise_batch(
                            seeds[sub], w * h, amp, slot="mm_noise"
                        )
                        np.clip(d16, 0, 255, out=d16)
                    block = d16.reshape(-1, h, w)
                    mean = block.mean(axis=(1, 2))
                    std = block.std(axis=(1, 2))
                    gx = (
                        np.abs(np.diff(block, axis=2)).mean(axis=(1, 2))
                        if w > 1 else np.zeros(len(mean))
                    )
                    gy = (
                        np.abs(np.diff(block, axis=1)).mean(axis=(1, 2))
                        if h > 1 else np.zeros(len(mean))
                    )
                    for j, i in enumerate(idxs[sub]):
                        out.append(
                            (ids[i], fmts[i], w, h, float(mean[j]),
                             float(std[j]), float(gx[j] + gy[j]))
                        )
            yield pd.DataFrame(
                out,
                columns=["image_id", "fmt", "w", "h", "mean_luma", "std_luma",
                         "edge_energy"],
            )

    return df.select("image_id", "bytes").mapInPandas(run, FEATURE_SCHEMA)


def _decoded_blocks(pdf: pd.DataFrame, slot_prefix: str = "mmblk"):
    """Batched decode shared by resize/frame-sample: rows group by
    (w, h, amp) and each group's pixels render as ONE (rows, h, w) uint8
    numpy block (chunked to the codec's pixel budget) — identical values
    to per-row ``codec.decode``, with per-row Python reduced to the
    header parse. Yields (row_indices, w, h, block); the block ALIASES
    pooled scratch buffers, valid only until the next yield. REAL-format
    rows (PNG/JPEG) decode per-row through the stdlib codecs — inherent
    to a real bitstream — and yield single-row blocks; everything
    downstream stays batched."""
    groups, _, real = _parse_headers(pdf)
    for i, fmt, blob in real:
        px = _decode_real(fmt, blob)
        if px is None:
            continue
        h, w = px.shape
        yield np.array([i], dtype=np.int64), w, h, px.reshape(1, h, w)
    for (w, h, amp), members in groups.items():
        idxs = np.array([m[0] for m in members], dtype=np.int64)
        seeds = np.array([m[1] for m in members], dtype=np.uint64)
        rows_per_chunk = max(1, 4_000_000 // (w * h))
        for lo in range(0, len(idxs), rows_per_chunk):
            sub = slice(lo, lo + rows_per_chunk)
            px = codec.render_batch(
                seeds[sub], w * h, slot=f"{slot_prefix}_px"
            )
            if amp:
                d16 = codec._pool_buf(
                    f"{slot_prefix}_d16", px.size, np.int16
                ).reshape(px.shape)
                d16[...] = px
                d16 += codec.noise_batch(
                    seeds[sub], w * h, amp, slot=f"{slot_prefix}_noise"
                )
                np.clip(d16, 0, 255, out=d16)
                u8 = codec._pool_buf(
                    f"{slot_prefix}_u8", d16.size, np.uint8
                ).reshape(d16.shape)
                u8[...] = d16
                px = u8
            yield idxs[sub], w, h, px.reshape(-1, h, w)


RESIZE_SCHEMA = "image_id string, w int, h int, thumb binary"


def resize_images(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Nearest-neighbor thumbnail of the decoded pixels, re-encoded as a
    raw binary column. Decode is batched per (w, h, amp) group via
    :func:`_decoded_blocks` (no per-row Python beyond the header parse);
    the whole group's thumbnails come from ONE fancy-index gather."""
    tw, th = int(target_w), int(target_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["image_id"].to_numpy(dtype=object)
            out = []
            for idxs, w, h, block in _decoded_blocks(pdf, "mm_rs"):
                ys = (np.arange(th) * h // th).clip(0, h - 1)
                xs = (np.arange(tw) * w // tw).clip(0, w - 1)
                # one gather resizes every row of the group: (n, th, tw)
                thumbs = block[:, ys[:, None], xs[None, :]]
                for j, i in enumerate(idxs):
                    out.append((ids[i], tw, th, thumbs[j].tobytes()))
            yield pd.DataFrame(out, columns=["image_id", "w", "h", "thumb"])

    return df.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "image_id string, frame_idx int, frame_mean double"


def sample_frames(df: DataFrame, every_n: int = 4, n_frames: int = 16) -> DataFrame:
    """Frame sampling for video-like payloads. REAL AVI/MJPEG clips
    (sources/avi.py — RIFF walk + per-frame T.81 decode) emit every
    ``every_n``-th of their first ``n_frames`` ACTUAL frames' summary.
    Image payloads keep the band stand-in: the image as a stack of
    ``n_frames`` horizontal bands, every ``every_n``-th band's summary.
    Output fans out rows (one per sampled frame), exercising the 1→N
    mapInPandas contract. Image decode is batched per (w, h, amp)
    group; each sampled band's means compute for the WHOLE group in
    one reduction. Undecodable clips skip (a validation check is where
    they get flagged)."""
    from ..sources import avi as _avi

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["image_id"].to_numpy(dtype=object)
            out = []
            # real video clips: per-frame JPEG decode inside the worker
            for i, blob in enumerate(pdf["bytes"]):
                if blob is None:
                    continue
                head = bytes(blob[:12])
                if head[:4] != _avi.AVI_MAGIC or head[8:12] != b"AVI ":
                    continue
                try:
                    _, frames = _avi.decode_avi_mjpeg(bytes(blob))
                except ValueError:
                    continue
                for fi in range(0, min(n_frames, len(frames)), every_n):
                    out.append((ids[i], fi, float(frames[fi].mean())))
            for idxs, w, h, block in _decoded_blocks(pdf, "mm_fs"):
                # same band boundaries as np.array_split(px, k, axis=0)
                # on a single (h, w) image, applied group-wide on axis=1
                bands = np.array_split(block, min(n_frames, h), axis=1)
                for bi in range(0, len(bands), every_n):
                    means = bands[bi].mean(axis=(1, 2))
                    for j, i in enumerate(idxs):
                        out.append((ids[i], bi, float(means[j])))
            yield pd.DataFrame(
                out, columns=["image_id", "frame_idx", "frame_mean"]
            )

    return df.select("image_id", "bytes").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "audio_id string, rate int, n_samples long, duration_s double, "
    "rms double, peak int, zero_cross_rate double"
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Per-clip audio features from REAL RIFF/WAVE PCM16 payloads
    (sources/wav.py — stdlib decode, zero-copy frombuffer): RMS level,
    peak amplitude, zero-crossing rate, duration. One Arrow hop; emits
    only the feature row, never the samples. Undecodable or
    out-of-profile payloads skip (the extractor's contract, same as the
    image path — a validation check is where bad payloads get FLAGGED).

    Expects columns (audio_id, bytes). The decode is a header walk plus
    one frombuffer, and the feature math is vectorized numpy — nothing
    per-sample in Python, so at 100 TB the cost is the scan itself."""
    from ..sources import wav as _wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, blob in zip(pdf["audio_id"], pdf["bytes"]):
                if blob is None:
                    continue
                try:
                    rate, s = _wav.decode_wav_pcm16(bytes(blob))
                except ValueError:
                    continue
                x = s.astype(np.float64)
                n = int(s.size)
                signs = np.signbit(s)
                zc = int(np.count_nonzero(signs[1:] != signs[:-1]))
                out.append((
                    aid, rate, n, n / rate,
                    float(np.sqrt(np.mean(x * x))) if n else 0.0,
                    int(np.max(np.abs(x))) if n else 0,
                    zc / (n - 1) if n > 1 else 0.0,
                ))
            yield pd.DataFrame(
                out,
                columns=["audio_id", "rate", "n_samples", "duration_s",
                         "rms", "peak", "zero_cross_rate"],
            )

    return df.select("audio_id", "bytes").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


# --------------------------------------------------------- perceptual hash --

PHASH_SIZE = 32       # resize target before the DCT
PHASH_BLOCK = 8       # low-frequency block kept (8×8 → 64 bits)
PHASH_SCHEMA = "image_id string, phash64 long"


def _dct_basis(t: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix B (t×t): coefs = B @ x @ B.T."""
    k = np.arange(t).reshape(t, 1)
    i = np.arange(t).reshape(1, t)
    b = np.cos(np.pi * (2 * i + 1) * k / (2 * t))
    b[0] *= np.sqrt(1.0 / t)
    b[1:] *= np.sqrt(2.0 / t)
    return b


_PHASH_BASIS = _dct_basis(PHASH_SIZE)


def _area_resize_block(block: np.ndarray, t: int = PHASH_SIZE) -> np.ndarray:
    """(n, h, w) → (n, t, t) float64 by integer-edge area mean per axis
    (the buckets differ in size by ≤1 pixel); an axis SMALLER than t
    upsamples by nearest-index instead (edges would repeat). Fully
    vectorized across the n images of a decoded group block.

    Round 7: the first-axis reduce runs directly on the uint8 block
    with an int64 accumulator (uint8 sums are exact in BOTH int64 and
    float64, so the result is bit-identical to the old
    whole-block-astype form) and every multi-MB intermediate comes from
    the codec's per-worker scratch pool — the old fresh ``astype`` +
    ``reduceat`` allocations were the top two symbols of the phash
    worker profile (412 of 558 core-s, dominated by first-touch page
    faults on cold workers). The returned array ALIASES a pool slot,
    valid until the next call."""
    n, h, w = block.shape
    if not np.issubdtype(block.dtype, np.integer):  # pragma: no cover
        # exact-int accumulation only holds for integer pixels; any
        # float caller keeps the reference float64 pipeline
        block = block.astype(np.float64)
    x1 = codec._pool_buf("ph_rs_f1", n * t * w, np.float64).reshape(n, t, w)
    if h >= t:
        edges = (np.arange(t + 1) * h) // t
        acc_t = (np.int64 if np.issubdtype(block.dtype, np.integer)
                 else np.float64)
        sums = codec._pool_buf("ph_rs_acc", n * t * w, acc_t).reshape(
            n, t, w
        )
        np.add.reduceat(block, edges[:-1], axis=1, dtype=acc_t, out=sums)
        counts = np.diff(edges).astype(np.float64).reshape(1, t, 1)
        np.divide(sums, counts, out=x1)
    else:
        idx = (np.arange(t) * h) // t
        x1[...] = block[:, idx, :]
    if w >= t:
        edges = (np.arange(t + 1) * w) // t
        sums2 = codec._pool_buf("ph_rs_f2", n * t * t, np.float64).reshape(
            n, t, t
        )
        np.add.reduceat(x1, edges[:-1], axis=2, out=sums2)
        counts2 = np.diff(edges).astype(np.float64).reshape(1, 1, t)
        out = codec._pool_buf("ph_rs_out", n * t * t, np.float64).reshape(
            n, t, t
        )
        np.divide(sums2, counts2, out=out)
        return out
    idx = (np.arange(t) * w) // t
    out = codec._pool_buf("ph_rs_out", n * t * t, np.float64).reshape(n, t, t)
    out[...] = x1[:, :, idx]
    return out


def phash_block(block: np.ndarray) -> np.ndarray:
    """64-bit perceptual hashes for a (n, h, w) uint8 pixel block.

    The classic DCT pHash, with every choice pinned so two
    implementations agree bit-for-bit: area-mean resize to 32×32
    (nearest-index when upsampling), orthonormal 2-D DCT-II, keep the
    top-left 8×8 low-frequency coefficients row-major, threshold EVERY
    one of the 64 (DC included) against the median of the 63 non-DC
    coefficients, bit k = coefficient k > median, bit 0 the LSB.
    Returned as int64 (the Spark LongType two's-complement view of the
    uint64 bit pattern)."""
    x = _area_resize_block(block)
    coefs = np.einsum("ki,nij,lj->nkl", _PHASH_BASIS, x, _PHASH_BASIS,
                      optimize=True)
    c = coefs[:, :PHASH_BLOCK, :PHASH_BLOCK].reshape(len(block), -1)
    med = np.median(c[:, 1:], axis=1)
    bits = (c > med[:, None]).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return (bits * weights).sum(axis=1, dtype=np.uint64).view(np.int64)


def compute_phash(df: DataFrame) -> DataFrame:
    """(image_id, phash64) for every decodable payload — same batched
    decode as the other multimodal ops (``_decoded_blocks``: synthetic
    groups render as one numpy block, real PNG/JPEG/WebP rows decode
    per-row through the bundled codecs), then the DCT hash vectorizes
    across each block. Undecodable rows are skipped (the integrity
    check is where they get flagged). ReadSchema prunes to
    image_id+bytes like the feature extractor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["image_id"].to_numpy(dtype=object)
            out_ids: list = []
            out_hash: list = []
            for idxs, _w, _h, block in _decoded_blocks(pdf, "ph"):
                hashes = phash_block(block)
                out_ids.extend(ids[i] for i in idxs)
                out_hash.extend(int(v) for v in hashes)
            yield pd.DataFrame({"image_id": out_ids, "phash64": out_hash})

    return df.select("image_id", "bytes").mapInPandas(run, PHASH_SCHEMA)


def phash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    n_blocks: int | None = None,
    s: int = 2,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual hash: ``compute_phash``
    over the payloads, then the SAME pigeonhole-blocked hamming join as
    text SimHash (operators/dedup.py::hamming_near_dup_pairs — still
    exhaustive, candidates carry only (id, id)). Defaults to the s=2
    combination blocking (16-bit bucket keys for h=6): the s=1 keys are
    only ~9 bits wide, which goes quadratic beyond ~10k images — see
    the scale rule in hamming_near_dup_pairs. Returns
    (id_a, id_b, hamming), id_a < id_b."""
    from .dedup import hamming_near_dup_pairs

    sig = compute_phash(df).select(
        F.col("image_id").alias("id"), F.col("phash64").alias("sig")
    )
    # Round 7: the restructured hamming join consumes the signature
    # table ONCE (the signature rides the block explode; both self-join
    # sides are the same exchange, which AQE reuses — no per-candidate
    # join-backs), so the round-6 eager localCheckpoint that shielded
    # the Python decode+DCT stage from repeated passes became a pure
    # extra materialization: dropping it took the 150k-image run from
    # ~8.7 s (ckpt 2.7 + join 6.0) to ~4.8 s end-to-end (was 134 s in
    # round 5 under s=1's 9-bit keys, 19 s in round 6), recall
    # identical (299 planted pairs found).
    return hamming_near_dup_pairs(sig, max_hamming=max_hamming,
                                  n_blocks=n_blocks, n_bits=64, s=s)
