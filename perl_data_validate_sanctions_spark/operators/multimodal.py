"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed via ``mapInPandas`` over Arrow
batches.

The Spark-side plumbing (schemas, batch iteration, partitioning, output
contracts) is real and tested; the codec innards use the deterministic
stub codec (sources/codec.py) because the container ships no image/audio
libraries — each function documents the one line to swap for a real
decoder (``codec.real_decode`` raises NotImplementedError explaining
this)."""

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


def extract_image_features(df: DataFrame) -> DataFrame:
    """Per-image features (mean/std luminance, gradient energy) from the
    decoded pixels. One Arrow hop; emits only the feature row, never the
    pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    fmt, w, h, px = codec.decode(blob)
                except ValueError:
                    continue
                fpx = px.astype(np.float64)
                gx = np.abs(np.diff(fpx, axis=1)).mean() if w > 1 else 0.0
                gy = np.abs(np.diff(fpx, axis=0)).mean() if h > 1 else 0.0
                out.append(
                    (iid, fmt, w, h, float(fpx.mean()), float(fpx.std()),
                     float(gx + gy))
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "fmt", "w", "h", "mean_luma", "std_luma",
                         "edge_energy"],
            )

    return df.select("image_id", "bytes").mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "image_id string, w int, h int, thumb binary"


def resize_images(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Nearest-neighbor thumbnail of the decoded pixels, re-encoded as a
    raw binary column. Swap the decode line for a real codec to
    productionize; the resampling + binary round-trip is real."""
    tw, th = int(target_w), int(target_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    _, w, h, px = codec.decode(blob)
                except ValueError:
                    continue
                ys = (np.arange(th) * h // th).clip(0, h - 1)
                xs = (np.arange(tw) * w // tw).clip(0, w - 1)
                thumb = px[np.ix_(ys, xs)]
                out.append((iid, tw, th, thumb.tobytes()))
            yield pd.DataFrame(out, columns=["image_id", "w", "h", "thumb"])

    return df.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "image_id string, frame_idx int, frame_mean double"


def sample_frames(df: DataFrame, every_n: int = 4, n_frames: int = 16) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: treats the image
    as a stack of ``n_frames`` horizontal bands (a stand-in for decoded
    video frames — no video codec in the container) and emits every
    ``every_n``-th band's summary. Output fans out rows (one per
    sampled frame), exercising the 1→N mapInPandas contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, blob in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    _, w, h, px = codec.decode(blob)
                except ValueError:
                    continue
                bands = np.array_split(px, min(n_frames, h), axis=0)
                for i in range(0, len(bands), every_n):
                    out.append((iid, i, float(bands[i].mean())))
            yield pd.DataFrame(
                out, columns=["image_id", "frame_idx", "frame_mean"]
            )

    return df.select("image_id", "bytes").mapInPandas(run, FRAME_SAMPLE_SCHEMA)
