"""Stateful cross-batch deduplication with ``applyInPandasWithState``.

The batch uniqueness check (checks/unique.py) sees one table snapshot;
this operator deduplicates a *stream* of image rows across micro-
batches: per-key state remembers every image_id ever seen (per group),
and only first occurrences are emitted. State lives in the streaming
state store (RocksDB/HDFS-backed on a cluster), checkpointed with the
query — a restart resumes with the same seen-set.

Keying: state is sharded by ``pmod(xxhash64(image_id), n_shards)`` so
each group's state is a bounded set and hot shards spread over the
cluster — the same explicit-skew-handling stance as the salted
uniqueness check."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "image_id string, shard int"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (shard,) = key
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out: list[str] = []
    for pdf in pdfs:
        for iid in pdf["image_id"]:
            if iid not in seen:
                seen.add(iid)
                out.append(iid)
    state.update((list(seen),))
    yield pd.DataFrame({"image_id": out, "shard": [shard] * len(out)})


def stream_dedup_image_ids(
    images_stream: DataFrame, n_shards: int = 64
) -> DataFrame:
    """streaming DataFrame of first-seen image_ids (exactly-once per id
    across all micro-batches)."""
    sharded = images_stream.select(
        "image_id",
        F.pmod(F.xxhash64("image_id"), F.lit(n_shards)).cast("int").alias(
            "shard"
        ),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
