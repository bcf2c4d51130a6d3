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


# ------------------------------------------------- streaming image near-dup --

PHASH_FLAG_SCHEMA = (
    "image_id string, matched_id string, hamming int, blk int"
)
PHASH_STATE_SCHEMA = "ids array<string>, sigs array<long>"


def _make_phash_flag_fn(max_hamming: int):
    """Closure over the hamming band (captured by value so the pickled
    executor-side function needs no driver-side mutation)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        blk = int(key[0])
        if state.exists:
            ids, sigs = list(state.get[0]), list(state.get[1])
        else:
            ids, sigs = [], []
        seen = set(ids)
        out: list[tuple] = []
        for pdf in pdfs:
            for iid, sig in zip(pdf["image_id"], pdf["sig"]):
                if iid in seen:  # replayed micro-batch after restart
                    continue
                s = int(sig)
                for j, prev in enumerate(sigs):
                    d = bin((s ^ prev) & ((1 << 64) - 1)).count("1")
                    if d <= max_hamming:
                        out.append((iid, ids[j], d, blk))
                ids.append(iid)
                sigs.append(s)
                seen.add(iid)
        state.update((ids, sigs))
        yield pd.DataFrame(
            out, columns=["image_id", "matched_id", "hamming", "blk"]
        )

    return fn


def stream_phash_near_dup_flags(
    images_stream: DataFrame,
    max_hamming: int = 6,
    n_blocks: int | None = None,
) -> DataFrame:
    """Cross-batch NEAR-duplicate image detection on a stream: each
    arriving payload's perceptual hash (operators/multimodal.py::
    compute_phash — a stateless mapInPandas, streaming-safe) is checked
    against every previously-seen image sharing any pigeonhole block
    (the SAME bit-slices as the batch join — operators/dedup.py::
    signature_block_cols — so the exhaustiveness bound carries over:
    a pair within ``max_hamming`` shares ≥1 of the ``max_hamming+1``
    blocks and is always flagged).

    Emits (image_id, matched_id, hamming, blk) flag rows; a pair that
    shares SEVERAL blocks is flagged once per shared block — consumers
    that need distinct pairs drop duplicates on (image_id, matched_id)
    downstream (kept out of this operator: a second stateful op in the
    same query constrains output modes). State per (blk, val) bucket is
    the (id, sig) list of its members — the streaming analog of the
    batch join's bucket, sharded across the cluster by the same keys,
    with replayed micro-batches idempotent (known ids skip)."""
    from ..operators.dedup import signature_block_cols
    from ..operators.multimodal import compute_phash

    if n_blocks is None:
        n_blocks = max_hamming + 1
    sig = compute_phash(images_stream).select(
        "image_id", F.col("phash64").alias("sig")
    )
    blocked = sig.select(
        "image_id", "sig",
        F.explode(
            F.array(*signature_block_cols(F.col("sig"), n_blocks))
        ).alias("bb"),
    ).select("image_id", "sig", "bb.blk", "bb.val")
    return blocked.groupBy("blk", "val").applyInPandasWithState(
        _make_phash_flag_fn(int(max_hamming)),
        PHASH_FLAG_SCHEMA,
        PHASH_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
