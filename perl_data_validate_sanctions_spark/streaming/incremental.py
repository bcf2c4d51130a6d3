"""Incremental update / change detection — the reference's ``update_data``
merge semantics (/root/reference/lib/Data/Validate/Sanctions.pm:52-90)
re-expressed over per-source state tables:

state row: (source, updated, n_entries, content_hash, error, verified)

Merge rules (U1, Sanctions.pm:59-82), per source:
  1. fetch errored           → KEEP old content, RECORD error   (changed)
  2. fetch ok, had old error → take fetch, CLEAR error          (changed)
  3. updated ts differs OR entry count differs → REPLACE        (changed)
  4. otherwise               → keep, not changed

A source present only in the new fetch is added; a source present only
in current state is kept untouched (the reference only iterates fetched
keys). `changed` drives whether the dimension snapshot is rewritten and
the token index rebuilt (the broadcast recompute skip, U4/Redis.pm:93).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("source", "updated", "n_entries", "content_hash", "error")


def source_state(entries: DataFrame, updated_col: str | None = None) -> DataFrame:
    """Distill an entries DataFrame to per-source state rows."""
    from ..functions.hashing import canonical_row_hash, content_hash_agg

    h = canonical_row_hash(
        "names", "dob_epoch", "dob_year", "dob_text", "place_of_birth",
        "residence", "nationality", "citizen", "postal_code", "national_id",
        "passport_no",
    )
    return (
        entries.select("source", h.alias("__rh"))
        .groupBy("source")
        .agg(
            content_hash_agg("__rh").alias("content_hash"),
            F.count(F.lit(1)).alias("n_entries"),
        )
        .withColumn("updated", F.lit(0).cast("long"))
        .withColumn("error", F.lit(None).cast("string"))
        .select(*STATE_COLS)
    )


def merge_source_states(
    current: DataFrame, fetched: DataFrame, now: int | None = None
) -> DataFrame:
    """Apply U1. Input/output schema: STATE_COLS (+ verified on output),
    plus a boolean ``changed`` and a ``take_new`` marker telling the
    caller which sources' entry rows to swap in."""
    now = int(now if now is not None else time.time())
    c = current.select(
        *[F.col(x).alias(f"cur_{x}") for x in STATE_COLS]
    )
    f_ = fetched.select(
        *[F.col(x).alias(f"new_{x}") for x in STATE_COLS]
    )
    j = c.join(
        f_, c["cur_source"] == f_["new_source"], "full_outer"
    )

    in_new = F.col("new_source").isNotNull()
    in_cur = F.col("cur_source").isNotNull()
    fetch_err = in_new & F.col("new_error").isNotNull()
    err_cleared = in_new & ~fetch_err & in_cur & F.col("cur_error").isNotNull()
    data_differs = in_new & ~fetch_err & (
        ~in_cur
        | (F.coalesce(F.col("cur_updated"), F.lit(0))
           != F.coalesce(F.col("new_updated"), F.lit(0)))
        | (F.coalesce(F.col("cur_n_entries"), F.lit(0))
           != F.coalesce(F.col("new_n_entries"), F.lit(0)))
    )
    take_new = in_new & ~fetch_err & (data_differs | err_cleared | ~in_cur)
    changed = fetch_err | err_cleared | data_differs

    pick = lambda x: F.when(take_new, F.col(f"new_{x}")).otherwise(  # noqa: E731
        F.col(f"cur_{x}")
    )
    return j.select(
        F.coalesce(F.col("new_source"), F.col("cur_source")).alias("source"),
        F.coalesce(pick("updated"), F.lit(0)).alias("updated"),
        F.coalesce(pick("n_entries"), F.lit(0)).alias("n_entries"),
        pick("content_hash").alias("content_hash"),
        # error recorded on fetch failure, cleared by a later success
        F.when(fetch_err, F.col("new_error")).alias("error"),
        F.lit(now).cast("long").alias("verified"),
        changed.alias("changed"),
        take_new.alias("take_new"),
    )


def last_updated(state: DataFrame) -> int | None:
    """max(updated) across sources (Sanctions.pm:92-102)."""
    row = state.agg(F.max("updated").alias("m")).collect()[0]
    return row["m"]
