"""Uniqueness check with explicit skew defusal (BASELINE.json north_rule:
"uniqueness on image_id and phash via salted repartition + groupBy to
defuse skew").

Two-phase salted aggregation:

  phase 1: groupBy(key, salt) partial counts — a planted hot key
           (billions of identical phash values at 10^12 rows) is spread
           over ``n_salts`` reducers instead of melting one;
  phase 2: groupBy(key) sum of partials — input is ≤ n_salts rows/key.

The salt is ``pmod(monotonically_increasing_id(), n_salts)`` — row
position, not row content: it reads NO data columns (a content hash
over all columns would drag the 100 TB ``bytes`` payload into what is
otherwise a two-narrow-column scan), and it splits even bit-identical
duplicate rows across reducers (a content-derived salt sends identical
rows to the SAME reducer — failing exactly for planted full-row dups).
Violation rows are recovered with a semi-join of the (small) duplicate
key set back against the table — the 10^12-row side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import VIOLATION_SCHEMA


def duplicate_keys(df: DataFrame, key_col: str, n_salts: int = 64) -> DataFrame:
    """Keys appearing more than once: (key, n_occurrences)."""
    # position-derived salt: column-free (never scans `bytes`) and
    # splits identical rows — see module docstring
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    partial = (
        df.select(F.col(key_col).alias("key"), salt.alias("__salt"))
        .groupBy("key", "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return (
        partial.groupBy("key")
        .agg(F.sum("__c").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )


def uniqueness_violations(
    df: DataFrame,
    key_col: str,
    id_col: str = "image_id",
    partition_expr=None,
    n_salts: int = 64,
) -> DataFrame:
    """VIOLATION_SCHEMA rows for every row carrying a duplicated key."""
    dups = duplicate_keys(df, key_col, n_salts=n_salts)
    part = (
        partition_expr
        if partition_expr is not None
        else F.lit(None).cast("int")
    )
    # no broadcast hint on purpose: the duplicate-key set is
    # data-dependent (could be huge under pathological duplication), so
    # AQE picks broadcast-vs-shuffle from the set's ACTUAL runtime size
    hits = df.join(dups, df[key_col] == dups["key"], "left_semi")
    return hits.select(
        F.lit(f"unique_{key_col}").alias("check"),
        part.cast("int").alias("partition_id"),
        F.col(id_col).cast("string").alias("image_id"),
        F.lit(key_col).alias("column"),
        F.concat(F.lit("duplicate key: "), F.col(key_col).cast("string")).alias(
            "detail"
        ),
    ).to(VIOLATION_SCHEMA)
