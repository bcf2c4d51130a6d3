"""phash column integrity: the stored ``phash`` column vs the pHash
recomputed from the payload bytes.

The north rule treats ``phash`` as an INPUT column (uniqueness on it is
checks/unique.py); this check closes the loop by validating the column
itself against ``operators/multimodal.py::compute_phash`` — a supplier
writing wrong or stale hashes corrupts every downstream dedup decision,
and nothing else in the suite would notice.

Scale shape: ``compute_phash`` reads only (image_id, bytes) through the
batched mapInPandas decode; the result joins back to the (image_id,
stored-phash, partition) projection on image_id — an equi-join of two
narrow tables co-partitioned by the shuffle, never a broadcast of the
big side. Undecodable payloads are skipped here (the integrity check is
where THOSE get flagged), so this check never double-reports a corrupt
payload as a phash mismatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import VIOLATION_SCHEMA


def phash_column_violations(
    df: DataFrame,
    partition_expr: Column,
    phash_col: str = "phash",
    max_hamming: int = 0,
) -> DataFrame:
    """Violation rows where hamming(stored, recomputed) > max_hamming.

    ``max_hamming=0`` (default) demands the stored column be the exact
    pinned pHash; a nonzero band tolerates a supplier that computed the
    hash over a differently-resized rendition of the same image."""
    from ..operators.dedup import hamming64
    from ..operators.multimodal import compute_phash

    recomputed = compute_phash(df)
    stored = df.select(
        partition_expr.cast("int").alias("partition_id"),
        "image_id",
        F.col(phash_col).cast("long").alias("__stored"),
    )
    return (
        stored.join(recomputed, "image_id")
        .withColumn(
            "__ham", hamming64(F.col("__stored"), F.col("phash64"))
        )
        .filter(F.col("__ham") > int(max_hamming))
        .select(
            F.lit("phash").alias("check"),
            F.col("partition_id"),
            F.col("image_id").cast("string"),
            F.lit(phash_col).alias("column"),
            F.format_string(
                "stored phash differs from recomputed by %d bits",
                F.col("__ham"),
            ).alias("detail"),
        )
        .to(VIOLATION_SCHEMA)
    )
