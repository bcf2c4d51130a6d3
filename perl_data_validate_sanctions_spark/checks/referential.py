"""Referential check: caption-side keys must exist in a broadcast
reference dimension — the engine generalization of the reference's only
referential lookup, country-name → ISO2 against the Locale::Country
table (/root/reference/lib/Data/Validate/Sanctions/Fetcher.pm:149-153),
where an unknown value is flagged (mapped to '' and pruned).

Plan shape: extract key (pure Column expr) → broadcast LEFT ANTI join
against the dimension → violations. The fact table never shuffles."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import VIOLATION_SCHEMA


def referential_violations(
    df: DataFrame,
    key_expr: Column,
    dim: DataFrame,
    dim_key: str = "key",
    id_col: str = "image_id",
    partition_expr: Column | None = None,
    check_name: str = "referential",
) -> DataFrame:
    """Rows whose extracted key is non-null but absent from ``dim``."""
    part = (
        partition_expr if partition_expr is not None else F.lit(None).cast("int")
    )
    keyed = df.select(
        F.col(id_col),
        part.cast("int").alias("__part"),
        key_expr.alias("__key"),
    ).filter(F.col("__key").isNotNull() & (F.col("__key") != ""))
    orphans = keyed.join(
        F.broadcast(dim.select(F.col(dim_key).alias("__key")).distinct()),
        "__key",
        "left_anti",
    )
    return orphans.select(
        F.lit(check_name).alias("check"),
        F.col("__part").alias("partition_id"),
        F.col(id_col).cast("string").alias("image_id"),
        F.lit("caption").alias("column"),
        F.concat(F.lit("dangling key: "), F.col("__key")).alias("detail"),
    ).to(VIOLATION_SCHEMA)
