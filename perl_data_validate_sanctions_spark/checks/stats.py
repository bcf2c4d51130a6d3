"""Per-column statistics in ONE aggregation pass.

min / max / null-count / null-fraction / approx-distinct (HyperLogLog++
via ``approx_count_distinct``) for every requested column, computed as a
single wide ``agg`` (one scan, one reduce) and unpivoted to long format
with ``stack`` — still one job, no per-column scans. ``column_quantiles``
adds p50/p95/p99-style quantiles the same way (mergeable
``percentile_approx`` sketches by default; exact ``percentile`` for
oracle parity).

``bytes`` is excluded by default: stats must never force the payload
column off disk (column-pruning discipline; at 100 TB the payload is
~all the bytes)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Long-format stats: (column, min, max, n_nulls, n_rows,
    null_fraction, n_distinct). min/max are rendered as strings so one
    schema covers all column types; n_distinct is exact when
    ``exact_distinct`` (for oracle comparisons), HLL otherwise."""
    if columns is None:
        columns = [c for c, t in df.dtypes if t != "binary"]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        if exact_distinct:
            aggs.append(F.countDistinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col, rsd).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)

    stack_args = []
    for c in columns:
        stack_args.append(f"'{c}', __min_{c}, __max_{c}, __nulls_{c}, __nd_{c}")
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(columns)}, {', '.join(stack_args)}) as "
            "(column, min, max, n_nulls, n_distinct)"
        ),
    )
    return stacked.select(
        "column",
        "min",
        "max",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_nulls") / F.col("n_rows")).alias("null_fraction"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


def column_quantiles(
    df: DataFrame,
    columns: list[str],
    probabilities: tuple[float, ...] = (0.5, 0.95, 0.99),
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Long-format quantiles: (column, p, value) — every requested
    column × probability in ONE aggregation pass (one scan, one
    reduce), like ``column_stats``.

    ``exact=False`` (the 100 TB default) uses ``percentile_approx`` —
    a single-pass, mergeable quantile sketch whose partial aggregates
    combine map-side exactly like a sum, so the shuffle carries one
    sketch per column, never rows. ``exact=True`` uses ``percentile``
    (sort-based exact linear interpolation, the same definition as
    ANSI ``percentile_cont`` / DuckDB ``quantile_cont``) — for oracle
    comparisons and small dimensions only; it materializes each
    column's values per aggregation buffer, which is NOT the shape you
    run over 10^12 rows."""
    probs = [float(p) for p in probabilities]
    if not columns or not probs:
        raise ValueError("columns and probabilities must be non-empty")
    arr = F.array(*[F.lit(p) for p in probs])
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        fn = (F.percentile(col, arr) if exact
              else F.percentile_approx(col, arr, F.lit(int(accuracy))))
        aggs.append(fn.alias(f"__q_{c}"))
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(p).alias("p"),
            F.col(f"__q_{c}")[i].cast("double").alias("value"),
        )
        for c in columns
        for i, p in enumerate(probs)
    ]
    return wide.select(
        F.explode(F.array(*rows)).alias("q")
    ).select("q.column", "q.p", "q.value")
