"""Distribution-drift detection per partition: KS for numeric columns,
chi-square for categoricals — the statistics run over Arrow batches via
``applyInPandas`` (BASELINE.json north_star: "KS and chi-square
statistics computed with mapInPandas over Arrow batches, no per-row
Python"), but the heavy lifting never leaves the JVM:

  phase 1 (native, map-side combined): groupBy(partition, value).count()
           — at 10^12 rows this reduces each partition to its value
           histogram (≤ a few thousand rows per partition for pixel
           dimensions / formats);
  phase 2 (broadcast): the global histogram joins in;
  phase 3 (Arrow): one pandas group per partition computes the
           statistic against the rest-of-table distribution
           (global minus own counts — unbiased holdout).

So Python sees only histograms, never rows."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._stat_math import chi2_from_counts, ks_two_sample_from_counts

_RESULT_SCHEMA = (
    "partition_id int, column string, kind string, statistic double, "
    "p_value double, n long, drifted boolean"
)


def drift_check(
    df: DataFrame,
    value_col: str,
    partition_expr: Column,
    kind: str = "ks",
    alpha: float = 1e-6,
    psi_threshold: float = 0.25,
) -> DataFrame:
    """Per-partition drift verdicts: (partition_id, column, kind,
    statistic, p_value, n, drifted).

    ``alpha`` defaults tight (1e-6): with millions of rows per partition
    even trivial wobbles are 'significant' at 0.05; drift detection at
    scale wants effect-size-large deviations. ``kind="psi"`` flags on
    the statistic itself instead (``psi_threshold``, default the
    industry major-shift band 0.25) — PSI is a divergence, not a test.
    """
    if kind not in ("ks", "chi2", "psi"):
        raise ValueError(kind)

    hist = (
        df.select(partition_expr.cast("int").alias("partition_id"),
                  F.col(value_col).alias("value"))
        .filter(F.col("value").isNotNull())
        .groupBy("partition_id", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return drift_from_hist(hist, value_col, kind=kind, alpha=alpha,
                           psi_threshold=psi_threshold)


# PSI's standard industry decision bands: < 0.1 stable, 0.1-0.25
# moderate shift, > 0.25 major shift. The default flags at 0.25.
PSI_THRESHOLD = 0.25
# proportion floor for empty cells (the usual PSI smoothing — keeps
# ln() finite when a value is absent from one side of the comparison)
_PSI_EPS = 1e-6


def _psi_from_grid(joined: DataFrame, value_col: str,
                   threshold: float) -> DataFrame:
    """Population Stability Index per partition vs the rest-of-table
    holdout. PSI = Σ (p_own − p_rest)·ln(p_own / p_rest) over the value
    bins — ALGEBRAIC over the histogram, so unlike KS (needs the sorted
    CDF walk) and chi-square (kept Arrow-side for parity with its
    scipy-shaped math) it never leaves the JVM: two HashAggregates over
    histogram-sized data, no applyInPandas, no Python workers.

    Zero-mass cells on either side are floored at ``_PSI_EPS`` (the
    standard smoothing); a degenerate single-partition table (empty
    holdout) floors every rest-proportion, yielding a large PSI — the
    same "this holdout is meaningless" signal chi2's penalty term
    gives. p_value is NULL: PSI is a divergence with decision bands,
    not a test statistic."""
    totals = joined.groupBy("partition_id").agg(
        F.sum("n").alias("__own_tot"),
        F.sum(F.col("n_global") - F.col("n")).alias("__rest_tot"),
    )
    cells = joined.join(F.broadcast(totals), "partition_id")
    own_tot = F.col("__own_tot").cast("double")
    rest_tot = F.col("__rest_tot").cast("double")
    p_own = F.greatest(F.col("n").cast("double") / own_tot,
                       F.lit(_PSI_EPS))
    rest_n = (F.col("n_global") - F.col("n")).cast("double")
    p_rest = F.greatest(
        F.when(rest_tot > 0, rest_n / rest_tot).otherwise(F.lit(0.0)),
        F.lit(_PSI_EPS),
    )
    term = (p_own - p_rest) * F.log(p_own / p_rest)
    return (
        cells.groupBy("partition_id")
        .agg(F.sum(term).alias("statistic"),
             F.sum("n").cast("long").alias("n"))
        .select(
            "partition_id",
            F.lit(value_col).alias("column"),
            F.lit("psi").alias("kind"),
            F.col("statistic").cast("double").alias("statistic"),
            F.lit(None).cast("double").alias("p_value"),
            "n",
            (F.col("statistic") > F.lit(float(threshold))).alias("drifted"),
        )
    )


def drift_from_hist(
    hist: DataFrame,
    value_col: str,
    kind: str = "ks",
    alpha: float = 1e-6,
    psi_threshold: float = PSI_THRESHOLD,
) -> DataFrame:
    """Same verdicts from a prebuilt (partition_id, value, n) histogram —
    lets the runner feed several drift checks from one cube scan."""
    global_hist = hist.groupBy("value").agg(F.sum("n").alias("n_global"))
    # full (partition × value) grid: a value absent from a partition but
    # present elsewhere must still reach the statistic as own=0 —
    # otherwise `rest` (global minus own) silently drops that value's
    # mass from the holdout CDF (KS) / expected proportions (chi2), a
    # bias whenever partitions don't share the same support. The grid is
    # |partitions| × |distinct values| histogram rows — tiny for the
    # low-cardinality columns drift applies to, and built broadcast-side.
    parts = hist.select("partition_id").distinct()
    grid = parts.crossJoin(F.broadcast(global_hist))  # both tiny
    joined = grid.join(hist, ["partition_id", "value"], "left").fillna(
        0, ["n"]
    )

    if kind == "psi":
        return _psi_from_grid(joined, value_col, psi_threshold)

    col_name, knd, a = value_col, kind, alpha

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        own = pdf["n"].to_numpy(dtype=np.float64)
        rest = pdf["n_global"].to_numpy(dtype=np.float64) - own
        if knd == "ks":
            values = pd.to_numeric(pdf["value"]).to_numpy(dtype=np.float64)
            stat, p = ks_two_sample_from_counts(values, own, rest)
        else:
            props = rest / rest.sum() if rest.sum() > 0 else rest
            stat, p, _ = chi2_from_counts(own, props)
        return pd.DataFrame(
            [
                dict(
                    partition_id=pid,
                    column=col_name,
                    kind=knd,
                    statistic=float(stat),
                    p_value=float(p),
                    n=int(own.sum()),
                    drifted=bool(p < a),
                )
            ]
        )

    return joined.groupBy("partition_id").applyInPandas(
        per_partition, _RESULT_SCHEMA
    )


def drift_violations(results: DataFrame) -> DataFrame:
    """Project drift results to VIOLATION_SCHEMA (one row per drifted
    partition — violations are partition-granular for this check)."""
    from ..schema import VIOLATION_SCHEMA

    return (
        results.filter(F.col("drifted"))
        .select(
            F.concat(F.lit("drift_"), F.col("kind")).alias("check"),
            F.col("partition_id"),
            F.lit(None).cast("string").alias("image_id"),
            F.col("column"),
            F.when(
                F.col("kind") == "psi",
                F.format_string("psi=%.4f n=%d", F.col("statistic"),
                                F.col("n")),
            ).otherwise(
                F.format_string(
                    "stat=%.4f p=%.3g n=%d", F.col("statistic"),
                    F.col("p_value"), F.col("n"),
                )
            ).alias("detail"),
        )
        .to(VIOLATION_SCHEMA)
    )


# ----------------------------------------------------- embedding drift ------

EMBEDDING_COSINE_THRESHOLD = 0.5


def embedding_drift_check(
    df: DataFrame,
    vec_col: str,
    partition_expr,
    threshold: float = EMBEDDING_COSINE_THRESHOLD,
) -> DataFrame:
    """Distribution drift for HIGH-DIMENSIONAL columns: per partition,
    the cosine similarity between the partition's mean embedding and
    the rest-of-table mean (the same unbiased holdout as the scalar
    drift checks). A partition whose centroid points away from the
    corpus centroid (cosine < threshold) is drifted — the standard
    cheap screen for "this shard came from a different embedding model
    / corpus slice".

    Scale shape (the IVF mini-kmeans trick, similarity.py:232):
    posexplode to (partition, dim, component) then TWO HashAggregates —
    the shuffle carries |partitions| × dim rows, never embeddings; all
    math is JVM-native Columns (components cast to double so the
    oracle's accumulation matches bit-for-bit after rounding). p_value
    is NULL — like PSI, a divergence with a band, not a test."""
    base = df.select(
        partition_expr.cast("int").alias("partition_id"),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    ).select("partition_id", "d", F.col("x").cast("double").alias("x"))
    per = base.groupBy("partition_id", "d").agg(
        F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n")
    )
    glob = per.groupBy("d").agg(
        F.sum("sx").alias("gx"), F.sum("n").alias("gn")
    )
    j = per.join(F.broadcast(glob), "d")
    mo = F.col("sx") / F.col("n")
    rest_n = F.col("gn") - F.col("n")
    mr = F.when(rest_n > 0,
                (F.col("gx") - F.col("sx")) / rest_n).otherwise(F.lit(0.0))
    cells = j.select(
        "partition_id",
        (mo * mr).alias("__dot"),
        (mo * mo).alias("__no"),
        (mr * mr).alias("__nr"),
        F.col("n").alias("__n"),
    )
    denom = F.sqrt(F.col("no_sum")) * F.sqrt(F.col("nr_sum"))
    return (
        cells.groupBy("partition_id")
        .agg(
            F.sum("__dot").alias("dot_sum"),
            F.sum("__no").alias("no_sum"),
            F.sum("__nr").alias("nr_sum"),
            F.max("__n").cast("long").alias("n"),
        )
        .select(
            "partition_id",
            F.lit(vec_col).alias("column"),
            F.lit("embedding_cosine").alias("kind"),
            F.when(denom > 0, F.col("dot_sum") / denom)
            .otherwise(F.lit(0.0)).alias("statistic"),
            F.lit(None).cast("double").alias("p_value"),
            "n",
            (
                F.when(denom > 0, F.col("dot_sum") / denom)
                .otherwise(F.lit(0.0)) < F.lit(float(threshold))
            ).alias("drifted"),
        )
    )
