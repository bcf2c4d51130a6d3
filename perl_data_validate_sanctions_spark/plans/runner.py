"""The check registry + validation runner.

Generalizes the reference's top-level flow (`update_data` →
per-source fetch/parse/verify with per-source error isolation and
pass/fail bookkeeping, /root/reference/lib/Data/Validate/Sanctions.pm:
52-90 and Fetcher.pm:814-863) to: run every registered constraint check
over the images table, union their violation rows, and roll them up
into per-partition pass/fail verdicts (the per-source {updated,
verified, error} analog at partition granularity).

Partition granularity is the *logical* partition
``pmod(xxhash64(image_id), N_LOGICAL_PARTS)`` — stable under any
physical layout or cluster size (verdicts must not change when the
executor count does). On a real Iceberg deployment this maps to the
table's partition spec."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..checks.drift import drift_from_hist, drift_violations
from ..checks.integrity import integrity_violations
from ..checks.referential import referential_violations
from ..checks.schema_check import schema_violations
from ..checks.stats import column_stats
from ..checks.unique import uniqueness_violations
from ..operators.matcher import match_captions
from ..operators.matcher_arrow import match_captions_arrow
from ..schema import VIOLATION_SCHEMA
from ..sources.synth import expected_caption, logical_partition

DEFAULT_CHECKS = (
    "schema",
    "unique_image_id",
    "unique_phash",
    "referential",
    "drift_w",
    "drift_h",
    "drift_fmt",
    "integrity",
    "sanctioned",
)

# opt-in (not in DEFAULT_CHECKS, so the sink oracle's expected rollup
# stays stable): PSI on the format mix — the band-based alternative to
# drift_fmt's chi-square, fed from the SAME cube, so enabling it adds
# no table scan. run_validation(checks=DEFAULT_CHECKS + ("drift_psi_fmt",))
PSI_CHECK = "drift_psi_fmt"

# captions look like "... in <Place>"; the trailing token is the
# caption-side foreign key checked against the places dimension
CAPTION_KEY_RE = r" in (\p{L}+)$"

# "auto" match-strategy budget: max sanction-dimension ENTRY rows for
# which the worker-local Arrow index (sparkContext.broadcast dict,
# matcher_arrow._MatcherIndex) is used. Sized from memory, not speed:
# ~500k entries × ~3 aliases × ~100 B ≈ 150 MB per Python worker —
# the outer edge of a sane per-worker broadcast. The reference ships
# 15,664 entries (share/sanctions.yml), 30× inside the budget; its own
# design makes the same bet (the whole dataset is an in-process hash,
# Sanctions.pm:253-315 — there is no out-of-core path to mirror).
AUTO_ARROW_DIM_MAX_ENTRIES = 500_000


def resolve_match_strategy(
    n_dim_entries: int, n_rows: int | None = None
) -> str:
    """The SCALING.md crossover rule (round-5 measured), as code.

    Arrow won EVERY measured cell of the (rows × dimension) grid —
    600 k and 2.4 M rows, 212-alias and 15,664-entry dimensions,
    standalone and inside the concurrent suite — and the native path's
    candidate-aggregation state grows superlinearly with row count at
    full dimension (65-94 s vs Arrow's 9-12.5 s at 2.4 M), so MORE
    rows reinforce, never flip, the choice. The one axis that flips
    it is dimension size: beyond the worker-local index memory budget
    the Arrow screen's broadcast dict no longer fits, and the native
    path — whose token index is a relational join Catalyst can
    degrade from broadcast to shuffle — is the only shape that
    survives. ``n_rows`` is accepted (and recorded by callers) so the
    rule's signature matches the grid it was measured on."""
    del n_rows  # measured: row count never flips the choice
    if n_dim_entries > AUTO_ARROW_DIM_MAX_ENTRIES:
        return "native"
    return "arrow"


def caption_key_expr() -> Column:
    k = F.regexp_extract(F.col("caption"), CAPTION_KEY_RE, 1)
    return F.when(k != "", k)


@dataclass
class ValidationReport:
    violations: DataFrame
    partition_verdicts: DataFrame
    check_summary: DataFrame
    stats: DataFrame | None = None
    drift_results: dict[str, DataFrame] = field(default_factory=dict)


def run_validation(
    images: DataFrame,
    entries: DataFrame | None = None,
    ref_keys: DataFrame | None = None,
    checks: tuple[str, ...] = DEFAULT_CHECKS,
    partition_expr: Column | None = None,
    match_strategy: str = "auto",
    expected_caption_expr: Column | None = None,
    with_stats: bool = True,
    pixel_sample: int | None = None,
    concurrent: bool = True,
    sink_dir: str | None = None,
) -> ValidationReport:
    """Run the registered checks and roll violations into per-partition
    verdicts.

    ``sink_dir``: when set, the violation rows are WRITTEN to
    ``{sink_dir}/violations.parquet`` (the rollups to
    ``partition_verdicts.parquet`` / ``check_summary.parquet``, and —
    when ``with_stats`` — the per-column metrics to ``stats.parquet``)
    and the returned report's DataFrames read back from those tables —
    the production shape at 10^12 rows, where verdict/violation/metric
    artifacts land in tables, not the driver. Default (None) keeps the
    collect-friendly localCheckpoint-backed report.

    ``match_strategy``: ``"auto"`` (default) applies the measured
    SCALING.md crossover rule via :func:`resolve_match_strategy` —
    the Arrow screen whenever the dimension fits the worker-local
    index budget (it won every measured (rows × dim) cell), the
    native relational path beyond it (the only shape whose token-index
    join Catalyst can degrade from broadcast to shuffle when the
    dimension outgrows broadcast). Explicit ``"arrow"`` / ``"native"``
    override the rule — e.g. native when Python worker slots are the
    scarce resource or when the verdicts feed further JVM-side
    relational logic without an Arrow hop; the two paths are
    output-identical by pinned contract.

    ``concurrent`` (default): each check materializes as its OWN Spark
    job from a driver thread pool (eager localCheckpoint), then the
    union reads the checkpointed blocks. A single union-of-9-branches
    job executes its AQE query stages largely sequentially, so suite
    wall time degenerates to the SUM of branch latencies; concurrent
    jobs share the task slots and bring it down to ~max(branch). Same
    results by construction — only job boundaries change."""
    part = partition_expr if partition_expr is not None else logical_partition("image_id")
    exp_cap = (
        expected_caption_expr
        if expected_caption_expr is not None
        else expected_caption("image_id")
    )
    spark = images.sparkSession

    pieces: list[DataFrame] = []
    piece_names: list[str] = []
    drift_results: dict[str, DataFrame] = {}

    def _add(name: str, df: DataFrame) -> None:
        piece_names.append(name)
        pieces.append(df)

    # ONE scan builds the (partition, w, h, fmt) data cube; the three
    # drift histograms AND the per-partition row counts all derive from
    # it without touching the table again (w/h/fmt are low-cardinality,
    # so the cube is tiny: |parts| × |w| × |h| × |fmt| rows). Eager
    # localCheckpoint, not .cache(): a cache entry would outlive the
    # report in the session CacheManager (repeated run_validation calls
    # leak), while checkpoint blocks are reclaimed when the report's
    # plans are garbage-collected — and every consumer needs the cube
    # materialized anyway.
    import os as _os
    import sys as _sys
    import time as _time
    from concurrent.futures import ThreadPoolExecutor as _TPE

    _timing = _os.environ.get("PDVS_RUNNER_TIMING") == "1"
    _t0 = _time.time()
    _cube_plan = images.groupBy(
        part.cast("int").alias("partition_id"), "w", "h", "fmt"
    ).agg(F.count(F.lit(1)).alias("n"))
    # materialize the cube in a background thread so its scan job
    # overlaps the (driver-side) plan construction of the non-drift
    # checks below; the future is joined before anything consumes it.
    # The executor is shut down in the finally below — an exception
    # while building checks must not leak the thread / background job.
    def _in_pool(name: str, fn):
        # spark.scheduler.mode=FAIR schedules fairly BETWEEN pools, and
        # the pool is chosen by a thread-local property — without this,
        # every job lands in the single "default" pool whose internal
        # order is FIFO and FAIR mode changes nothing (ADVICE r4).
        # Pools are auto-created on first use; no allocation file needed.
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        return fn()

    _cube_ex = _TPE(max_workers=1)
    _cube_fut = _cube_ex.submit(
        _in_pool, "cube", lambda: _cube_plan.localCheckpoint(eager=True)
    )
    try:

        def _cube() -> DataFrame:
            out = _cube_fut.result()
            if _timing and not getattr(_cube_fut, "_pdvs_logged", False):
                _cube_fut._pdvs_logged = True
                print(f"[runner] cube            {_time.time() - _t0:7.2f}s",
                      file=_sys.stderr)
            return out

        if "schema" in checks:
            _add("schema", schema_violations(images, part))
        if "unique_image_id" in checks:
            _add(
                "unique_image_id",
                uniqueness_violations(images, "image_id", partition_expr=part),
            )
        if "unique_phash" in checks:
            _add(
                "unique_phash",
                uniqueness_violations(images, "phash", partition_expr=part),
            )
        if "referential" in checks and ref_keys is not None:
            _add(
                "referential",
                referential_violations(
                    images, caption_key_expr(), ref_keys, partition_expr=part
                ),
            )
        if "integrity" in checks:
            _add(
                "integrity",
                integrity_violations(
                    images, part, exp_cap, pixel_sample=pixel_sample
                ),
            )
        if "sanctioned" in checks and entries is not None:
            strategy = match_strategy
            if strategy == "auto":
                # one count() job on the (small) dimension table; the
                # rule itself is resolve_match_strategy — kept pure and
                # pytest-pinned at both dimension scales
                strategy = resolve_match_strategy(entries.count())
            matcher = (
                match_captions_arrow if strategy == "arrow" else match_captions
            )
            matches = matcher(images, entries)
            # a sanctioned caption is a violation row (the reference's
            # {matched: 1} verdict, re-framed as a constraint failure);
            # the logical partition derives from image_id alone, so no
            # join back to the table is needed
            _add(
                "sanctioned",
                matches.select(
                    F.lit("sanctioned").alias("check"),
                    part.cast("int").alias("partition_id"),
                    F.col("image_id").cast("string"),
                    F.lit("caption").alias("column"),
                    F.concat(
                        F.lit("matched "), F.col("matched_name"),
                        F.lit(" on "), F.col("list"),
                    ).alias("detail"),
                )
                .to(VIOLATION_SCHEMA)
            )

        # drift branches come LAST: they are the only plans that need the
        # materialized cube, so building every other check's plan first
        # maximizes the overlap with the cube job running in _cube_ex. The
        # three branches are tiny (cube-derived histograms) and fuse into
        # ONE piece/job — three separate jobs each paid driver latency; the
        # `check` column still distinguishes drift_w/h/fmt in the rollup.
        drift_pieces: list[DataFrame] = []
        for col, kind, name in (
            ("w", "ks", "drift_w"),
            ("h", "ks", "drift_h"),
            ("fmt", "chi2", "drift_fmt"),
            ("fmt", "psi", PSI_CHECK),
        ):
            if name in checks:
                hist = (
                    _cube().filter(F.col(col).isNotNull())
                    .groupBy("partition_id", F.col(col).alias("value"))
                    .agg(F.sum("n").alias("n"))
                )
                res = drift_from_hist(hist, col, kind=kind)
                drift_results[col if kind != "psi" else f"{col}_psi"] = res
                drift_pieces.append(drift_violations(res))
        if drift_pieces:
            fused = drift_pieces[0]
            for p in drift_pieces[1:]:
                fused = fused.unionByName(p)
            _add("drift(fused)", fused)

        if concurrent and len(pieces) > 1:
            import os
            import sys
            import time
            from concurrent.futures import ThreadPoolExecutor

            timing = os.environ.get("PDVS_RUNNER_TIMING") == "1"
            # (the shared cube is already materialized — the _cube() future
            # is joined by the drift branches before the pool starts —
            # so concurrent drift branches can't race to compute it)

            def _mat(arg: tuple[str, DataFrame]) -> DataFrame:
                name, df = arg
                t = time.time()
                # one scheduler pool per check: FAIR mode shares slots
                # between POOLS, so the light checks' small stages
                # interleave with the long mapInPandas stages instead of
                # queuing behind them in the one FIFO default pool
                out = _in_pool(name, lambda: df.localCheckpoint(eager=True))
                if timing:
                    print(f"[runner] {name:16s} {time.time() - t:7.2f}s",
                          file=sys.stderr)
                return out

            # PDVS_RUNNER_POOL caps how many checks materialize at once
            # (default: all). Fewer concurrent jobs = less task-set
            # interleaving between bandwidth-heavy (integrity) and cache-
            # sensitive (join/agg) stages on one shared memory bus.
            pool = int(os.environ.get("PDVS_RUNNER_POOL", "0")) or len(pieces)
            # the one-pass column stats ride the same pool: it's an
            # independent scan the caller will collect anyway, so its job
            # overlaps the check jobs instead of running serially after them
            jobs = list(zip(piece_names, pieces))
            if with_stats:
                jobs.append(("stats", column_stats(images)))
            _tp = time.time()
            with ThreadPoolExecutor(max_workers=pool + (1 if with_stats else 0)) as ex:
                results = list(ex.map(_mat, jobs))
            if timing:
                print(f"[runner] pool_total      {time.time() - _tp:7.2f}s",
                      file=sys.stderr)
            stats_df = results.pop() if with_stats else None
            pieces = results
        else:
            stats_df = column_stats(images) if with_stats else None
        _tu = _time.time()
        if pieces:
            violations = pieces[0]
            for p in pieces[1:]:
                violations = violations.unionByName(p)
            # the union of ~10 checkpointed pieces carries the SUM of
            # their partition counts (~300 at 32 cores) — every
            # downstream consumer (two rollups + the caller's reads,
            # or the sink write) would launch that many near-empty
            # tasks, and the sink would land that many tiny files.
            # A narrow coalesce to the session's parallelism bounds
            # task count and output file count without a shuffle
            # (violation rows are a tiny fraction of the input by
            # construction; ordering is irrelevant to the rollups).
            # (coalesce to a LARGER count is a no-op, so this never
            # reduces parallelism below the session's)
            violations = violations.coalesce(
                spark.sparkContext.defaultParallelism
            )
        else:
            violations = spark.createDataFrame([], VIOLATION_SCHEMA)
        if _timing:
            print(f"[runner] union_built     {_time.time() - _tu:7.2f}s",
                  file=_sys.stderr)
        if sink_dir is not None:
            # production sink: violations land in a parquet table and every
            # downstream rollup scans the table — no driver-held blocks
            import os as _os

            viol_path = _os.path.join(sink_dir, "violations.parquet")
            violations.write.mode("overwrite").parquet(viol_path)
            violations = spark.read.schema(VIOLATION_SCHEMA).parquet(viol_path)
        else:
            # lazy localCheckpoint (materializes at the first action, reused
            # by the rollup, summary and caller reads): unlike .cache() the
            # blocks are reclaimed when the report is garbage-collected, so
            # a consumer that never calls unpersist() — the CLI, a notebook
            # loop — cannot leak executor storage across run_validation calls
            violations = violations.localCheckpoint(eager=False)

        _tr = _time.time()
        rows_per_part = _cube().groupBy("partition_id").agg(
            F.sum("n").alias("n_rows")
        )
        fails_per_part = violations.groupBy("partition_id").agg(
            F.count(F.lit(1)).alias("n_violations"),
            F.count_distinct(
                F.when(F.col("image_id").isNotNull(), F.col("image_id"))
            ).alias("n_fail_rows"),
        )
        partition_verdicts = (
            rows_per_part.join(fails_per_part, "partition_id", "left")
            .fillna(0, ["n_violations", "n_fail_rows"])
            .withColumn("n_pass_rows", F.col("n_rows") - F.col("n_fail_rows"))
            .withColumn("passed", F.col("n_violations") == 0)
            .orderBy("partition_id")
        )
        check_summary = (
            violations.groupBy("check")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .orderBy("check")
        )
        if _timing:
            print(f"[runner] rollup_built    {_time.time() - _tr:7.2f}s",
                  file=_sys.stderr)
        if sink_dir is not None:
            # the two rollups are tiny independent jobs over the already-
            # written violations table — write them concurrently
            def _write(arg: tuple[str, DataFrame]) -> None:
                name, df = arg
                _in_pool(
                    name,
                    lambda: df.write.mode("overwrite").parquet(
                        _os.path.join(sink_dir, f"{name}.parquet")
                    ),
                )

            rollups = [
                ("partition_verdicts", partition_verdicts),
                ("check_summary", check_summary),
            ]
            if stats_df is not None:
                # the north rule sinks METRICS alongside verdicts:
                # the per-column stats land as a table too, and the
                # report reads them back like every other artifact
                rollups.append(("stats", stats_df))
            with _TPE(max_workers=len(rollups)) as _wex:
                list(_wex.map(_write, rollups))
            partition_verdicts = spark.read.parquet(
                _os.path.join(sink_dir, "partition_verdicts.parquet")
            ).orderBy("partition_id")
            check_summary = spark.read.parquet(
                _os.path.join(sink_dir, "check_summary.parquet")
            ).orderBy("check")
            if stats_df is not None:
                stats_df = spark.read.parquet(
                    _os.path.join(sink_dir, "stats.parquet")
                )
    finally:
        _cube_ex.shutdown(wait=False)
    return ValidationReport(
        violations=violations,
        partition_verdicts=partition_verdicts,
        check_summary=check_summary,
        stats=stats_df,
        drift_results=drift_results,
    )
