"""End-to-end runner, checkpointed resume, and incremental-update merge
semantics (ported from t/05_sanctions_redis.t:231-298)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from perl_data_validate_sanctions_spark.plans.runner import run_validation
from perl_data_validate_sanctions_spark.schema import VIOLATION_SCHEMA
from perl_data_validate_sanctions_spark.sources.synth import (
    DRIFT_PARTS,
    N_LOGICAL_PARTS,
    PLACES,
    logical_partition,
    synth_entries,
    synth_images,
)
from perl_data_validate_sanctions_spark.streaming.checkpoint import (
    CheckpointStore,
    run_with_resume,
)
from perl_data_validate_sanctions_spark.streaming.incremental import (
    merge_source_states,
)

N = 12_000


@pytest.fixture(scope="module")
def images(spark):
    df = synth_images(spark, N, num_partitions=8).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def ref_dims(spark):
    entries = synth_entries(spark, n_extra=30)
    ref_keys = spark.createDataFrame([(p,) for p in PLACES], "key string")
    return entries, ref_keys


def test_full_validation_report(spark, images, ref_dims):
    entries, ref_keys = ref_dims
    report = run_validation(images, entries=entries, ref_keys=ref_keys)
    verdicts = report.partition_verdicts.collect()
    assert len(verdicts) == N_LOGICAL_PARTS
    assert sum(r["n_rows"] for r in verdicts) == N
    # drifted partitions must fail; some partitions must pass... at
    # least the planted drift partitions are failed:
    failed = {r["partition_id"] for r in verdicts if not r["passed"]}
    assert set(DRIFT_PARTS) <= failed
    summary = {r["check"]: r["n_violations"] for r in report.check_summary.collect()}
    # every planted violation class is detected
    for check in ("unique_image_id", "unique_phash", "integrity", "sanctioned"):
        assert summary.get(check, 0) > 0, f"{check} found nothing: {summary}"
    assert summary.get("schema", 0) == 0
    # sanctioned captions ≈ 2%
    assert 0.01 * N < summary["sanctioned"] < 0.04 * N
    # violations conform to the shared schema
    assert report.violations.schema == VIOLATION_SCHEMA


def test_resume_skips_completed_partitions(spark, images, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    store = CheckpointStore(ckpt)
    part = logical_partition("image_id")
    checks = ("schema", "unique_image_id", "drift_w")

    # interrupted first attempt: only partitions 0..9 got processed
    subset = images.filter(part < 10)
    run_id, lineage1, rep1 = run_with_resume(
        subset, store, run_id="runA", partition_expr=part,
        checks=checks, with_stats=False,
    )
    done1 = sorted(r["partition_id"] for r in lineage1.collect())
    assert done1 == list(range(10))

    # resume over the full table: the 10 done partitions are skipped
    run_id, lineage2, rep2 = run_with_resume(
        images, store, run_id="runA", partition_expr=part,
        checks=checks, with_stats=False,
    )
    assert rep2 is not None
    recomputed = {r["partition_id"] for r in rep2.partition_verdicts.collect()}
    assert recomputed == set(range(10, N_LOGICAL_PARTS))
    all_parts = sorted(r["partition_id"] for r in lineage2.collect())
    assert all_parts == list(range(N_LOGICAL_PARTS))

    # third run: everything complete → no recompute at all
    run_id, lineage3, rep3 = run_with_resume(
        images, store, run_id="runA", partition_expr=part,
        checks=checks, with_stats=False,
    )
    assert rep3 is None
    assert lineage3.count() == N_LOGICAL_PARTS

    # lineage equals a clean single-shot run (row counts + hashes)
    store_clean = CheckpointStore(str(tmp_path_factory.mktemp("ckpt2")))
    _, clean, _ = run_with_resume(
        images, store_clean, run_id="runB", partition_expr=part,
        checks=checks, with_stats=False,
    )
    a = {(r["partition_id"], r["content_hash"], r["n_rows"], r["n_fail"])
         for r in lineage3.collect()}
    b = {(r["partition_id"], r["content_hash"], r["n_rows"], r["n_fail"])
         for r in clean.collect()}
    assert a == b


def _state(spark, rows):
    return spark.createDataFrame(
        rows, "source string, updated long, n_entries long, "
        "content_hash string, error string"
    )


def test_incremental_merge_semantics(spark):
    cur = _state(spark, [
        ("EU", 100, 10, "h1", None),
        ("HMT", 200, 20, "h2", None),
        ("OFAC", 300, 30, "h3", "old failure"),
    ])
    new = _state(spark, [
        ("EU", 100, 10, "h1", None),        # unchanged → keep, not changed
        ("HMT", 200, 25, "h2b", None),      # count differs, same date → replace
        ("OFAC", 300, 30, "h3b", None),     # error cleared → replace
        ("UNSC", 400, 5, "h4", None),       # new source → add
        ("MOHA", 0, 0, None, "boom"),       # fetch error → record error
    ])
    out = {r["source"]: r for r in merge_source_states(cur, new, now=1000).collect()}

    assert out["EU"]["changed"] is False and out["EU"]["take_new"] is False
    assert out["EU"]["content_hash"] == "h1"

    assert out["HMT"]["changed"] is True and out["HMT"]["take_new"] is True
    assert out["HMT"]["n_entries"] == 25 and out["HMT"]["content_hash"] == "h2b"

    assert out["OFAC"]["changed"] is True
    assert out["OFAC"]["error"] is None  # error cleared (Sanctions.pm:64-67)
    assert out["OFAC"]["content_hash"] == "h3b"

    assert out["UNSC"]["changed"] is True and out["UNSC"]["n_entries"] == 5

    assert out["MOHA"]["changed"] is True and out["MOHA"]["take_new"] is False
    assert out["MOHA"]["error"] == "boom"  # error recorded (Sanctions.pm:69-72)
    assert all(r["verified"] == 1000 for r in out.values())


def test_validation_report_parquet_sink(spark, images, ref_dims, tmp_path):
    """sink_dir writes violations/verdicts/summary to parquet tables and
    the returned report reads from them — same verdicts as the
    collect-path report (the 10^12-row artifact shape)."""
    import os

    entries, ref_keys = ref_dims
    base = run_validation(images, entries=entries, ref_keys=ref_keys)
    sunk = run_validation(images, entries=entries, ref_keys=ref_keys,
                          sink_dir=str(tmp_path))
    for name in ("violations", "partition_verdicts", "check_summary",
                 "stats"):
        assert os.path.isdir(str(tmp_path / f"{name}.parquet")), name
    # the metrics table is sunk too and reads back value-identical
    skey = lambda r: tuple(  # noqa: E731
        sorted((k, str(v)) for k, v in r.asDict().items())
    )
    assert sorted(map(skey, sunk.stats.collect())) == sorted(
        map(skey, base.stats.collect())
    )
    key = lambda r: (r["partition_id"], r["n_rows"], r["n_violations"],  # noqa: E731
                     r["n_fail_rows"], r["passed"])
    assert sorted(map(key, sunk.partition_verdicts.collect())) == sorted(
        map(key, base.partition_verdicts.collect())
    )
    assert sorted(
        (r["check"], r["n_violations"])
        for r in sunk.check_summary.collect()
    ) == sorted(
        (r["check"], r["n_violations"])
        for r in base.check_summary.collect()
    )
    assert sunk.violations.schema == VIOLATION_SCHEMA
    assert sunk.violations.count() == base.violations.count()


def test_resolve_match_strategy_rule():
    """The SCALING.md crossover, pinned at both measured dimension
    scales (VERDICT r5 #2): Arrow while the dimension fits the
    worker-local index budget, native beyond it, and row count never
    flips an in-budget choice."""
    from perl_data_validate_sanctions_spark.plans import runner

    assert runner.resolve_match_strategy(212) == "arrow"        # bench dim
    assert runner.resolve_match_strategy(15_664) == "arrow"     # bundled dim
    assert runner.resolve_match_strategy(15_664, n_rows=10**12) == "arrow"
    over = runner.AUTO_ARROW_DIM_MAX_ENTRIES + 1
    assert runner.resolve_match_strategy(over) == "native"
    assert runner.resolve_match_strategy(over, n_rows=1) == "native"


def test_auto_strategy_dispatch(spark, images, ref_dims, monkeypatch):
    """run_validation(match_strategy='auto') routes through the
    crossover rule: the Arrow screen at bundled-dimension scale, the
    native relational path once the dimension outgrows the budget
    (native stubbed — the DISPATCH is what's under test here; path
    output-agreement is pinned by test_matcher)."""
    from perl_data_validate_sanctions_spark.plans import runner

    entries, _ = ref_dims
    calls: list[str] = []
    real_arrow = runner.match_captions_arrow

    def spy_arrow(imgs, ents, *a, **k):
        calls.append("arrow")
        return real_arrow(imgs, ents, *a, **k)

    def spy_native(imgs, ents, *a, **k):
        calls.append("native")
        return spark.createDataFrame(
            [], "image_id string, list string, matched_name string"
        )

    monkeypatch.setattr(runner, "match_captions_arrow", spy_arrow)
    monkeypatch.setattr(runner, "match_captions", spy_native)

    small = images.limit(500)
    runner.run_validation(small, entries=entries, checks=("sanctioned",),
                          with_stats=False)
    assert calls == ["arrow"]

    big_dim = spark.range(runner.AUTO_ARROW_DIM_MAX_ENTRIES + 1)
    runner.run_validation(small, entries=big_dim, checks=("sanctioned",),
                          with_stats=False)
    assert calls == ["arrow", "native"]

    # explicit override still wins over the rule
    runner.run_validation(small, entries=entries, checks=("sanctioned",),
                          with_stats=False, match_strategy="native")
    assert calls == ["arrow", "native", "native"]


def test_runner_psi_opt_in_check(spark, images):
    """The opt-in PSI drift check (plans/runner.py PSI_CHECK) rides the
    SAME cube as the default drift branches — no extra table scan — and
    lands in the rollup under check='drift_psi'. The synth fixture's
    planted drift partitions skew the fmt mix, so PSI flags a superset
    of nothing and a subset of all partitions (band 0.25)."""
    from perl_data_validate_sanctions_spark.plans.runner import (
        DEFAULT_CHECKS,
        PSI_CHECK,
    )

    report = run_validation(
        images,
        checks=("drift_fmt", PSI_CHECK),
    )
    assert "fmt_psi" in report.drift_results
    psi = report.drift_results["fmt_psi"].collect()
    assert all(r["kind"] == "psi" and r["p_value"] is None for r in psi)
    rollup = {r["check"] for r in report.violations.select("check").distinct().collect()}
    assert rollup <= {"drift_chi2", "drift_psi"}
    assert PSI_CHECK not in DEFAULT_CHECKS  # opt-in by design
