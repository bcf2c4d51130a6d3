"""Round-7 optimization harness (bench.py is FROZEN for measurement —
this file holds the extra per-operator isolation timings the guide's
§1.4 asks for: noop-sink timing per query, sub-stage breakdowns for the
expensive operators, and machine-readiness probes so numbers taken in a
credit-depleted window are visibly annotated).

Usage:  python bench_extra.py <section> [...]
Sections: queries dedup phash integrity suite match all
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), PDVS_BENCH_CACHE.

Output: one JSON line per section to stdout; full dict written to
BENCH/extra_<section>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CACHE = os.environ.get("PDVS_BENCH_CACHE", "/root/repo/.bench_cache")


def _probe() -> float:
    from bench import _probe_mpxs

    return _probe_mpxs(1.0)


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def get_spark():
    from perl_data_validate_sanctions_spark.session import get_spark as gs

    return gs(app_name="pdvs-bench-extra", cores=CPUS)


def sec_queries(spark, out):
    """Every declared query, noop-sink isolated, one pass each after a
    warm pass of the flagship."""
    import __spark_entry__ as em

    qs = em.queries()
    qs["match_documents"](spark, SF_DIR).collect()  # warm
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"q:{name}")
        try:
            out[name] = noop(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {e}"
        spark.sparkContext.setJobDescription(None)


def sec_dedup(spark, out):
    """ngram/minhash/groups with sub-stage isolation at sf documents."""
    from pyspark.sql import functions as F

    from perl_data_validate_sanctions_spark.operators.dedup import (
        _shingle_table,
        minhash_lsh_pairs,
        minhash_signature,
        near_dup_groups,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out["probe_open"] = _probe()

    spark.sparkContext.setJobDescription("dedup: shingle build (uncached)")
    sh_lazy = _shingle_table(docs, "text", "doc_id", 3, cache=False)
    out["shingle_build_noop"] = noop(sh_lazy)

    spark.sparkContext.setJobDescription("dedup: minhash signature only")
    sig = sh_lazy.select("id", minhash_signature(F.col("sh"), 64).alias("sig"))
    out["minhash_signature_noop"] = noop(sig)

    spark.sparkContext.setJobDescription("dedup: ngram standalone")
    out["ngram_standalone"] = timed(
        lambda: ngram_jaccard_pairs(docs, w=3, threshold=0.3).count()
    )
    spark.sparkContext.setJobDescription("dedup: minhash standalone")
    out["minhash_standalone"] = timed(
        lambda: minhash_lsh_pairs(
            docs, w=3, k=64, bands=32, threshold=0.3
        ).count()
    )
    spark.sparkContext.setJobDescription("dedup: groups over ngram pairs")
    pairs = ngram_jaccard_pairs(docs, w=3, threshold=0.3)
    out["near_dup_groups"] = timed(lambda: near_dup_groups(pairs).count())
    spark.sparkContext.setJobDescription(None)
    out["probe_close"] = _probe()


def sec_phash(spark, out):
    """phash_dedup_150k breakdown: decode+hash stage vs hamming join."""
    from bench import _id_num

    from pyspark.sql import functions as F

    from perl_data_validate_sanctions_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )
    from perl_data_validate_sanctions_spark.operators.multimodal import (
        compute_phash,
        phash_near_dup_pairs,
    )

    n_ph = 150_000
    ph_path = f"{CACHE}/phash_dedup_{n_ph}.parquet"
    if not os.path.isdir(ph_path):
        import pandas as _pd

        def _ph_rows(batches):
            for pdf in batches:
                rows = []
                for iid in pdf["image_id"]:
                    num = _id_num(iid)
                    planted = num % 500 == 0 and num > 0
                    seed = 40_000 + (num - 1 if planted else num)
                    amp = 8 if planted else 0
                    rows.append(
                        (iid, f"PDVS1|png|64|48|{seed}|{amp}".encode())
                    )
                yield _pd.DataFrame(rows, columns=["image_id", "bytes"])

        (
            spark.range(n_ph)
            .repartition(32)
            .select(F.format_string("phd-%09d", "id").alias("image_id"))
            .mapInPandas(_ph_rows, "image_id string, bytes binary")
            .write.mode("overwrite")
            .parquet(ph_path)
        )
    ph_df = spark.read.parquet(ph_path)
    out["probe_open"] = _probe()
    spark.sparkContext.setJobDescription("phash: decode+hash only")
    out["compute_phash_noop"] = noop(compute_phash(ph_df))
    spark.sparkContext.setJobDescription("phash: hash materialize (ckpt)")
    t0 = time.time()
    sig = (
        compute_phash(ph_df)
        .select(F.col("image_id").alias("id"), F.col("phash64").alias("sig"))
        .localCheckpoint(eager=True)
    )
    out["compute_phash_ckpt"] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription("phash: hamming join only")
    out["hamming_join_only"] = timed(
        lambda: hamming_near_dup_pairs(
            sig, max_hamming=6, n_bits=64, s=2
        ).count()
    )
    spark.sparkContext.setJobDescription("phash: end-to-end")
    out["phash_dedup_150k_e2e"] = timed(
        lambda: phash_near_dup_pairs(ph_df, max_hamming=6).count()
    )
    spark.sparkContext.setJobDescription(None)
    out["probe_close"] = _probe()


def sec_integrity(spark, out):
    """validate_integrity_exact_150k breakdown."""
    from bench import build_images, run_suite

    from pyspark.sql import functions as F

    from perl_data_validate_sanctions_spark.checks.integrity import (
        integrity_violations,
    )
    from perl_data_validate_sanctions_spark.sources.synth import (
        PLACES,
        expected_caption,
        logical_partition,
        synth_entries,
    )

    entries = synth_entries(spark, n_extra=200)
    ref_keys = spark.createDataFrame([(p,) for p in PLACES], "key string")
    exact_images = build_images(spark, 150_000, CACHE)
    out["probe_open"] = _probe()
    spark.sparkContext.setJobDescription("integrity: bare exact check noop")
    out["integrity_bare_noop"] = noop(
        integrity_violations(
            exact_images,
            logical_partition("image_id"),
            expected_caption("image_id"),
        )
    )
    spark.sparkContext.setJobDescription("integrity: bare exact 2nd run")
    out["integrity_bare_noop2"] = noop(
        integrity_violations(
            exact_images,
            logical_partition("image_id"),
            expected_caption("image_id"),
        )
    )
    spark.sparkContext.setJobDescription("integrity: via run_suite")
    out["integrity_run_suite"] = round(
        run_suite(spark, exact_images, entries, ref_keys,
                  checks=("integrity",))[0], 3)
    spark.sparkContext.setJobDescription(None)
    out["probe_close"] = _probe()


def sec_suite(spark, out):
    """Full suite (mixed fixture, sampled mode) — the headline."""
    from bench import build_mixed_images, run_suite

    import duckdb

    from perl_data_validate_sanctions_spark.sources.synth import (
        PLACES,
        synth_entries,
    )

    n_rows = int(
        os.environ.get("PDVS_BENCH_ROWS")
        or duckdb.sql(
            f"SELECT count(*) FROM '{SF_DIR}/lineitem.parquet'"
        ).fetchone()[0]
    )
    entries = synth_entries(spark, n_extra=200)
    ref_keys = spark.createDataFrame([(p,) for p in PLACES], "key string")
    suite_images = build_mixed_images(spark, n_rows, CACHE)
    # warm
    warm = build_mixed_images(spark, min(20_000, n_rows), CACHE).repartition(
        max(int(CPUS), 4) if CPUS != "*" else 64
    )
    run_suite(spark, warm, entries, ref_keys, pixel_sample=4096)
    out["probe_open"] = _probe()
    walls = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"suite: full run {i}")
        walls.append(round(run_suite(spark, suite_images, entries, ref_keys,
                                     pixel_sample=4096)[0], 3))
    out["suite_runs"] = walls
    out["suite_min"] = min(walls)
    spark.sparkContext.setJobDescription(None)
    out["probe_close"] = _probe()


def sec_match(spark, out):
    """match_documents + match_captions timings."""
    import __spark_entry__ as em

    from bench import build_images

    import duckdb

    from perl_data_validate_sanctions_spark.operators.matcher import (
        match_captions,
    )
    from perl_data_validate_sanctions_spark.operators.matcher_arrow import (
        match_captions_arrow,
    )
    from perl_data_validate_sanctions_spark.sources.synth import synth_entries

    n_rows = int(
        os.environ.get("PDVS_BENCH_ROWS")
        or duckdb.sql(
            f"SELECT count(*) FROM '{SF_DIR}/lineitem.parquet'"
        ).fetchone()[0]
    )
    images = build_images(spark, n_rows, CACHE)
    entries = synth_entries(spark, n_extra=200)
    qs = em.queries()
    out["probe_open"] = _probe()
    qs["match_documents"](spark, SF_DIR).collect()  # warm
    runs = []
    for _ in range(3):
        spark.sparkContext.setJobDescription("match: match_documents")
        runs.append(timed(
            lambda: qs["match_documents"](spark, SF_DIR).collect()
        ))
    out["match_documents_runs"] = runs
    runs = []
    for _ in range(3):
        spark.sparkContext.setJobDescription("match: captions native")
        runs.append(timed(lambda: match_captions(images, entries).count()))
    out["match_captions_native_runs"] = runs
    runs = []
    for _ in range(3):
        spark.sparkContext.setJobDescription("match: captions arrow")
        runs.append(timed(
            lambda: match_captions_arrow(images, entries).count()
        ))
    out["match_captions_arrow_runs"] = runs
    _BUNDLED_YML = "/root/reference/share/sanctions.yml"
    if os.path.exists(_BUNDLED_YML):
        from perl_data_validate_sanctions_spark.sources.yaml_io import (
            load_yaml_dataset,
        )

        full_entries, _ = load_yaml_dataset(spark, _BUNDLED_YML)
        runs = []
        for _ in range(3):
            spark.sparkContext.setJobDescription("match: fulldim native")
            runs.append(timed(
                lambda: match_captions(images, full_entries).count()
            ))
        out["match_fulldim_native_runs"] = runs
        runs = []
        for _ in range(3):
            spark.sparkContext.setJobDescription("match: fulldim arrow")
            runs.append(timed(
                lambda: match_captions_arrow(images, full_entries).count()
            ))
        out["match_fulldim_arrow_runs"] = runs
    spark.sparkContext.setJobDescription(None)
    out["probe_close"] = _probe()


SECTIONS = {
    "queries": sec_queries,
    "dedup": sec_dedup,
    "phash": sec_phash,
    "integrity": sec_integrity,
    "suite": sec_suite,
    "match": sec_match,
}


def main() -> None:
    names = sys.argv[1:] or ["dedup"]
    if names == ["all"]:
        names = list(SECTIONS)
    spark = get_spark()
    for name in names:
        out: dict = {"section": name, "sf_dir": SF_DIR, "cpus": CPUS}
        t0 = time.time()
        SECTIONS[name](spark, out)
        out["section_wall"] = round(time.time() - t0, 3)
        os.makedirs("/root/repo/BENCH", exist_ok=True)
        with open(f"/root/repo/BENCH/extra_{name}.json", "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
