"""spark-submit driver script — the north rule's launch shape, for real.

    spark-submit --master <cluster> --py-files pdvs.zip \
        scripts/submit_job.py --input /data/images.parquet \
        --sink-dir /data/report [--match-strategy auto]

Unlike the local CLI (perl_data_validate_sanctions_spark/cli.py, which
builds its own local[N] session), this script takes NO master or
session config of its own: the SparkSession comes entirely from
spark-submit's conf, exactly as on a multi-executor cluster, and the
package must be importable from ``--py-files`` (driver AND python
workers — the integrity/drift checks run mapInPandas stages).
Exercised end-to-end by tests/test_spark_submit.py, which zips the
package, launches THIS script through the real spark-submit binary
from a neutral working directory, and asserts the written report
tables. Reference analog: bin/update_sanctions_csv is the reference's
batch entry; its xt/20_update.t asserts the written artifact.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pdvs-submit")
    ap.add_argument("--input", default=None,
                    help="images parquet path (alternative: --synth-rows)")
    ap.add_argument("--synth-rows", type=int, default=None,
                    help="generate a synthetic table instead of --input")
    ap.add_argument("--sink-dir", required=True,
                    help="where violations/partition_verdicts/check_summary "
                         "parquet tables land")
    ap.add_argument("--match-strategy", default="auto",
                    choices=("auto", "arrow", "native"))
    ap.add_argument("--pixel-sample", type=int, default=4096)
    args = ap.parse_args(argv)
    if not args.input and not args.synth_rows:
        ap.error("one of --input / --synth-rows is required")

    from pyspark.sql import SparkSession

    # conf (master, executor topology, --py-files) comes from submit
    spark = SparkSession.builder.appName("pdvs-submit").getOrCreate()

    from perl_data_validate_sanctions_spark.plans.runner import (
        run_validation,
    )
    from perl_data_validate_sanctions_spark.sources.synth import (
        PLACES,
        synth_entries,
        synth_images,
    )

    if args.input:
        images = spark.read.parquet(args.input)
    else:
        images = synth_images(spark, args.synth_rows, num_partitions=8)
    entries = synth_entries(spark, n_extra=30)
    ref_keys = spark.createDataFrame([(p,) for p in PLACES], "key string")

    report = run_validation(
        images,
        entries=entries,
        ref_keys=ref_keys,
        match_strategy=args.match_strategy,
        pixel_sample=args.pixel_sample,
        with_stats=False,
        sink_dir=args.sink_dir,
    )
    summary = {
        r["check"]: r["n_violations"] for r in report.check_summary.collect()
    }
    verdicts = report.partition_verdicts.collect()
    print(json.dumps({
        "n_rows": sum(r["n_rows"] for r in verdicts),
        "n_partitions": len(verdicts),
        "n_failed_partitions": sum(1 for r in verdicts if not r["passed"]),
        "summary": summary,
        "sink_dir": args.sink_dir,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
