"""SparkSession builder tuned for this engine.

Defaults target local[N] testing but every knob is chosen for the
1000-executor / 100 TB case too: AQE on (runtime skew-join + partition
coalescing), Arrow on (all Python boundaries are Arrow batches), UTC
session time (the reference computes all epochs at UTC midnight —
/root/reference/lib/Data/Validate/Sanctions/Fetcher.pm:124-141), ANSI off
(invalid dates must yield NULL, not errors, matching the reference's
``eval { ... } // undef`` behavior).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pdvs-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores``: int N -> ``local[N]``; "*" -> all; None -> env
    ``SPARK_GRAFT_CPUS`` or "*".
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores in ("*",) else max(int(cores), 4)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # invalid date components must produce NULL (reference returns
        # undef on unparseable dates), not raise:
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PDVS_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
