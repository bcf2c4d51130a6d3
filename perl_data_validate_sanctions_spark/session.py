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
        # Fewer, larger scan tasks: the validation suite runs ~10
        # concurrent jobs whose aggregate tasks keep every slot busy, so
        # per-job scan parallelism can be coarse — and the driver's
        # task-event/scheduling volume (the measured serial component of
        # suite wall: ~26 s at 4.8M rows with 128m splits, ~12 s at
        # 512m) scales with task count. Measured at 2.4M rows/32c:
        # 19.5 s (128m) → 16.0 s (512m), neutral at 600k rows.
        .config("spark.sql.files.maxPartitionBytes", "536870912")
        # FAIR lets the many small stages of light checks interleave
        # with the long mapInPandas stages instead of queuing behind
        # them (measured 16.0 → 14.4 s at 2.4M rows/32c).
        .config("spark.scheduler.mode", "FAIR")
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
