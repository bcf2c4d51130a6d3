"""Structured Streaming validation: exactly-once file pickup across
restarts (the reference's mtime/updated refresh gate, U2/U3) and
windowed mix monitoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from perl_data_validate_sanctions_spark.sources.synth import (
    synth_entries,
    synth_images,
)
from perl_data_validate_sanctions_spark.streaming.stream_validate import (
    validate_stream,
    windowed_type_counts,
)


def test_stream_validate_incremental(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    input_dir = str(base / "in")
    ckpt = str(base / "ckpt")
    out = str(base / "violations")

    entries = synth_entries(spark, n_extra=10)
    checks = ("schema", "unique_image_id", "sanctioned")

    # first drop of files
    synth_images(spark, 4000, num_partitions=2).write.mode("append").parquet(
        input_dir
    )
    q = validate_stream(spark, input_dir, ckpt, out, entries=entries,
                        checks=checks)
    q.awaitTermination(300)
    v1 = spark.read.parquet(out)
    n1 = v1.count()
    assert n1 > 0
    epochs1 = {r["epoch_id"] for r in v1.select("epoch_id").distinct().collect()}

    # restart with NO new files → nothing reprocessed
    q = validate_stream(spark, input_dir, ckpt, out, entries=entries,
                        checks=checks)
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1

    # new file lands → only the delta is validated
    synth_images(spark, 2000, num_partitions=1).select(
        F.concat(F.lit("new-"), F.col("image_id")).alias("image_id"),
        "bytes", "w", "h", "fmt", "caption", "phash",
    ).write.mode("append").parquet(input_dir)
    q = validate_stream(spark, input_dir, ckpt, out, entries=entries,
                        checks=checks)
    q.awaitTermination(300)
    v3 = spark.read.parquet(out)
    assert v3.count() > n1
    new_rows = v3.filter(~F.col("epoch_id").isin(*epochs1))
    # every row from the new epoch belongs to the new file ('new-' ids
    # fail the schema pattern, proving only the delta was scanned)
    ids = [r["image_id"] for r in new_rows.select("image_id").collect()
           if r["image_id"] is not None]
    assert ids and all(i.startswith("new-") for i in ids)


def test_windowed_type_counts_stream_batch_parity(spark, tmp_path_factory):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = {
        (r["window_start"], r["value"]): r["n"]
        for r in windowed_type_counts(events).collect()
    }
    assert batch and all(n > 0 for n in batch.values())

    # same query as a real stream (file source needs a directory)
    src_dir = str(tmp_path_factory.mktemp("events_stream"))
    events.write.mode("overwrite").parquet(src_dir)
    stream_src = spark.readStream.schema(events.schema).parquet(src_dir)
    q = (
        windowed_type_counts(stream_src)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r["window_start"], r["value"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert streamed == batch
