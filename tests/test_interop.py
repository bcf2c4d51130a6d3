"""Interop + stateful streaming: the reference's bundled YAML dataset
loads directly and reproduces the reference's own top-level test
verdicts (t/01_basic.t:14-16, t/03_oo.t:15-33); zip source; stateful
cross-batch dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

REFERENCE_YML = "/root/reference/share/sanctions.yml"


@pytest.fixture(scope="module")
def bundled(spark):
    from perl_data_validate_sanctions_spark.sources.yaml_io import (
        load_yaml_dataset,
    )

    entries, meta = load_yaml_dataset(spark, REFERENCE_YML)
    return entries.cache(), meta


def test_bundled_yaml_loads(spark, bundled):
    entries, meta = bundled
    # four sources, 15,664 entries (share/sanctions.yml, SURVEY §1.1)
    assert entries.count() == 15664
    assert set(meta) == {
        "EU-Sanctions", "HMT-Sanctions", "OFAC-Consolidated", "OFAC-SDN",
    }
    assert all("updated" in m for m in meta.values())


def test_reference_verdicts_on_bundled_data(spark, bundled):
    """The reference's own assertions against its bundled list."""
    from perl_data_validate_sanctions_spark.api import SanctionsValidator

    entries, _ = bundled
    v = SanctionsValidator(spark, entries=entries)

    # t/01_basic.t:14 / t/03_oo.t:15
    assert v.is_sanctioned("NEVEROV", "Sergei Ivanovich", -253411200) == 1
    # t/03_oo.t:21
    assert v.is_sanctioned("chris", "down") == 0
    # t/03_oo.t:23-24
    assert v.get_sanctioned_info("ABBATTAY", "Mohamed", 174614567)["matched"] == 0
    # t/03_oo.t:16-19
    r = v.get_sanctioned_info("abu", "usama", -306028800)
    assert r["matched"] == 1
    assert r["matched_args"]["dob_epoch"] == -306028800
    n = r["matched_args"]["name"].lower()
    assert "abu" in n and "usama" in n
    # t/03_oo.t:26-27 — matched because the entry carries dob_text
    assert v.get_sanctioned_info("Ali", "Abu")["matched"] == 1
    # t/03_oo.t:29-32
    r = v.get_sanctioned_info("Abu", "Salem", "1948-10-10")
    assert r["matched"] == 1
    assert r["matched_args"]["dob_year"] == 1948
    n = r["matched_args"]["name"].lower()
    assert "abu" in n and "salem" in n


def test_yaml_roundtrip(spark, bundled, tmp_path_factory):
    from perl_data_validate_sanctions_spark.sources.yaml_io import (
        load_yaml_dataset,
        save_yaml_dataset,
    )

    entries, meta = bundled
    subset = entries.filter(F.col("entry_id") < 50)
    path = str(tmp_path_factory.mktemp("yml") / "out.yml")
    save_yaml_dataset(subset, meta, path)
    back, meta2 = load_yaml_dataset(spark, path)
    assert back.count() == subset.count()
    a = {tuple(r["names"]) for r in subset.select("names").collect()}
    b = {tuple(r["names"]) for r in back.select("names").collect()}
    assert a == b


def test_ofac_zip_source(spark, tmp_path_factory):
    import zipfile

    from perl_data_validate_sanctions_spark.sources.parsers import (
        parse_ofac_xml_zip,
    )

    zpath = str(tmp_path_factory.mktemp("zip") / "sdn.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write("/root/repo/tests/data/ofac.xml", "sdn.xml")
    updated, df = parse_ofac_xml_zip(spark, zpath)
    assert df.count() == 2
    assert updated is not None


def test_stateful_stream_dedup(spark, tmp_path_factory):
    from perl_data_validate_sanctions_spark.schema import IMAGES_SCHEMA
    from perl_data_validate_sanctions_spark.sources.synth import synth_images
    from perl_data_validate_sanctions_spark.streaming.stateful_dedup import (
        stream_dedup_image_ids,
    )

    base = tmp_path_factory.mktemp("sdedup")
    in_dir, ckpt = str(base / "in"), str(base / "ckpt")
    out_dir = str(base / "out")

    def run_once():
        stream = spark.readStream.schema(IMAGES_SCHEMA).parquet(in_dir)
        before = set()
        try:
            before = {
                r["image_id"]
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            pass
        q = (
            stream_dedup_image_ids(stream, n_shards=8)
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        after = {
            r["image_id"] for r in spark.read.parquet(out_dir).collect()
        }
        return after - before

    first = synth_images(spark, 3000, num_partitions=1)
    first.write.mode("append").parquet(in_dir)
    seen1 = run_once()
    expected1 = {r["image_id"] for r in first.select("image_id").collect()}
    assert seen1 == expected1  # within-batch dups collapse too

    # second drop overlaps the first → only genuinely-new ids emitted
    second = synth_images(spark, 5000, num_partitions=1)
    second.write.mode("append").parquet(in_dir)
    seen2 = run_once()
    expected_new = {
        r["image_id"] for r in second.select("image_id").collect()
    } - expected1
    assert seen2 == expected_new
    assert seen2 and not (seen2 & seen1)


def test_stream_phash_near_dup_flags(spark, tmp_path_factory):
    """Cross-batch image NEAR-dup detection: a noisy variant arriving
    in a LATER micro-batch is flagged against the clean image seen in
    an earlier one (pigeonhole state per block bucket); unrelated
    images are never flagged. Restart replays stay idempotent via the
    known-id skip."""
    import numpy as np  # noqa: F401

    from perl_data_validate_sanctions_spark.streaming.stateful_dedup import (
        stream_phash_near_dup_flags,
    )

    base = tmp_path_factory.mktemp("sphash")
    in_dir, ckpt = str(base / "in"), str(base / "ckpt")
    out_dir = str(base / "out")
    schema = "image_id string, bytes binary"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            stream_phash_near_dup_flags(stream, max_hamming=6)
            .writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        try:
            return {
                (r["image_id"], r["matched_id"])
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            return set()

    def payload(seed, amp):
        return bytearray(f"PDVS1|png|64|48|{seed}|{amp}".encode())

    # batch 1: clean originals only
    first = [(f"spc-{i}", payload(52000 + 307 * i, 0)) for i in range(5)]
    spark.createDataFrame(first, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    assert run_once() == set()  # nothing to match yet

    # batch 2: amp-8 noisy variants of two originals + one unrelated
    second = [
        ("spc-noisy-0", payload(52000, 8)),
        ("spc-noisy-3", payload(52000 + 307 * 3, 8)),
        ("spc-unrelated", payload(99991, 0)),
    ]
    spark.createDataFrame(second, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    pairs = run_once()
    assert ("spc-noisy-0", "spc-0") in pairs, pairs
    assert ("spc-noisy-3", "spc-3") in pairs, pairs
    flagged = {a for a, _ in pairs} | {b for _, b in pairs}
    assert "spc-unrelated" not in flagged
