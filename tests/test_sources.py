"""Source/sink matrix (SURVEY.md §2.1): CSV probe source with schema,
JSON round-trip, binary-file source, corrupt-record tolerance, partitioned
write + partition pruning.

Mirrors the reference's IO test matrix (``tasks/common/test/test_io.py:
59-289``: iterator over dir/S3, JSON/image/bytes writers+readers) minus S3
(no network in sandbox; S3A is a URI-scheme swap in Spark).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from uncharted_ta1_spark import datagen

SF = "/root/testdata/sf0.001"


def test_csv_probe_source_roundtrip(spark, tmp_path):
    """S7: the query-point CSV source — schema-on-read, bounds-check join."""
    out = str(tmp_path / "probes_csv")
    prb = datagen.probes_df(spark, SF).select("probe_id", "doc_id", "source", "ts_epoch")
    prb.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "probe_id string, doc_id string, source string, ts_epoch long"
    ).option("header", True).csv(out)
    assert back.count() == prb.count()
    assert back.exceptAll(prb).count() == 0 and prb.exceptAll(back).count() == 0


def test_json_roundtrip(spark, tmp_path):
    out = str(tmp_path / "seq_json")
    seq = datagen.sequences_df(spark, SF).select("doc_id", "source", "seq_no", "event_epoch", "tokens")
    seq.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "doc_id string, source string, seq_no int, event_epoch long, tokens array<int>"
    ).json(out)
    assert back.exceptAll(seq).count() == 0 and seq.exceptAll(back).count() == 0


def test_binary_file_source(spark, tmp_path):
    """S3: opaque blob source — the image/bytes reader analog."""
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x00\x01hello")
    (d / "b.bin").write_bytes(b"world" * 100)
    df = spark.read.format("binaryFile").load(str(d))
    rows = {r.path.split("/")[-1]: bytes(r.content) for r in df.collect()}
    assert rows["a.bin"] == b"\x00\x01hello"
    assert len(rows["b.bin"]) == 500


def test_corrupt_records_skipped(spark, tmp_path):
    """S1: non-parseable entries are skipped, not fatal (PERMISSIVE mode —
    the _verify_is_image analog)."""
    d = tmp_path / "jsonl"
    d.mkdir()
    (d / "part.json").write_text(
        '{"doc_id": 1, "n": 10}\nTHIS IS NOT JSON\n{"doc_id": 2, "n": 20}\n'
    )
    df = (
        spark.read.schema("doc_id long, n long, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(str(d))
        .cache()  # Spark disallows filtering on ONLY the corrupt column of a raw scan
    )
    good = df.where(F.col("_corrupt").isNull())
    bad = df.where(F.col("_corrupt").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1


def test_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "ev_part")
    spark.read.parquet(f"{SF}/events.parquet").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    df = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    n_all = spark.read.parquet(f"{SF}/events.parquet").where("event_type = 'purchase'").count()
    assert df.count() == n_all
