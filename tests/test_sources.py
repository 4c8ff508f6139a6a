"""Source/sink matrix (SURVEY.md §2.1) exercised through the package's
``sources/io.py`` helpers: CSV probe source with schema, JSON round-trip,
binary-file source, corrupt-record quarantine, partitioned write + pruning.

Mirrors the reference's IO test matrix (``tasks/common/test/test_io.py:
59-289``: iterator over dir/S3, JSON/image/bytes writers+readers) minus S3
(no network in sandbox; S3A is a URI-scheme swap in Spark).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.sources import io as src_io

SF = "/root/testdata/sf0.001"


def test_csv_probe_source_roundtrip(spark, tmp_path):
    """S7/S8: the query-point CSV source — schema-on-read, never inferred."""
    out = str(tmp_path / "probes_csv")
    prb = datagen.probes_df(spark, SF).select("probe_id", "doc_id", "source", "ts_epoch")
    src_io.write_probes_csv(prb, out)
    back = src_io.read_probes_csv(spark, out)
    assert back.count() == prb.count()
    assert back.exceptAll(prb).count() == 0 and prb.exceptAll(back).count() == 0


def test_json_roundtrip(spark, tmp_path):
    out = str(tmp_path / "seq_json")
    seq = datagen.sequences_df(spark, SF).select(
        "doc_id", "source", "seq_no", "event_epoch", "tokens"
    )
    src_io.write_sequences_json(seq, out)
    back = src_io.read_sequences_json(spark, out)
    assert back.exceptAll(seq).count() == 0 and seq.exceptAll(back).count() == 0


def test_binary_file_source(spark, tmp_path):
    """S3: opaque blob source — the image/bytes reader analog."""
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x00\x01hello")
    (d / "b.bin").write_bytes(b"world" * 100)
    df = src_io.read_binary_blobs(spark, str(d))
    rows = {r.path.split("/")[-1]: bytes(r.content) for r in df.collect()}
    assert rows["a.bin"] == b"\x00\x01hello"
    assert len(rows["b.bin"]) == 500


def test_corrupt_records_quarantined(spark, tmp_path):
    """S1: non-parseable entries are quarantined, not fatal (PERMISSIVE mode
    — the _verify_is_image analog)."""
    d = tmp_path / "jsonl"
    d.mkdir()
    (d / "part.json").write_text(
        '{"doc_id": 1, "n": 10}\nTHIS IS NOT JSON\n{"doc_id": 2, "n": 20}\n'
    )
    good, bad = src_io.read_json_with_quarantine(spark, str(d), "doc_id long, n long")
    assert good.count() == 2
    assert bad.count() == 1
    assert src_io.CORRUPT_COL not in good.columns


def test_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "ev_part")
    src_io.write_partitioned_parquet(
        spark.read.parquet(f"{SF}/events.parquet"), out, "event_type"
    )
    df = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    n_all = spark.read.parquet(f"{SF}/events.parquet").where("event_type = 'purchase'").count()
    assert df.count() == n_all


def test_pull_through_blob_cache(tmp_path):
    """S4/S5: each key is fetched from the 'remote' exactly once per cache
    dir; repeats are served locally (the image_cache pull-through analog)."""
    fetch_log = tmp_path / "fetches"
    fetch_log.mkdir()

    def fetch(key: str) -> bytes:
        (fetch_log / f"{key}.{len(list(fetch_log.iterdir()))}").touch()
        return f"blob:{key}".encode()

    cache = src_io.PullThroughBlobCache(str(tmp_path / "cache"), fetch)
    assert cache.get("a") == b"blob:a"
    assert cache.get("b") == b"blob:b"
    assert cache.get("a") == b"blob:a"  # served from cache
    assert len(list(fetch_log.iterdir())) == 2


def test_pull_through_cache_in_map_in_pandas(spark, tmp_path):
    """The cache working inside a mapInPandas stage: duplicate keys across
    rows cost one remote read per worker, not one per row."""
    import pandas as pd

    remote = tmp_path / "remote"
    remote.mkdir()
    for k in ("x", "y"):
        (remote / k).write_bytes(f"payload-{k}".encode() * 10)
    remote_dir = str(remote)
    cache_dir = str(tmp_path / "wcache")

    df = spark.createDataFrame(
        [("x",), ("y",), ("x",), ("y",), ("x",)] * 4, "blob_key string"
    ).coalesce(1)

    def stage(batches):
        cache = src_io.PullThroughBlobCache(
            cache_dir, lambda k: open(f"{remote_dir}/{k}", "rb").read()
        )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "blob_key": pdf["blob_key"],
                    "byte_len": pdf["blob_key"].map(lambda k: len(cache.get(k))).astype("int64"),
                }
            )

    out = df.mapInPandas(stage, "blob_key string, byte_len long")
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.byte_len == 90 for r in rows)
    import os
    assert len(os.listdir(cache_dir)) == 2  # one cached file per distinct key
