"""Streaming semantics: session_window aggregation equals the batch gap
sessionizer; incremental file arrival reproduces the all-at-once result;
poison rows land in quarantine, never in the good sink."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.operators.sessionize import session_aggs, sessionize
from uncharted_ta1_spark.streaming.sessions import (
    events_stream,
    quarantine_foreach_batch,
    run_available_now,
    sessionized_stream,
)

SF = "/root/testdata/sf0.001"
GAP_US = 1_800_000_000


def _stage_events(spark, tmp_path, n_files: int) -> str:
    src = str(tmp_path / "events_src")
    (
        spark.read.parquet(f"{SF}/events.parquet")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src)
    )
    return src


def _batch_golden(spark):
    ev = datagen.events_epoch_df(spark, SF)
    sess = sessionize(ev, keys=["user_id"], ts="ts_us", gap=GAP_US)
    per = session_aggs(sess, keys=["user_id"], ts="ts_us", agg_cols={"value": "sum"})
    return per.select(
        "user_id", "session_len", "session_sum_value", "session_start"
    ).toPandas().sort_values(["user_id", "session_start"]).reset_index(drop=True)


def test_session_window_equals_batch(spark, tmp_path):
    src = _stage_events(spark, tmp_path, 4)
    stream = sessionized_stream(events_stream(spark, src), gap="30 minutes")
    run_available_now(stream, checkpoint_dir=str(tmp_path / "ckpt"), query_name="s1")
    got = (
        spark.table("s1")
        .select(
            "user_id",
            "session_len",
            "session_sum_value",
            F.unix_micros(F.col("first_event_time")).alias("session_start"),
        )
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = _batch_golden(spark)
    assert len(got) == len(want)
    assert (got.user_id.values == want.user_id.values).all()
    assert (got.session_len.values == want.session_len.values).all()
    assert (got.session_start.values == want.session_start.values).all()
    assert abs(got.session_sum_value.values - want.session_sum_value.values).max() < 1e-6


def test_incremental_arrival_same_result(spark, tmp_path):
    """maxFilesPerTrigger=1 (prefetch-1 analog): many micro-batches must
    converge to the same session table as one big batch."""
    src = _stage_events(spark, tmp_path, 6)
    # files arrive in arbitrary (not time) order: the watermark must span the
    # replay window or genuinely-late rows are dropped (correct streaming
    # semantics, but this test asserts equality with the batch result)
    stream = sessionized_stream(
        events_stream(spark, src, max_files_per_trigger=1),
        gap="30 minutes",
        watermark="60 days",
    )
    run_available_now(stream, checkpoint_dir=str(tmp_path / "ckpt2"), query_name="s2")
    got = spark.table("s2").agg(
        F.sum("session_len").alias("n"), F.count(F.lit(1)).alias("k")
    ).collect()[0]
    want = _batch_golden(spark)
    assert got.n == int(want.session_len.sum())
    assert got.k == len(want)


def test_quarantine_split(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    good_dir = str(tmp_path / "good")
    bad_dir = str(tmp_path / "bad")

    def good_writer(df, _):
        df.write.mode("append").parquet(good_dir)

    def bad_writer(df, _):
        df.write.mode("append").parquet(bad_dir)

    fn = quarantine_foreach_batch(good_writer, bad_writer, F.col("value") >= 1.0)
    fn(ev, 0)  # exercise the splitter on a batch directly
    good = spark.read.parquet(good_dir)
    bad = spark.read.parquet(bad_dir)
    assert good.count() + bad.count() == ev.count()
    assert good.where("value < 1.0").count() == 0
    assert bad.where("value >= 1.0").count() == 0
    shutil.rmtree(good_dir, ignore_errors=True)
