"""applyInPandasWithState: per-key state must accumulate across micro-batches
and converge to the batch groupBy result."""

from __future__ import annotations

import pyspark.sql.functions as F

from uncharted_ta1_spark.streaming.sessions import events_stream
from uncharted_ta1_spark.streaming.stateful import stateful_user_counters

SF = "/root/testdata/sf0.001"


def test_stateful_counters_match_batch(spark, tmp_path):
    src = str(tmp_path / "ev_src")
    (
        spark.read.parquet(f"{SF}/events.parquet")
        .repartition(5)
        .write.mode("overwrite")
        .parquet(src)
    )
    # one file per micro-batch → state MUST carry across batches to be right
    stream = stateful_user_counters(events_stream(spark, src, max_files_per_trigger=1))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_counters")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one row per (user, batch); the LAST emission per user
    # is the final state
    from pyspark.sql.window import Window

    emitted = spark.table("user_counters").withColumn(
        "_i", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("user_id").orderBy(F.col("_i").desc())
    final = (
        emitted.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .select("user_id", "n_events", "value_sum")
    )

    want = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
    )
    got = {r.user_id: (r.n_events, round(r.value_sum, 6)) for r in final.collect()}
    exp = {r.user_id: (r.n_events, round(r.value_sum, 6)) for r in want.collect()}
    assert set(got) == set(exp)
    for u in exp:
        assert got[u][0] == exp[u][0], u
        assert abs(got[u][1] - exp[u][1]) < 1e-4, u

    # multiple micro-batches actually happened (state was exercised)
    n_emissions = spark.table("user_counters").count()
    assert n_emissions > final.count()
