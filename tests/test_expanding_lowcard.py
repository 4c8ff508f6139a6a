"""expanding_lowcard_sums: the two-level prefix-sum decomposition must be
bit-identical to the naive expanding window at ANY bucket granularity, and
its per-task windows must be bounded by the bucket — the scale-safe form of
Window.partitionBy(low_cardinality_key)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.operators.windows import expanding_lowcard_sums


def _naive(df, keys, ts, tiebreak, col):
    w = (
        Window.partitionBy(*keys or [F.lit(0)])
        .orderBy(F.col(ts).asc(), *[F.col(c).asc() for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.select(
        "rid",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum(col).over(w), F.lit(0)).cast("long").alias("s"),
    )


def _mkdf(spark):
    rows = []
    for i in range(500):
        # clustered timestamps with heavy ties; 3 classes; negative values
        rows.append((i, f"t{i % 3}", (i * 7) % 97 * 1000 + (i % 5), (i % 11) - 5))
    return spark.createDataFrame(rows, "rid int, cls string, ts long, v long")


def test_matches_naive_window_all_granularities(spark):
    df = _mkdf(spark)
    for div in (1, 7, 1000, 10**9):  # per-row buckets .. one giant bucket
        out = expanding_lowcard_sums(
            df, keys=["cls"], ts="ts", order_tiebreak=["rid"],
            int_cols=["v"], bucket_div=div,
        ).select("rid", F.col("prior_n").alias("n"), F.col("prior_v").alias("s"))
        want = _naive(df, ["cls"], "ts", ["rid"], "v")
        got = {r.rid: (r.n, r.s) for r in out.collect()}
        exp = {r.rid: (r.n, r.s) for r in want.collect()}
        assert got == exp, f"divergence at bucket_div={div}"


def test_global_key_empty(spark):
    df = _mkdf(spark)
    out = expanding_lowcard_sums(
        df, keys=[], ts="ts", order_tiebreak=["rid"],
        int_cols=["v"], bucket_div=5000,
    ).select("rid", F.col("prior_n").alias("n"), F.col("prior_v").alias("s"))
    want = _naive(df, [], "ts", ["rid"], "v")
    got = {r.rid: (r.n, r.s) for r in out.collect()}
    exp = {r.rid: (r.n, r.s) for r in want.collect()}
    assert got == exp


def test_negative_timestamps_floor_bucketing(spark):
    rows = [(i, (i - 10) * 3, 1) for i in range(20)]  # ts spans negatives
    df = spark.createDataFrame(rows, "rid int, ts long, v long")
    out = expanding_lowcard_sums(
        df, keys=[], ts="ts", order_tiebreak=["rid"],
        int_cols=["v"], bucket_div=7,
    ).select("rid", F.col("prior_n").alias("n"), F.col("prior_v").alias("s"))
    want = _naive(df, [], "ts", ["rid"], "v")
    assert {r.rid: (r.n, r.s) for r in out.collect()} == {
        r.rid: (r.n, r.s) for r in want.collect()
    }
