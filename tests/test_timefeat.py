"""Invariants for the time-axis feature operators (timefeat.py, zorder.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.timefeat import (
    lag_horizons,
    resample_locf,
    scd2_versions,
    twap,
)
from uncharted_ta1_spark.operators.zorder import morton_sql, quantize_sql


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("d1", "s", 1, 100, 10),
        ("d1", "s", 2, 160, 20),
        ("d1", "s", 3, 400, 5),
        ("d2", "s", 1, 50, 7),  # single-event group
    ]
    return spark.createDataFrame(
        rows, "doc_id string, source string, seq_no int, t long, v long"
    )


def test_scd2_intervals_partition_the_timeline(series):
    out = scd2_versions(
        series, keys=["doc_id", "source"], ts="t",
        order_tiebreak=["seq_no"], payload_cols=["v"],
    ).orderBy("doc_id", "version").collect()
    d1 = [r for r in out if r.doc_id == "d1"]
    # consecutive versions abut exactly: valid_to[k] == valid_from[k+1]
    for a, b in zip(d1, d1[1:]):
        assert a.valid_to == b.valid_from
        assert a.duration_sec == b.valid_from - a.valid_from
        assert not a.is_current
    assert d1[-1].is_current and d1[-1].valid_to == -1
    d2 = [r for r in out if r.doc_id == "d2"]
    assert len(d2) == 1 and d2[0].is_current and d2[0].version == 1


def test_twap_weights_by_holding_time(series):
    out = {
        (r.doc_id): r
        for r in twap(
            series, keys=["doc_id", "source"], ts="t",
            order_tiebreak=["seq_no"], value="v",
        ).collect()
    }
    # d1: 10 held 60s, 20 held 240s, 5 held 0s -> (600+4800)/300 = 18.0
    assert out["d1"].twap_num == 10 * 60 + 20 * 240
    assert out["d1"].span_sec == 300
    assert out["d1"].twap_value == pytest.approx(5400 / 300)
    # single observation: zero span -> NULL twap, not Inf/NaN
    assert out["d2"].span_sec == 0 and out["d2"].twap_value is None


def test_lag_horizons_single_window_sort(series):
    df = lag_horizons(
        series, keys=["doc_id", "source"], ts="t",
        order_tiebreak=["seq_no"], value="v", horizons=[1, 2],
    )
    rows = {(r.doc_id, r.seq_no): r for r in df.collect()}
    r3 = rows[("d1", 3)]
    assert (r3.lag1, r3.delta1, r3.age1_sec) == (20, -15, 240)
    assert (r3.lag2, r3.delta2, r3.age2_sec) == (10, -5, 300)
    r1 = rows[("d1", 1)]
    assert (r1.lag1, r1.delta1, r1.age1_sec) == (-1, 0, -1)
    # all horizons share ONE window sort: exactly one Window node, one Sort,
    # one Exchange (count node headers, not the spec text inside them)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE echoes both sections
    assert plan.count("Window [") == 1
    assert plan.count(" Sort [") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_resample_locf_fills_gaps_with_staleness(spark):
    df = spark.createDataFrame(
        [("d1", "s", 1, 1000, 5), ("d1", "s", 2, 3100, 9)],
        "doc_id string, source string, seq_no int, t long, v long",
    )
    out = (
        resample_locf(
            df, keys=["doc_id", "source"], ts="t",
            order_tiebreak=["seq_no"], value="v", bucket_sec=1000,
        )
        .orderBy("bucket_epoch")
        .collect()
    )
    assert [(r.bucket_epoch, r.value_filled, r.is_observed,
             r.staleness_buckets) for r in out] == [
        (1000, 5, True, 0),
        (2000, 5, False, 1),  # gap cell carries 5 forward, 1 bucket stale
        (3000, 9, True, 0),
    ]


def test_morton_quantize_shared_text_parity(spark):
    # the Spark (DIV) and DuckDB (//) texts must compute identical values
    import duckdb

    pts = [(x, y) for x in (0, 3, 7, 200, 255) for y in (0, 1, 128, 255)]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z", F.expr(morton_sql("x", "y", div="DIV"))
    ).withColumn(
        "xq", F.expr(quantize_sql("x", "0", "255", div="DIV"))
    )
    got = {(r.x, r.y): (r.z, r.xq) for r in df.collect()}
    con = duckdb.connect()
    for (x, y), (z_spark, xq_spark) in got.items():
        z_duck, xq_duck = con.execute(
            f"SELECT {morton_sql(str(x), str(y), div='//')},"
            f" {quantize_sql(str(x), '0', '255', div='//')}"
        ).fetchone()
        assert (z_spark, xq_spark) == (z_duck, xq_duck)
    # Morton locality sanity: interleave of (0,0) is 0, (255,255) is 65535
    assert got[(0, 0)][0] == 0 and got[(255, 255)][0] == 65535
