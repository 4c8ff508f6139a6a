"""DQ constraint report + EB beta-binomial smoothing vs python models."""

from __future__ import annotations


def test_dq_constraint_report_hand_fixture(spark):
    from uncharted_ta1_spark.operators.audit import dq_constraint_report

    events = spark.createDataFrame(
        [
            (1, "2024-01-02 00:00:00", 1, "click", 5.0, '{"k":1}'),
            (1, "2024-01-02 00:00:01", 2, "view", -3.0, None),  # dup id, neg val
            (2, "2023-12-31 23:59:59", 3, "bogus", 1500.0, '{"k":2}'),  # pre-floor
            (3, "2024-01-03 00:00:00", 4, "error", 0.0, '{"k":3}'),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props"
    )
    orders = spark.createDataFrame([(10,), (11,)], "o_orderkey long")
    lineitem = spark.createDataFrame(
        [(10,), (10,), (99,)], "l_orderkey long"  # one orphan key
    )
    got = {
        r.constraint_name: r
        for r in dq_constraint_report(events, orders, lineitem).collect()
    }
    assert len(got) == 6
    assert (got["completeness_events_props"].n_violations, got["completeness_events_props"].n_checked) == (1, 4)
    assert got["uniqueness_events_event_id"].n_violations == 1
    assert got["range_events_value_0_1000"].n_violations == 2  # -3 and 1500
    assert got["set_events_event_type"].n_violations == 1  # bogus
    assert got["floor_events_ts_epoch0"].n_violations == 1  # 2023-12-31
    r = got["referential_lineitem_orderkey"]
    assert (r.n_checked, r.n_violations, bool(r.passed)) == (3, 1, False)
    assert not any(r.passed for r in got.values() if r.n_violations > 0)


def test_eb_smoothed_rate_matches_python(spark):
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.operators.ebayes import MICRO, eb_smoothed_rate

    rows = []
    # entity u: n events, k clicks — varied rates so the MoM prior exists
    spec = {1: (10, 3), 2: (4, 0), 3: (20, 15), 4: (2, 1), 5: (8, 2)}
    for u, (n, k) in spec.items():
        rows += [(u, "click" if i < k else "view") for i in range(n)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = (
        eb_smoothed_rate(df, key="user_id", hit=F.col("event_type") == "click")
        .toPandas()
        .set_index("user_id")
    )
    r_micro = {u: (k * MICRO) // n for u, (n, k) in spec.items()}
    nk = len(spec)
    s1 = sum(r_micro.values())
    s2 = sum(v * v for v in r_micro.values())
    m = s1 / nk / MICRO
    v = (s2 / nk - (s1 / nk) * (s1 / nk)) / (MICRO * MICRO)
    assert v > 0.0 and m * (1.0 - m) > v  # fixture must hit the fit branch
    common = m * (1.0 - m) / v - 1.0
    for u, (n, k) in spec.items():
        r = got.loc[u]
        assert (r.n, r.hits, r.r_micro, r.n_keys) == (n, k, r_micro[u], nk)
        assert r.raw_rate == round(k / n, 9)
        assert r.alpha == round(m * common, 9) + 0.0
        assert r.beta == round((1.0 - m) * common, 9) + 0.0
        assert r.smoothed_rate == round((k + m * common) / (n + common), 9) + 0.0
        # shrinkage direction: smoothed lies between raw and the prior mean
        lo, hi = sorted((k / n, m))
        assert lo - 1e-9 <= r.smoothed_rate <= hi + 1e-9


def test_eb_degenerate_population_falls_back_to_raw(spark):
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.operators.ebayes import eb_smoothed_rate

    # every entity has the same rate -> v = 0 -> NULL prior, raw passthrough
    rows = [(u, t) for u in (1, 2, 3) for t in ("click", "view")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = eb_smoothed_rate(
        df, key="user_id", hit=F.col("event_type") == "click"
    ).toPandas()
    assert got.alpha.isna().all()
    assert (got.smoothed_rate == got.raw_rate).all()
