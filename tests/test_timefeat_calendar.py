"""Calendar encodings + rolling slope vs pure-python models."""

from __future__ import annotations

import math


def test_trig_domain_is_9dp_boundary_safe(spark):
    """Exhaustive check of every value the cyclical encodings can take:
    the JVM's sin/cos and DuckDB's must round identically at 9 dp on
    this <=24-value integer domain (ulp differences cannot straddle a
    rounding boundary here — this test is the proof)."""
    import duckdb

    from pyspark.sql import functions as F

    two_pi = 6.283185307179586
    rows = [(h, d) for h in range(24) for d in range(7)]
    df = spark.createDataFrame(rows, "hour_of_day long, day_of_week long")
    got = (
        df.select(
            "hour_of_day",
            "day_of_week",
            F.expr(
                f"round(sin({two_pi} * CAST(hour_of_day AS DOUBLE) / 24.0), 9) + 0.0"
            ).alias("hs"),
            F.expr(
                f"round(cos({two_pi} * CAST(hour_of_day AS DOUBLE) / 24.0), 9) + 0.0"
            ).alias("hc"),
            F.expr(
                f"round(sin({two_pi} * CAST(day_of_week AS DOUBLE) / 7.0), 9) + 0.0"
            ).alias("ds"),
            F.expr(
                f"round(cos({two_pi} * CAST(day_of_week AS DOUBLE) / 7.0), 9) + 0.0"
            ).alias("dc"),
        )
        .toPandas()
        .set_index(["hour_of_day", "day_of_week"])
        .sort_index()
    )
    con = duckdb.connect()
    duck = (
        con.sql(
            "SELECT h AS hour_of_day, d AS day_of_week, "
            f"round(sin({two_pi} * CAST(h AS DOUBLE) / 24.0), 9) + 0.0 AS hs, "
            f"round(cos({two_pi} * CAST(h AS DOUBLE) / 24.0), 9) + 0.0 AS hc, "
            f"round(sin({two_pi} * CAST(d AS DOUBLE) / 7.0), 9) + 0.0 AS ds, "
            f"round(cos({two_pi} * CAST(d AS DOUBLE) / 7.0), 9) + 0.0 AS dc "
            "FROM (SELECT unnest(range(24)) AS h), (SELECT unnest(range(7)) AS d)"
        )
        .df()
        .set_index(["hour_of_day", "day_of_week"])
        .sort_index()
    )
    for col in ("hs", "hc", "ds", "dc"):
        assert (got[col].values == duck[col].values).all(), col


def test_calendar_features_match_python(spark):
    from uncharted_ta1_spark.operators.timefeat import calendar_features

    rows = [
        ("doc_0", "s", 0, 1704067200),  # 2024-01-01 00:00 UTC, a Monday
        ("doc_0", "s", 1, 1704067200 + 3600 * 13 + 59),
        ("doc_1", "s", 0, 1704067200 + 86400 * 5 + 3600 * 23),  # Saturday 23h
        ("doc_1", "t", 2, 1704067200 + 86400 * 6),  # Sunday
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq_no int, event_epoch long"
    )
    got = calendar_features(df).toPandas().set_index(["doc_id", "source", "seq_no"])
    two_pi = 6.283185307179586
    for doc_id, source, seq_no, ep in rows:
        r = got.loc[(doc_id, source, seq_no)]
        hour = (ep // 3600) % 24
        dow = (ep // 86400 + 4) % 7
        assert r.hour_of_day == hour and r.day_of_week == dow
        assert bool(r.is_weekend) == (dow in (0, 6))
        assert r.hour_sin == round(math.sin(two_pi * hour / 24.0), 9) + 0.0
        assert r.dow_cos == round(math.cos(two_pi * dow / 7.0), 9) + 0.0
    # fixture covers Monday, weekend Saturday and Sunday
    assert got.day_of_week.isin([1]).any() and got.is_weekend.sum() == 2


def test_rolling_slope_matches_python(spark):
    from uncharted_ta1_spark.operators.timefeat import rolling_slope

    rows = [
        ("A", "s", 0, 1704067200, 10),
        ("A", "s", 1, 1704067260, 20),
        ("A", "s", 2, 1704067320, 25),
        ("A", "s", 3, 1704067320, 25),  # duplicate ts: tiebreak by seq
        ("A", "s", 4, 1704070000, 5),
        ("B", "s", 0, 1704067200, 7),  # single row: den = 0 -> NULL slope
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, source string, seq_no int, event_epoch long, n_tok long",
    )
    got = (
        rolling_slope(df, keys=["doc_id", "source"], window=3)
        .toPandas()
        .set_index(["doc_id", "seq_no"])
    )
    hist = {}
    for doc, src, seq, ep, v in rows:
        hist.setdefault(doc, []).append((ep - 1704067200, v))
    for doc, src, seq, ep, v in rows:
        frame = hist[doc][max(0, seq - 2) : seq + 1]
        k = len(frame)
        sx = sum(x for x, _ in frame)
        sy = sum(y for _, y in frame)
        sxy = sum(x * y for x, y in frame)
        sxx = sum(x * x for x, _ in frame)
        num, den = k * sxy - sx * sy, k * sxx - sx * sx
        r = got.loc[(doc, seq)]
        assert (r.n_window, r.slope_num, r.slope_den) == (k, num, den), (doc, seq)
        if den == 0:
            assert r.slope is None or r.slope != r.slope  # NULL/NaN
        else:
            assert r.slope == round(num / den, 9) + 0.0
    # the fixture must exercise a negative trend and the den=0 edge
    assert (got.slope.dropna() < 0).any()
    assert got.slope_den.eq(0).any()
