"""grouped_mode and hll_sliding_window: the plurality aggregate must equal
the naive count-then-argmax per group (with the documented tie-break), and
the sliding-window register merge must be IDENTICAL to sketching each
window's events directly — the mergeability property that lets a 100-TB
windowed distinct run over daily partials instead of event rescans."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.aggregates import grouped_mode
from uncharted_ta1_spark.operators.sketches import (
    hll_registers,
    hll_sliding_window,
)


def _events(spark, n=4000, groups=5, values=40):
    rng = random.Random(7)
    rows = [
        (f"t{rng.randint(0, groups - 1)}", rng.randint(0, values - 1))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "etype string, v long")


def test_grouped_mode_matches_counter(spark):
    df = _events(spark)
    rows = df.collect()
    by_g: dict[str, Counter] = {}
    for r in rows:
        by_g.setdefault(r.etype, Counter())[r.v] += 1
    expect = {}
    for g, c in by_g.items():
        best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
        expect[g] = best
    got = {
        r.etype: (r.mode_value, r.mode_count)
        for r in grouped_mode(
            df, group_cols=["etype"], value_col="v"
        ).collect()
    }
    assert got == expect


def test_grouped_mode_tiebreak_smallest_value(spark):
    # two values with the same count: the smaller value must win
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("a", 2), ("a", 2), ("a", 9)],
        "etype string, v long",
    )
    [r] = grouped_mode(df, group_cols=["etype"], value_col="v").collect()
    assert (r.mode_value, r.mode_count) == (2, 2)


def _day_events(spark, n=3000, days=8, users=300):
    rng = random.Random(13)
    rows = [
        (rng.randint(0, days - 1), str(rng.randint(0, users - 1)))
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "day long, uk string")


def test_sliding_merge_equals_direct_window_sketch(spark):
    """Register mergeability: max-merge of daily partials over days
    d-2..d must be bit-identical to hll_registers run directly on the
    window's events."""
    ev = _day_events(spark)
    daily = hll_registers(ev, ["day"], "uk")
    merged, _ = hll_sliding_window(daily, day_col="day", window_days=3)
    got = {
        (r.win_day, r.bucket): r.m_reg for r in merged.collect()
    }

    days = sorted(r.day for r in ev.select("day").distinct().collect())
    expect = {}
    for d in days:
        win = ev.where((F.col("day") >= d - 2) & (F.col("day") <= d))
        direct = hll_registers(win.withColumn("w", F.lit(d)), ["w"], "uk")
        for r in direct.collect():
            expect[(d, r.bucket)] = r.m_reg
    assert got == expect


def test_sliding_merge_day_lineage(spark):
    """n_days_merged reports how many trailing daily partials each window
    actually merged (fewer at the head of the timeline / around gaps)."""
    ev = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (5, "d")], "day long, uk string"
    )
    daily = hll_registers(ev, ["day"], "uk")
    _, ndays = hll_sliding_window(daily, day_col="day", window_days=3)
    got = {r.win_day: r.n_days_merged for r in ndays.collect()}
    # day 0: only day 0; day 1: days 0,1; day 2: days 0,1,2;
    # day 5: only day 5 (days 3,4 have no partials)
    assert got == {0: 1, 1: 2, 2: 3, 5: 1}


def test_cms_daily_merge_equals_direct_window(spark):
    """CMS additive mergeability: summing per-day counters over days
    d-2..d must be bit-identical to sketching the window's counts
    directly."""
    from pyspark.sql import functions as F2
    from uncharted_ta1_spark.operators.sketches import cms_counters

    ev = _day_events(spark, n=2000, days=6, users=150)
    daily_counts = ev.groupBy("day", "uk").agg(
        F2.count(F2.lit(1)).cast("long").alias("c")
    )
    daily_ctr = cms_counters(daily_counts, word_col="uk", group_cols=["day"])
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    for d in days:
        merged = {
            (r.j, r.bucket): r.cnt
            for r in daily_ctr.where(
                (F2.col("day") >= d - 2) & (F2.col("day") <= d)
            )
            .groupBy("j", "bucket")
            .agg(F2.sum("cnt").cast("long").alias("cnt"))
            .collect()
        }
        win_counts = (
            ev.where((F2.col("day") >= d - 2) & (F2.col("day") <= d))
            .groupBy("uk")
            .agg(F2.count(F2.lit(1)).cast("long").alias("c"))
        )
        direct = {
            (r.j, r.bucket): r.cnt
            for r in cms_counters(win_counts, word_col="uk").collect()
        }
        assert merged == direct, f"window ending day {d}"
