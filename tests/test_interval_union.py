"""interval_union vs a brute-force sweep reference, incl. boundary cases."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from uncharted_ta1_spark.operators.intervals import interval_union


def _ref_union(intervals: list[tuple[int, int]], closed: bool) -> list[tuple[int, int, int]]:
    """(lo, hi, n_merged) per region, by sorted sweep."""
    out: list[list[int]] = []
    for lo, hi in sorted(intervals):
        joins = out and (lo <= out[-1][1] if closed else lo < out[-1][1])
        if joins:
            out[-1][1] = max(out[-1][1], hi)
            out[-1][2] += 1
        else:
            out.append([lo, hi, 1])
    return [tuple(r) for r in out]


def _run(spark, rows, closed=True):
    df = spark.createDataFrame(rows, "k string, lo long, hi long")
    got = interval_union(df, keys=["k"], lo="lo", hi="hi", closed=closed)
    res: dict[str, list] = {}
    for r in got.collect():
        res.setdefault(r.k, []).append((r.region_lo, r.region_hi, r.n_merged))
    return {k: sorted(v) for k, v in res.items()}


def test_touching_intervals_closed_vs_halfopen(spark):
    rows = [("a", 1, 5), ("a", 5, 9), ("b", 1, 5), ("b", 6, 9)]
    assert _run(spark, rows, closed=True) == {
        "a": [(1, 9, 2)],
        "b": [(1, 5, 1), (6, 9, 1)],
    }
    assert _run(spark, rows, closed=False) == {
        "a": [(1, 5, 1), (5, 9, 1)],
        "b": [(1, 5, 1), (6, 9, 1)],
    }


def test_containment_and_chains(spark):
    # an interval fully inside another, and a chain that only merges
    # transitively through its middle element
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 150, 160),
            ("a", 155, 300), ("a", 200, 210)]
    assert _run(spark, rows) == {"a": [(0, 100, 2), (150, 300, 3)]}


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_property_matches_sweep_reference(spark, raw):
    intervals = [(lo, lo + w) for lo, w in raw]
    rows = [("k", lo, hi) for lo, hi in intervals]
    got = _run(spark, rows)["k"]
    assert got == sorted(_ref_union(intervals, closed=True))
