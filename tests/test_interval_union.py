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


def _run_rects(spark, rows, cell=8):
    from uncharted_ta1_spark.operators.intervals import rect_union

    df = spark.createDataFrame(
        rows, "class_id long, rect_id long, x0 long, y0 long, x1 long, y1 long"
    )
    got = rect_union(df, keys=["class_id"], cell=cell)
    out: dict[tuple, tuple] = {}
    for r in got.collect():
        out[(r.class_id, r.region_id)] = (
            r.region_x0, r.region_y0, r.region_x1, r.region_y1, r.n_merged
        )
    return out


def test_rect_union_transitive_chain_and_singletons(spark):
    rows = [
        # chain: A-B overlap, B-C overlap, A-C do NOT -> one 3-rect region
        (1, 10, 0, 0, 10, 10),
        (1, 11, 8, 8, 20, 20),
        (1, 12, 18, 18, 30, 30),
        # far-away singleton
        (1, 13, 100, 100, 105, 105),
        # same coords as the chain but another class: isolated
        (2, 14, 0, 0, 10, 10),
    ]
    out = _run_rects(spark, rows)
    assert out[(1, 10)] == (0, 0, 30, 30, 3)
    assert out[(1, 13)] == (100, 100, 105, 105, 1)
    assert out[(2, 14)] == (0, 0, 10, 10, 1)
    assert len(out) == 3


def test_rect_union_touching_edges_merge_across_cells(spark):
    # share only the x=16 edge, and straddle several 8-px grid cells — the
    # owner-cell rule must emit the pair exactly once
    rows = [(1, 1, 0, 0, 16, 40), (1, 2, 16, 0, 33, 40)]
    out = _run_rects(spark, rows)
    assert out == {(1, 1): (0, 0, 33, 40, 2)}


def _ref_rect_union(rects):
    """Brute-force union-find over the closed-overlap graph; returns the
    multiset of (x0, y0, x1, y1, n) covering regions."""
    parent = list(range(len(rects)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            a, b = rects[i], rects[j]
            if a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]:
                parent[find(i)] = find(j)
    groups: dict[int, list] = {}
    for i, r in enumerate(rects):
        groups.setdefault(find(i), []).append(r)
    out = []
    for g in groups.values():
        out.append((
            min(r[0] for r in g), min(r[1] for r in g),
            max(r[2] for r in g), max(r[3] for r in g), len(g),
        ))
    return sorted(out)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 40), st.integers(0, 40),
            st.integers(0, 12), st.integers(0, 12),
        ),
        min_size=1,
        max_size=18,
    )
)
def test_rect_union_property_matches_union_find(spark, raw):
    rects = [(x, y, x + w, y + h) for x, y, w, h in raw]
    rows = [(1, i, *r) for i, r in enumerate(rects)]
    got = sorted(v for v in _run_rects(spark, rows, cell=8).values())
    assert got == _ref_rect_union(rects)


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
