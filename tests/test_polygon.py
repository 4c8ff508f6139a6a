"""Convex-quad predicates vs brute-force geometry (operators/polygon.py)."""

from __future__ import annotations

import random

from uncharted_ta1_spark.operators.polygon import (
    quad_contain_join,
    quad_overlap_join,
)

QUAD_SCHEMA = (
    "quad_id long, class_id long, x1 long, y1 long, x2 long, y2 long, "
    "x3 long, y3 long, x4 long, y4 long"
)


def _diamond(qid, cls, cx, cy, a, b, c, d):
    return (qid, cls, cx + a, cy, cx, cy + b, cx - c, cy, cx, cy - d)


def _cross(o, p, q):
    return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])


def _pt_in(quad, pt):
    v = [(quad[2], quad[3]), (quad[4], quad[5]), (quad[6], quad[7]), (quad[8], quad[9])]
    return all(_cross(v[i], v[(i + 1) % 4], pt) >= 0 for i in range(4))


def _overlap(qa, qb):
    va = [(qa[2], qa[3]), (qa[4], qa[5]), (qa[6], qa[7]), (qa[8], qa[9])]
    vb = [(qb[2], qb[3]), (qb[4], qb[5]), (qb[6], qb[7]), (qb[8], qb[9])]

    def separates(edges, pts):
        for i in range(4):
            o, p = edges[i], edges[(i + 1) % 4]
            if all(_cross(o, p, q) < 0 for q in pts):
                return True
        return False

    return not (separates(va, vb) or separates(vb, va))


def test_containment_matches_brute_force(spark):
    rng = random.Random(3)
    quads = [
        _diamond(i, 0, rng.randint(10, 90), rng.randint(10, 90),
                 rng.randint(1, 8), rng.randint(1, 8),
                 rng.randint(1, 8), rng.randint(1, 8))
        for i in range(40)
    ]
    pts = [(j, rng.randint(0, 100), rng.randint(0, 100)) for j in range(200)]
    qdf = spark.createDataFrame(quads, QUAD_SCHEMA)
    pdf = spark.createDataFrame(pts, "pt_id long, px long, py long")
    got = {
        (r.pt_id, r.quad_id)
        for r in quad_contain_join(pdf, qdf, cell=16).collect()
    }
    want = {
        (p[0], q[0]) for q in quads for p in pts if _pt_in(q, (p[1], p[2]))
    }
    assert got == want and want  # non-vacuous


def test_containment_boundary_inclusive(spark):
    q = [_diamond(1, 0, 50, 50, 5, 5, 5, 5)]
    # vertex, edge midpoint, inside, just outside
    pts = [(1, 55, 50), (2, 52, 52), (3, 50, 50), (4, 56, 50), (5, 53, 53)]
    qdf = spark.createDataFrame(q, QUAD_SCHEMA)
    pdf = spark.createDataFrame(pts, "pt_id long, px long, py long")
    got = {r.pt_id for r in quad_contain_join(pdf, qdf, cell=16).collect()}
    # 55,50 vertex ok; 52,52 lies ON edge x+y=105? (52+52=104 <105: inside);
    # 53,53=106 outside; 56,50 outside
    assert got == {1, 2, 3}


def test_overlap_matches_brute_force_incl_touching(spark):
    rng = random.Random(9)
    quads = [
        _diamond(i, i % 2, rng.randint(10, 60), rng.randint(10, 60),
                 rng.randint(1, 7), rng.randint(1, 7),
                 rng.randint(1, 7), rng.randint(1, 7))
        for i in range(60)
    ]
    # touching pair: diamonds meeting exactly at one vertex (100,100)
    quads.append(_diamond(100, 0, 95, 100, 5, 3, 3, 3))   # right vertex (100,100)
    quads.append(_diamond(101, 0, 105, 100, 3, 3, 5, 3))  # left vertex (100,100)
    qdf = spark.createDataFrame(quads, QUAD_SCHEMA)
    got = {
        (r.a_quad_id, r.b_quad_id)
        for r in quad_overlap_join(qdf, keys=["class_id"], cell=16).collect()
    }
    want = {
        (qa[0], qb[0])
        for i, qa in enumerate(quads)
        for qb in quads[i + 1:]
        if qa[1] == qb[1] and _overlap(qa, qb)
    }
    assert got == want
    assert (100, 101) in got  # vertex-touching counts as overlap


def test_overlap_pairs_unique_across_cells(spark):
    # one big overlapping pair spanning many cells: owner-cell dedup must
    # emit it exactly once
    quads = [
        _diamond(1, 0, 40, 40, 30, 30, 30, 30),
        _diamond(2, 0, 50, 40, 30, 30, 30, 30),
    ]
    qdf = spark.createDataFrame(quads, QUAD_SCHEMA)
    rows = quad_overlap_join(qdf, keys=["class_id"], cell=16).collect()
    assert [(r.a_quad_id, r.b_quad_id) for r in rows] == [(1, 2)]


def test_polygon_plans_no_bnl(spark):
    import re

    rng = random.Random(5)
    quads = [
        _diamond(i, 0, rng.randint(10, 90), rng.randint(10, 90), 2, 2, 2, 2)
        for i in range(10)
    ]
    pts = [(j, rng.randint(0, 100), rng.randint(0, 100)) for j in range(10)]
    qdf = spark.createDataFrame(quads, QUAD_SCHEMA)
    pdf = spark.createDataFrame(pts, "pt_id long, px long, py long")
    for df in (
        quad_contain_join(pdf, qdf, cell=16),
        quad_overlap_join(qdf, keys=["class_id"], cell=16),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
