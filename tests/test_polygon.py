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


RING_SCHEMA = (
    "ring_id long, class_id long, "
    "ox1 long, oy1 long, ox2 long, oy2 long, ox3 long, oy3 long, "
    "ox4 long, oy4 long, "
    "ix1 long, iy1 long, ix2 long, iy2 long, ix3 long, iy3 long, "
    "ix4 long, iy4 long"
)


def _ring(rid, cls, cx, cy, a, b, c, d, ia, ib, ic, id_):
    return (
        rid, cls,
        cx + a, cy, cx, cy + b, cx - c, cy, cx, cy - d,
        cx + ia, cy, cx, cy + ib, cx - ic, cy, cx, cy - id_,
    )


def _pt_in_ring(ring, pt):
    vo = [(ring[2 + 2 * i], ring[3 + 2 * i]) for i in range(4)]
    vi = [(ring[10 + 2 * i], ring[11 + 2 * i]) for i in range(4)]
    in_outer = all(_cross(vo[i], vo[(i + 1) % 4], pt) >= 0 for i in range(4))
    in_inner = all(_cross(vi[i], vi[(i + 1) % 4], pt) > 0 for i in range(4))
    return in_outer and not in_inner


def test_ring_semantics_hole_and_boundaries(spark):
    from uncharted_ta1_spark.operators.polygon import ring_contain_join

    rings = [_ring(1, 0, 50, 50, 8, 8, 8, 8, 4, 4, 4, 4)]
    pts = [
        (1, 50, 50),  # dead center: in hole -> OUT
        (2, 54, 50),  # exactly ON inner boundary -> IN (ring keeps it)
        (3, 56, 50),  # in the annulus -> IN
        (4, 58, 50),  # on outer boundary vertex -> IN
        (5, 59, 50),  # outside outer -> OUT
        (6, 52, 50),  # strictly inside hole -> OUT
    ]
    rdf = spark.createDataFrame(rings, RING_SCHEMA)
    pdf = spark.createDataFrame(pts, "pt_id long, px long, py long")
    got = {r.pt_id for r in ring_contain_join(pdf, rdf, cell=16).collect()}
    assert got == {2, 3, 4}


def test_ring_degenerate_hole_is_full_quad(spark):
    from uncharted_ta1_spark.operators.polygon import ring_contain_join

    # collapsed inner (all extents 0): empty strict interior, no hole
    rings = [_ring(1, 0, 50, 50, 6, 6, 6, 6, 0, 0, 0, 0)]
    pts = [(1, 50, 50), (2, 52, 52), (3, 57, 50)]
    rdf = spark.createDataFrame(rings, RING_SCHEMA)
    pdf = spark.createDataFrame(pts, "pt_id long, px long, py long")
    got = {r.pt_id for r in ring_contain_join(pdf, rdf, cell=16).collect()}
    assert got == {1, 2}


def test_ring_matches_brute_force(spark):
    from uncharted_ta1_spark.operators.polygon import ring_contain_join

    rng = random.Random(11)
    rings = []
    for i in range(40):
        a, b, c, d = (rng.randint(1, 8) for _ in range(4))
        rings.append(
            _ring(i, 0, rng.randint(10, 90), rng.randint(10, 90),
                  a, b, c, d,
                  max(a - 2, 0), max(b - 2, 0), max(c - 2, 0), max(d - 2, 0))
        )
    pts = [(j, rng.randint(0, 100), rng.randint(0, 100)) for j in range(300)]
    rdf = spark.createDataFrame(rings, RING_SCHEMA)
    pdf = spark.createDataFrame(pts, "pt_id long, px long, py long")
    got = {
        (r.pt_id, r.ring_id)
        for r in ring_contain_join(pdf, rdf, cell=16).collect()
    }
    want = {
        (p[0], rg[0]) for rg in rings for p in pts
        if _pt_in_ring(rg, (p[1], p[2]))
    }
    assert got == want and want
    plan = ring_contain_join(pdf, rdf, cell=16)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
