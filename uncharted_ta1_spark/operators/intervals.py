"""Union of overlapping intervals per key — the merge half of F6.

Reference analog: ``tasks/segmentation/denoise_segments.py:18-110`` filters
segments by per-class confidence, then merges overlapping polygons of the
same class into one region.  The 1-D recast: per (key, class), intervals
that overlap (or touch) collapse to their covering interval.

Spark-first shape: sort-within-key + gap-cumsum — the same machinery as gap
sessionization (sessionize.py), with the gap predicate generalized from
"time since previous event" to "does this interval start after everything
seen so far ends" (a running max over interval ends, not a lag).  One window
sort per key partition, one hash aggregate; no self-join, no cartesian —
at 10^12 intervals this is a single shuffle keyed by (key, class), and a
skewed hot key delegates to the same salting/bucketing strategy as the
sessionizer.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_union(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    lo: str = "lo",
    hi: str = "hi",
    order_tiebreak: Sequence[str] = (),
    closed: bool = True,
) -> DataFrame:
    """Merge overlapping intervals per key.

    ``closed=True`` treats touching intervals ([1,5],[5,9]) as overlapping
    (union semantics on closed intervals); ``closed=False`` keeps them
    separate (half-open semantics).

    Output: one row per merged region — keys + (region_id, region_lo,
    region_hi, n_merged), deterministic for any input order.
    """
    order = [F.col(lo).asc(), F.col(hi).asc()] + [
        F.col(c).asc() for c in order_tiebreak
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_max_hi = F.max(F.col(hi)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    gap = F.col(lo) > prev_max_hi if closed else F.col(lo) >= prev_max_hi
    new_region = (
        F.when(prev_max_hi.isNull(), F.lit(0))
        .when(gap, F.lit(1))
        .otherwise(F.lit(0))
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    regions = df.withColumn(
        "region_id", F.sum(new_region).over(wrun).cast("long")
    )
    return regions.groupBy(*keys, "region_id").agg(
        F.min(F.col(lo)).cast("long").alias("region_lo"),
        F.max(F.col(hi)).cast("long").alias("region_hi"),
        F.count(F.lit(1)).cast("long").alias("n_merged"),
    )


def rect_union(
    rects: DataFrame,
    *,
    keys: Sequence[str] = ("class_id",),
    cell: int = 8,
) -> DataFrame:
    """2-D region union: overlapping-or-touching axis-aligned rectangles of
    the same key merge TRANSITIVELY into regions — the 2-D half of the
    segment-denoise merge (``denoise_segments.py:18-110`` unions polygons;
    here the shapes are integer bboxes and the output is each region's
    covering bbox + member count).

    Unlike the 1-D case, 2-D overlap is not a sortable relation, so the
    sweep trick doesn't apply.  Scale shape instead:

      1. grid-bucket candidate pairs — each rect explodes to the ``cell``-
         sized grid cells it covers; only rects sharing a cell are compared,
         so cost is per-cell density squared, never corpus all-pairs;
      2. owner-cell dedup — a pair overlapping N cells is emitted only from
         the cell containing the overlap's min corner (an arithmetic
         predicate, cheaper than a pair-level distinct shuffle);
      3. transitive closure via star-contraction connected components
         (operators/components.py — the same machinery as dup clusters);
      4. one groupBy for the per-region covering bbox.

    Requires non-negative integer coordinates and globally unique
    ``rect_id`` (vertex ids for the component step).
    """
    from uncharted_ta1_spark.operators.components import connected_components

    keys = list(keys)
    g = F.lit(cell)

    def cdiv(c):
        return F.floor(c / g).cast("long")

    cells = rects.select(
        *keys, "rect_id", "x0", "y0", "x1", "y1",
        F.explode(F.sequence(cdiv(F.col("x0")), cdiv(F.col("x1")))).alias("cx"),
    ).select(
        "*",
        F.explode(F.sequence(cdiv(F.col("y0")), cdiv(F.col("y1")))).alias("cy"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = functools.reduce(
        operator.and_,
        [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
        + [
            F.col("a.cx") == F.col("b.cx"),
            F.col("a.cy") == F.col("b.cy"),
            F.col("a.rect_id") < F.col("b.rect_id"),
            F.col("a.x0") <= F.col("b.x1"),
            F.col("b.x0") <= F.col("a.x1"),
            F.col("a.y0") <= F.col("b.y1"),
            F.col("b.y0") <= F.col("a.y1"),
            # owner cell of the overlap's min corner
            F.col("a.cx") == cdiv(F.greatest(F.col("a.x0"), F.col("b.x0"))),
            F.col("a.cy") == cdiv(F.greatest(F.col("a.y0"), F.col("b.y0"))),
        ],
    )
    edges = a.join(b, cond).select(
        F.col("a.rect_id").alias("r1"), F.col("b.rect_id").alias("r2")
    )
    comp = connected_components(edges, src="r1", dst="r2").select(
        F.col("doc_id").alias("rect_id"), "cluster_id"
    )
    labeled = rects.join(comp, "rect_id", "left").withColumn(
        "region_id", F.coalesce(F.col("cluster_id"), F.col("rect_id")).cast("long")
    )
    return labeled.groupBy(*keys, "region_id").agg(
        F.min("x0").cast("long").alias("region_x0"),
        F.min("y0").cast("long").alias("region_y0"),
        F.max("x1").cast("long").alias("region_x1"),
        F.max("y1").cast("long").alias("region_y1"),
        F.count(F.lit(1)).cast("long").alias("n_merged"),
    )
