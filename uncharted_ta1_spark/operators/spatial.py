"""2-D spatial containment join via grid bucketing — no cartesian, ever.

Reference analog: the reference's most-used join family is point/box
containment — token-in-segment filtering
(``tasks/metadata_extraction/text_filter.py:63-107``), ROI ring filtering
(``tasks/geo_referencing/filter.py``), and tile↔ROI masking
(``tasks/point_extraction/tiling.py:82-114``).  SURVEY.md §2.3 J2/J5.

Scale design: a naive ``x BETWEEN xmin AND xmax AND y BETWEEN ymin AND ymax``
join has no equi conjunct, so Spark plans BroadcastNestedLoopJoin — quadratic
at corpus scale.  Instead both sides are bucketed onto a coarse grid:

  * each point lands in exactly ONE cell ``(floor(x/cell), floor(y/cell))``;
  * each rectangle is replicated to every cell it overlaps (bounded fan-out:
    with ``cell`` >= the max rectangle extent that's <= 4 replicas);
  * the join is a plain hash-partitioned EQUI join on ``(gx, gy)`` with the
    exact containment predicate applied after.

Because a point belongs to exactly one cell, every (point, rect) pair meets
at most once — no post-join dedup.  This is the 2-D generalization of the
1-D time-bucket trick in ``q_knn_nearest_event``.  Plan-asserted no-BNL in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_containment_join(
    points: DataFrame,
    rects: DataFrame,
    *,
    cell: int,
    px: str = "px",
    py: str = "py",
    bounds: tuple[str, str, str, str] = ("xmin", "xmax", "ymin", "ymax"),
) -> DataFrame:
    """All (point, rect) pairs with the point inside the rect (inclusive).

    ``cell`` must be >= the largest rectangle extent on either axis, so a
    rectangle never spans more than 2 cells per dimension.  Coordinates are
    integers (exact containment, no float edge cases).
    """
    xmin, xmax, ymin, ymax = bounds

    pts = points.withColumn("gx", F.floor(F.col(px) / cell)).withColumn(
        "gy", F.floor(F.col(py) / cell)
    )
    rect_cells = rects.select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col(xmin) / cell), F.floor(F.col(xmax) / cell))
        ).alias("gx"),
    ).select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col(ymin) / cell), F.floor(F.col(ymax) / cell))
        ).alias("gy"),
    )

    joined = pts.join(rect_cells, ["gx", "gy"])
    return joined.where(
        (F.col(px) >= F.col(xmin))
        & (F.col(px) <= F.col(xmax))
        & (F.col(py) >= F.col(ymin))
        & (F.col(py) <= F.col(ymax))
    ).drop("gx", "gy")
