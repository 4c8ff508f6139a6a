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
