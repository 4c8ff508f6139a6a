"""Activity-gap sessionization — 1-D gap clustering as a running-sum window.

Reference analog: 1-D DBSCAN over degree values with ``eps=0.3,
min_samples=2`` (``tasks/geo_referencing/geo_coordinates.py:15-118``) and the
coarse variant ``eps=50000`` (``state_plane_extractor.py:225-297``).  For 1-D
data, DBSCAN's cluster assignment is exactly gap clustering: a new cluster
starts wherever the gap to the previous (sorted) value exceeds eps.  Over an
event-time axis that is precisely *sessionization*:

    new_session := (ts - lag(ts)) > gap
    session_id  := running sum of new_session per key group

Pure Spark SQL: one shuffle on the keys, two window passes fused into the
same sort (same partition+order spec → single exchange+sort in the plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    ts: str = "ts_us",
    gap: int = 1_800_000_000,
    order_tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Assign ``session_id`` (0-based per key group) via the gap rule.

    A row starts a new session iff ``ts - lag(ts) > gap`` (strictly greater:
    a gap of exactly `gap` stays in-session, matching DBSCAN's ``<= eps``
    reachability).  ``order_tiebreak`` makes the sort total when timestamps
    collide.
    """
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_s = (
        F.when(F.lag(F.col(ts), 1).over(w).isNull(), F.lit(0))
        .when((F.col(ts) - F.lag(F.col(ts), 1).over(w)) > F.lit(gap), F.lit(1))
        .otherwise(F.lit(0))
    )
    return df.withColumn("session_id", F.sum(new_s).over(wrun).cast("long"))


def session_aggs(
    sessions: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    ts: str = "ts_us",
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Collapse sessionized rows to one row per session.

    Emits session_len, session_start/end (epoch), duration, plus
    sum/mean of each requested column.  Partial (map-side) aggregation is
    automatic — this is a plain hash aggregate for Catalyst.
    """
    agg_cols = agg_cols or {}
    aggs = [
        F.count(F.lit(1)).cast("long").alias("session_len"),
        F.min(F.col(ts)).cast("long").alias("session_start"),
        F.max(F.col(ts)).cast("long").alias("session_end"),
        (F.max(F.col(ts)) - F.min(F.col(ts))).cast("long").alias("session_duration"),
    ]
    for c, how in agg_cols.items():
        if how == "sum":
            # Exact fixed-point sum at 6 dp: quantize each value to integer
            # micro-units with floor (floor is exact IEEE, identical in every
            # engine — round() has cross-engine tie hazards), sum as BIGINT
            # (order-free), divide once.  The int64 sum holds ~9e12 rows of
            # |value|<=1000 per group — ample for per-session/per-key groups
            # at any scale.
            micro = F.sum(F.floor(F.col(c) * F.lit(1e6)))
            aggs.append((micro / F.lit(1e6)).alias(f"session_sum_{c}"))
        elif how == "mean":
            aggs.append(F.round(F.avg(F.col(c)), 6).alias(f"session_mean_{c}"))
        else:
            raise ValueError(f"unsupported agg {how}")
    return sessions.groupBy(*keys, "session_id").agg(*aggs)


def top_sessions(
    per_session: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    by: str = "session_len",
    n: int = 2,
) -> DataFrame:
    """Top-n sessions per key by a metric (reference analog: top-2 clusters
    by size, ``state_plane_extractor.py:259-260``, T6)."""
    w = Window.partitionBy(*keys).orderBy(F.col(by).desc(), F.col("session_id").asc())
    return (
        per_session.withColumn("session_rank", F.row_number().over(w))
        .where(F.col("session_rank") <= n)
    )
