"""Gap-filling / extrapolation operators — synthesize derived rows per group.

Reference analogs (SURVEY.md §2.5):
  * W6 ``InferenceCoordinateExtractor``
    (``tasks/geo_referencing/inference.py:21-185``) — take the argmin/argmax
    rows of a per-document group, compute a per-unit resolution, and emit a
    synthetic keypoint at an extrapolated position with confidence 0.5.
  * W7 ``FinalizeCoordinates`` (``finalize_coordinates.py:30-452``) — anchor
    synthesis when fewer than 2 distinct values exist.

Implemented as one grouped aggregation (min_by/max_by — no full sort) that
emits a synthetic row per qualifying group; callers union the synthetic rows
back with the originals when needed (E5 merge semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extrapolate_groups(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    ts: str = "event_epoch",
    value: str = "n_tok",
    min_rows: int = 2,
    confidence: float = 0.5,
) -> DataFrame:
    """Per key group with >= min_rows observations, synthesize the next row.

    The synthetic timestamp continues the group's mean spacing
    (``last + (last - first) div (count - 1)``, integer math so the result is
    portable), and the synthetic value continues the first→last trend.
    """
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.min(F.col(ts)).cast("long").alias("_first_ts"),
        F.max(F.col(ts)).cast("long").alias("_last_ts"),
        F.min_by(F.col(value), F.col(ts)).alias("_first_v"),
        F.max_by(F.col(value), F.col(ts)).alias("_last_v"),
    )
    qual = agg.where(F.col("n_obs") >= min_rows)
    return qual.select(
        *keys,
        "n_obs",
        (
            F.col("_last_ts")
            + F.expr("(_last_ts - _first_ts) div (n_obs - 1)")
        ).cast("long").alias("synth_epoch"),
        F.greatest(
            F.col("_last_v") + (F.col("_last_v") - F.col("_first_v")),
            F.lit(0),
        ).cast("int").alias("synth_" + value),
        F.lit(confidence).alias("confidence"),
    )
