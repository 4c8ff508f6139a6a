"""Ordered conversion funnel over the events stream.

The reference's pipelines gate later stages on earlier ones having
produced output (``tasks/common/pipeline.py`` step chaining, the
``_should_run`` guards F9); the analytics form of that dependency is the
ordered funnel: of the users who did step 1, how many did step 2 AFTER
step 1, and step 3 after step 2 — with time-to-convert.

Strictly-ordered semantics (each step must happen strictly later than the
user's FIRST qualifying occurrence of the previous step), all in integer
epoch microseconds — no floats anywhere, so the DuckDB oracle matches
bit-for-bit by construction.

Scale shape: one combinable min-groupBy per step, each joined back to the
events scan pre-filtered to the single next step type (predicate reaches
the parquet scan); user_id keys are fine-grained so no skew hazard, and
the final rollup is a 1-row global aggregate of per-user booleans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(events: DataFrame, steps: list[str],
                  ts_col: str = "ts_us", user_col: str = "user_id") -> DataFrame:
    """One row: entered-step counts and total time-to-convert per step.

    ``events`` needs (user_col, event_type, ts_col).  Step k counts users
    whose first step-k event is strictly after their first qualifying
    step-(k-1) event; delta sums are micro-second integers.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    # first occurrence of step 0 per user
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    frames = [cur]
    prev_t = "t0"
    for k, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col("event_type") == step)
            .join(frames[-1].select(user_col, prev_t), user_col)
            .filter(F.col(ts_col) > F.col(prev_t))
            .groupBy(user_col, prev_t)
            .agg(F.min(ts_col).alias(f"t{k}"))
        )
        frames.append(nxt)
        prev_t = f"t{k}"
    sel = frames[0].agg(
        F.count(F.lit(1)).cast("long").alias(f"n_{steps[0]}")
    )
    for k, step in enumerate(steps[1:], start=1):
        stage = frames[k].agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{step}"),
            F.coalesce(
                F.sum(F.col(f"t{k}") - F.col(f"t{k - 1}")), F.lit(0)
            )
            .cast("long")
            .alias(f"sum_delta_{step}_us"),
        )
        sel = sel.crossJoin(F.broadcast(stage))
    return sel
