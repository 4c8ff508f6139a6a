"""Stream-stream interval join — event-time attribution.

The streaming twin of the batch interval join (J3): match each `view`
with the `click`s by the same user inside an event-time window.  Both
sides carry watermarks so the join state is bounded: a view older than
the watermark minus the join window can never match a future click and
is evicted — this is what makes the join runnable on an unbounded stream
instead of accumulating both sides forever.

Reference analog: the queue-driven request/result correlation of the
pipeline servers (``tasks/common/request_client.py:86-127`` — the
request-queue/result-queue pairing the RequestClient maintains),
generalized to event-time attribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    window: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join right rows with ``left.event_time <= right.event_time <=
    left.event_time + window`` on the same ``key``.

    Inputs are streaming DataFrames with a ``ts`` column (event time).
    Emits (left_id, right_id, key, left_ts, right_ts) — matches stream out
    as both sides arrive; on a bounded replay the drained result equals the
    batch interval join exactly.

    ``how="leftOuter"``: unmatched left rows are additionally emitted with
    a NULL right side — but only once the GLOBAL watermark (the min over
    BOTH inputs) passes their state expiry, so their absence of a match is
    final.  Measured caveat (prototype in this repo's round-5 session):
    rows that never reach the watermark operator cannot advance it — a
    bounded drain must ship flush rows that survive each side's filters,
    and the outer emission can lag one micro-batch (same one-batch lag the
    windowed aggregation's late filter shows), so the drain harness stages
    TWO flush batches.
    """
    lv = (
        left.withColumn("l_time", F.col("ts").cast("timestamp"))
        .withWatermark("l_time", watermark)
        .select(
            F.col("event_id").alias("left_id"),
            F.col(key).alias("l_key"),
            "l_time",
        )
    )
    rv = (
        right.withColumn("r_time", F.col("ts").cast("timestamp"))
        .withWatermark("r_time", watermark)
        .select(
            F.col("event_id").alias("right_id"),
            F.col(key).alias("r_key"),
            "r_time",
        )
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_time") >= F.col("l_time"))
        & (F.col("r_time") <= F.col("l_time") + F.expr(f"INTERVAL {window}"))
    )
    return lv.join(rv, cond, how).select(
        "left_id",
        "right_id",
        F.col("l_key").alias(key),
        F.unix_micros(F.col("l_time")).alias("left_ts"),
        F.unix_micros(F.col("r_time")).alias("right_ts"),
    )
