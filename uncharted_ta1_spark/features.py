"""End-to-end feature-vector assembly — the engine's flagship pipeline.

Produces the entity×timestamp feature vector of FIXTURES.md §4: for every
probe ``(doc_id, source, ts)`` the leakage-free as-of state plus the matched
state row's window features:

    asof_tokens / asof_n_tok / asof_age_sec        (J7 as-of lookup)
    lag/lead token context                          (W1)
    trailing-5 n_tok rolling aggregates             (A10)
    activity-gap session id / length / n_tok sum    (W2/W3)
    fallback_used                                   (confidence-0 fallback)

Plan shape (what survives 10^12 rows):
    scan sequences → ONE hash shuffle on (doc_id, source) → one sort by
    event_epoch serving ALL ordered windows (lag/lead/rolling/session run on
    the same window spec, Catalyst fuses them into a single Window node) →
    one session-key window → union with probes → the as-of running-last
    window (same keys, so AQE reuses partitioning) → project.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.operators.asof import asof_join

SESSION_GAP_SEC = 750  # splits the derived sequences' 300-900s inter-arrivals

FEATURE_PAYLOAD = (
    "tokens",
    "n_tok",
    "lag_n_tok_1",
    "lead_n_tok_1",
    "lag_tokens_1",
    "lead_tokens_1",
    "roll_sum_n_tok_w5",
    "roll_mean_n_tok_w5",
    "session_id",
    "session_len",
    "session_sum_n_tok",
)

# scalar features + the row's own tokens, without the ±1 token-array context
# (used by the scaling bench: 3x less bytes/row → less sensitive to the
# sandbox VM's fluctuating memory bandwidth)
FEATURE_PAYLOAD_LIGHT = tuple(
    c for c in FEATURE_PAYLOAD if c not in ("lag_tokens_1", "lead_tokens_1")
)


def sequence_features(seq: DataFrame, *, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """All per-row window features over (doc_id, source) ordered by time."""
    w = Window.partitionBy("doc_id", "source").orderBy("event_epoch")
    w5 = w.rowsBetween(-4, 0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    gap = F.col("event_epoch") - F.lag("event_epoch", 1).over(w)
    new_s = (
        F.when(F.lag("event_epoch", 1).over(w).isNull(), F.lit(0))
        .when(gap > gap_sec, F.lit(1))
        .otherwise(F.lit(0))
    )

    # ONE select for every expression over the shared (key, time) window
    # spec: chained withColumn puts a Project between consecutive Window
    # nodes, which blocks Catalyst's CollapseWindow rule — the same
    # features then executed as SIX sequential Window passes over the
    # sorted partitions instead of three (measured in the backfill plan).
    # Expressions and output column order are unchanged.
    feats = seq.select(
        "*",
        F.lag("n_tok", 1).over(w).alias("lag_n_tok_1"),
        F.lead("n_tok", 1).over(w).alias("lead_n_tok_1"),
        F.lag("tokens", 1).over(w).alias("lag_tokens_1"),
        F.lead("tokens", 1).over(w).alias("lead_tokens_1"),
        F.sum(F.col("n_tok").cast("long")).over(w5).alias("roll_sum_n_tok_w5"),
        F.round(F.avg(F.col("n_tok").cast("long")).over(w5), 9).alias(
            "roll_mean_n_tok_w5"
        ),
        F.sum(new_s).over(wrun).cast("long").alias("session_id"),
    )
    ws = Window.partitionBy("doc_id", "source", "session_id")
    return feats.select(
        "*",
        F.count(F.lit(1)).over(ws).cast("long").alias("session_len"),
        F.sum(F.col("n_tok").cast("long")).over(ws).alias("session_sum_n_tok"),
    )


def feature_backfill(
    seq: DataFrame,
    probes: DataFrame,
    *,
    gap_sec: int = SESSION_GAP_SEC,
    start_epoch: int | None = None,
    end_epoch: int | None = None,
    payload: tuple[str, ...] = FEATURE_PAYLOAD,
) -> DataFrame:
    """Answer every probe with its full leakage-free feature vector.

    ``start_epoch``/``end_epoch`` bound the probe replay window (the
    reference's CDR event replay, ``cdr/server.py:273-335``, ST4) — the
    state side is never truncated, so answers at the window edge still see
    all prior history.
    """
    if start_epoch is not None:
        probes = probes.where(F.col("ts_epoch") >= start_epoch)
    if end_epoch is not None:
        probes = probes.where(F.col("ts_epoch") < end_epoch)
    feats = sequence_features(seq, gap_sec=gap_sec)
    return asof_join(
        feats,
        probes,
        keys=["doc_id", "source"],
        payload_cols=list(payload),
        defaults={
            "tokens": F.array().cast("array<int>"),
            "n_tok": F.lit(-1),
        },
    )
