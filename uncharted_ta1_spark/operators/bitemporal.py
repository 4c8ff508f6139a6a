"""Bitemporal (event-time x ingest-time) point-in-time as-of answering —
the late-arriving-data correctness question a feature store must answer:
"what feature vector WOULD the backfill have produced at time K, given
only the rows that had ARRIVED by K?"  A plain as-of join keyed on event
time silently leaks rows that were ingested after the probe timestamp
(the training/serving skew of every real pipeline); the bitemporal
lookup constrains BOTH axes and flags exactly the probes where the naive
answer would have leaked (Snodgrass, "Developing Time-Oriented Database
Applications in SQL", 1999 — public bitemporal model; the
point-in-time-correctness rule of public feature-store designs).

Reference analog: results arrive asynchronously and out of order via the
request/result queues and are written back idempotently
(``tasks/common/request_client.py:50-262``,
``cdr/server.py:273-335``) — replaying the reference pipeline at an
earlier wall-clock time would see fewer results for the same maps; this
operator makes that knowledge-time cut explicit and queryable.

Scale design (100 TB):

* ONE equi-hash join probes x events on the entity key with the event-
  time inequality applied post-join — fan-out is bounded by the per-
  entity version count (the low-churn dimension plan, same envelope as
  ``q_scd2_pit_lookup``; a high-churn stream would use
  ``operators/asof.py``'s sort-merge union instead).
* Both argmax reductions (naive and knowledge-cut) ride the SAME join in
  one combinable groupBy over an order-encoded BIGINT — no window, no
  second pass; the payload join-back reuses the entity-key partitioning.
* Everything is exact integer arithmetic; no floats at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORD_BASE = 1024  # ord = event_epoch * ORD_BASE + tiebreak (tiebreak < 1024)


def bitemporal_asof(
    events: DataFrame,
    probes: DataFrame,
    *,
    keys: list[str] = ("doc_id", "source"),
    event_ts: str = "event_epoch",
    ingest_ts: str = "ingest_epoch",
    probe_ts: str = "ts_epoch",
    tiebreak: str = "seq_no",
    payload: str = "n_tok",
) -> DataFrame:
    """Answer every probe twice — naive event-time as-of vs the
    bitemporal (ingest <= probe ts) cut — and flag the leaks.

    Returns one row per probe: the bitemporal answer's event epoch /
    tiebreak / payload (-1 sentinels when no row qualifies),
    ``fallback_used``, and ``late_leak`` = the naive as-of would have
    answered with a row that had not yet arrived.
    """
    keys = list(keys)
    ord_col = (F.col(event_ts) * ORD_BASE + F.col(tiebreak)).cast("long")
    ev = events.select(
        *[F.col(k).alias(f"e_{k}") for k in keys],
        F.col(event_ts).cast("long").alias("e_event"),
        ord_col.alias("e_ord"),
        F.col(ingest_ts).alias("e_ingest"),
        F.col(payload).alias("e_payload"),
    )
    cond = [F.col(k) == F.col(f"e_{k}") for k in keys] + [
        F.col("e_event") <= F.col(probe_ts)
    ]
    joined = probes.join(ev, cond, "left")
    agg = joined.groupBy("probe_id", *keys, probe_ts).agg(
        F.max("e_ord").alias("_naive_ord"),
        F.max(
            F.when(F.col("e_ingest") <= F.col(probe_ts), F.col("e_ord"))
        ).alias("_bt_ord"),
    )
    back = ev.select(
        *[F.col(f"e_{k}") for k in keys], "e_ord", "e_payload"
    )
    out = agg.join(
        back,
        [F.col(f"e_{k}") == F.col(k) for k in keys]
        + [F.col("e_ord") == F.col("_bt_ord")],
        "left",
    )
    return out.select(
        "probe_id",
        *keys,
        F.col(probe_ts).cast("long").alias(probe_ts),
        F.coalesce(F.expr(f"_bt_ord div {ORD_BASE}"), F.lit(-1))
        .cast("long")
        .alias("bt_event_epoch"),
        F.coalesce(F.pmod(F.col("_bt_ord"), F.lit(ORD_BASE)), F.lit(-1))
        .cast("long")
        .alias("bt_tiebreak"),
        F.coalesce("e_payload", F.lit(-1)).cast("long").alias("bt_payload"),
        F.coalesce(F.expr(f"_naive_ord div {ORD_BASE}"), F.lit(-1))
        .cast("long")
        .alias("naive_event_epoch"),
        F.col("_bt_ord").isNull().alias("fallback_used"),
        (
            F.col("_naive_ord").isNotNull()
            & (
                F.col("_bt_ord").isNull()
                | (F.col("_naive_ord") != F.col("_bt_ord"))
            )
        ).alias("late_leak"),
    )
