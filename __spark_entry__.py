"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator of the engine (SURVEY.md §2) run
against the driver parquet at ``sf_dir``; ``oracle_sql()`` holds the
equivalent DuckDB SQL.  The engine-specific ``sequences``/``probes`` tables
are derived deterministically from the driver tables in BOTH dialects (see
uncharted_ta1_spark/datagen.py) so the oracle checks the full path.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.datagen import (
    EVENTS_DUCK,
    EVENTS_SPARK,
    PROBES_DUCK,
    SEQUENCES_DUCK,
    duck_with,
)
from uncharted_ta1_spark.operators.asof import asof_join
from uncharted_ta1_spark.operators.extrapolate import extrapolate_groups
from uncharted_ta1_spark.operators.filters import (
    adaptive_topup_filter,
    group_agg_filter,
    mad_outlier_flag,
)
from uncharted_ta1_spark.operators.sessionize import session_aggs, sessionize, top_sessions
from uncharted_ta1_spark.operators.windows import dedup_latest, lag_lead_context, rolling_agg

SF0001 = "/root/testdata/sf0.001"

def _empty_tokens() -> F.Column:
    # built lazily: Column construction needs an active SparkSession
    return F.array().cast("array<int>")


def _sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return datagen.sequences_df(spark, sf_dir).select(
        "doc_id", "source", "seq_no", "event_epoch", "tokens", "n_tok"
    )


def _probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return datagen.probes_df(spark, sf_dir).select(
        "probe_id", "doc_id", "source", "ts_epoch"
    )


# ---------------------------------------------------------------------------
# Core feature-engine queries (SURVEY.md §2.3 J7, §2.5 W1/W2/W4, §2.4 A10)
# ---------------------------------------------------------------------------


def q_asof_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup per (doc_id, source) with fallback defaults."""
    out = asof_join(
        _sequences(spark, sf_dir),
        _probes(spark, sf_dir),
        keys=["doc_id", "source"],
        payload_cols=["tokens", "n_tok"],
        defaults={"tokens": _empty_tokens(), "n_tok": F.lit(-1)},
    )
    return out.select(
        "probe_id", "doc_id", "source", "ts_epoch",
        "asof_event_epoch", "asof_tokens", "asof_n_tok", "asof_age_sec",
        "fallback_used",
    )


ORACLE_ASOF_PER_SOURCE = (
    duck_with(SEQUENCES_DUCK, PROBES_DUCK)
    + """
SELECT p.probe_id, p.doc_id, p.source, p.ts_epoch,
       s.event_epoch AS asof_event_epoch,
       coalesce(s.tokens, CAST([] AS INT[])) AS asof_tokens,
       coalesce(s.n_tok, -1) AS asof_n_tok,
       p.ts_epoch - s.event_epoch AS asof_age_sec,
       s.event_epoch IS NULL AS fallback_used
FROM probes p
ASOF LEFT JOIN sequences s
  ON p.doc_id = s.doc_id AND p.source = s.source AND p.ts_epoch >= s.event_epoch
"""
)


def q_asof_any_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup matching ANY source of the doc; deterministic
    tie-break (greatest (event_epoch, source, seq_no) wins)."""
    out = asof_join(
        _sequences(spark, sf_dir),
        _probes(spark, sf_dir).drop("source"),
        keys=["doc_id"],
        payload_cols=["tokens", "n_tok", "source", "seq_no"],
        tiebreak_cols=["source", "seq_no"],
        prefix="asof_",
        defaults={"tokens": _empty_tokens(), "n_tok": F.lit(-1)},
    )
    return out.select(
        "probe_id", "doc_id", "ts_epoch",
        "asof_event_epoch", "asof_tokens", "asof_n_tok",
        F.col("asof_source"), F.col("asof_seq_no"),
        "asof_age_sec", "fallback_used",
    )


ORACLE_ASOF_ANY_SOURCE = (
    duck_with(SEQUENCES_DUCK, PROBES_DUCK)
    + """
SELECT p.probe_id, p.doc_id, p.ts_epoch,
       s.event_epoch AS asof_event_epoch,
       coalesce(s.tokens, CAST([] AS INT[])) AS asof_tokens,
       coalesce(s.n_tok, -1) AS asof_n_tok,
       s.source AS asof_source, s.seq_no AS asof_seq_no,
       p.ts_epoch - s.event_epoch AS asof_age_sec,
       s.event_epoch IS NULL AS fallback_used
FROM probes p
LEFT JOIN sequences s
  ON p.doc_id = s.doc_id AND s.event_epoch <= p.ts_epoch
QUALIFY row_number() OVER (
  PARTITION BY p.probe_id
  ORDER BY s.event_epoch DESC NULLS LAST, s.source DESC, s.seq_no DESC) = 1
"""
)


def q_lag_lead_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±1 token-context window per (doc_id, source) ordered by event time."""
    out = lag_lead_context(
        _sequences(spark, sf_dir),
        keys=["doc_id", "source"],
        order=["event_epoch"],
        cols=["tokens", "n_tok"],
        k=1,
    )
    return out.select(
        "doc_id", "source", "seq_no", "event_epoch", "n_tok",
        "lag_tokens_1", "lead_tokens_1", "lag_n_tok_1", "lead_n_tok_1",
        "gap_to_prev_sec",
    )


ORACLE_LAG_LEAD = (
    duck_with(SEQUENCES_DUCK)
    + """
SELECT doc_id, source, seq_no, event_epoch, n_tok,
       lag(tokens) OVER w AS lag_tokens_1,
       lead(tokens) OVER w AS lead_tokens_1,
       lag(n_tok) OVER w AS lag_n_tok_1,
       lead(n_tok) OVER w AS lead_n_tok_1,
       event_epoch - lag(event_epoch) OVER w AS gap_to_prev_sec
FROM sequences
WINDOW w AS (PARTITION BY doc_id, source ORDER BY event_epoch)
"""
)


def q_rolling_ntok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-row n_tok-weighted rolling aggregates (A10 analog)."""
    out = rolling_agg(
        _sequences(spark, sf_dir),
        keys=["doc_id", "source"],
        order=["event_epoch"],
        col="n_tok",
        window=5,
    )
    return out.select(
        "doc_id", "source", "seq_no", "event_epoch", "n_tok",
        "roll_sum_n_tok_w5", "roll_mean_n_tok_w5",
        "roll_min_n_tok_w5", "roll_max_n_tok_w5",
    )


ORACLE_ROLLING = (
    duck_with(SEQUENCES_DUCK)
    + """
SELECT doc_id, source, seq_no, event_epoch, n_tok,
       CAST(sum(CAST(n_tok AS BIGINT)) OVER w AS BIGINT) AS roll_sum_n_tok_w5,
       round(avg(CAST(n_tok AS BIGINT)) OVER w, 9) AS roll_mean_n_tok_w5,
       min(n_tok) OVER w AS roll_min_n_tok_w5,
       max(n_tok) OVER w AS roll_max_n_tok_w5
FROM sequences
WINDOW w AS (PARTITION BY doc_id, source ORDER BY event_epoch
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""
)


GAP_US = 1_800_000_000  # 30 min session gap


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization of the events stream per user (W2/W3 analog)."""
    ev = datagen.events_epoch_df(spark, sf_dir)
    out = sessionize(ev, keys=["user_id"], ts="ts_us", gap=GAP_US)
    return out.select("event_id", "user_id", "ts_us", "event_type", "value", "session_id")


ORACLE_SESSIONIZE = (
    duck_with(EVENTS_DUCK)
    + f"""
, marked AS (
  SELECT *,
    CASE WHEN lag(ts_us) OVER w IS NULL THEN 0
         WHEN ts_us - lag(ts_us) OVER w > {GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM events_epoch
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT event_id, user_id, ts_us, event_type, value,
  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM marked
"""
)


def q_session_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollups: length, bounds, duration, value sums."""
    ev = datagen.events_epoch_df(spark, sf_dir)
    sess = sessionize(ev, keys=["user_id"], ts="ts_us", gap=GAP_US)
    return session_aggs(sess, keys=["user_id"], ts="ts_us", agg_cols={"value": "sum"})


ORACLE_SESSION_AGGS = (
    duck_with(EVENTS_DUCK)
    + f"""
, marked AS (
  SELECT *,
    CASE WHEN lag(ts_us) OVER w IS NULL THEN 0
         WHEN ts_us - lag(ts_us) OVER w > {GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM events_epoch
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT *,
    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS session_len,
       CAST(min(ts_us) AS BIGINT) AS session_start,
       CAST(max(ts_us) AS BIGINT) AS session_end,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS session_duration,
       round(sum(value), 6) AS session_sum_value
FROM sess
GROUP BY user_id, session_id
"""
)


def q_session_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 sessions per user by event count (T6 analog)."""
    ev = datagen.events_epoch_df(spark, sf_dir)
    sess = sessionize(ev, keys=["user_id"], ts="ts_us", gap=GAP_US)
    per = session_aggs(sess, keys=["user_id"], ts="ts_us")
    return top_sessions(per, keys=["user_id"], by="session_len", n=2).select(
        "user_id", "session_id", "session_len", "session_rank"
    )


ORACLE_SESSION_TOP2 = (
    duck_with(EVENTS_DUCK)
    + f"""
, marked AS (
  SELECT *,
    CASE WHEN lag(ts_us) OVER w IS NULL THEN 0
         WHEN ts_us - lag(ts_us) OVER w > {GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM events_epoch
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT *,
    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
), per AS (
  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS session_len
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, session_id, session_len,
       CAST(row_number() OVER (PARTITION BY user_id
            ORDER BY session_len DESC, session_id ASC) AS INT) AS session_rank
FROM per
QUALIFY session_rank <= 2
"""
)


# ---------------------------------------------------------------------------
# Filter / dedup / extrapolation operators (SURVEY.md §2.2 F2/F3, §2.5 W4/W6)
# ---------------------------------------------------------------------------


def q_dedup_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins dedup per (doc_id, source) — W4/E5 override-by-key."""
    out = dedup_latest(
        _sequences(spark, sf_dir),
        keys=["doc_id", "source"],
        order=["event_epoch"],
    )
    return out.select("doc_id", "source", "seq_no", "event_epoch", "n_tok")


ORACLE_DEDUP_LATEST = (
    duck_with(SEQUENCES_DUCK)
    + """
SELECT doc_id, source, seq_no, event_epoch, n_tok
FROM sequences
QUALIFY row_number() OVER (PARTITION BY doc_id, source ORDER BY event_epoch DESC) = 1
"""
)


def q_group_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop whole (doc_id, source) groups failing count/max predicates (F3)."""
    out = group_agg_filter(
        _sequences(spark, sf_dir),
        keys=["doc_id", "source"],
        min_count=3,
        agg_predicates={"grp_max_n_tok": ("max(n_tok)", F.col("grp_max_n_tok") >= 10)},
    )
    return out.select(
        "doc_id", "source", "seq_no", "event_epoch", "n_tok",
        "grp_count", "grp_max_n_tok",
    )


ORACLE_GROUP_COUNT_FILTER = (
    duck_with(SEQUENCES_DUCK)
    + """
SELECT doc_id, source, seq_no, event_epoch, n_tok, grp_count, grp_max_n_tok
FROM (
  SELECT *, CAST(count(*) OVER w AS BIGINT) AS grp_count,
         max(n_tok) OVER w AS grp_max_n_tok
  FROM sequences
  WINDOW w AS (PARTITION BY doc_id, source)
)
WHERE grp_count >= 3 AND grp_max_n_tok >= 10
"""
)


def q_adaptive_topup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold filter with best-first re-admission at 0.5x (F2 adaptive)."""
    ev = datagen.events_epoch_df(spark, sf_dir)
    out = adaptive_topup_filter(
        ev,
        keys=["user_id"],
        keep=F.col("value") >= 150.0,
        order=["value", "event_id"],
        target=2,
        readmit_factor=0.5,
        value_col="value",
    )
    return out.select("event_id", "user_id", "event_type", "value", "was_topup", "adj_value")


ORACLE_ADAPTIVE_TOPUP = (
    duck_with(EVENTS_DUCK)
    + """
, m AS (SELECT *, (value >= 150.0) AS keep FROM events_epoch),
r AS (
  SELECT *,
    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id) AS BIGINT) AS n_surv,
    CASE WHEN NOT keep THEN
      row_number() OVER (PARTITION BY user_id
                         ORDER BY keep DESC, value DESC, event_id DESC)
    END AS exc_rank
  FROM m
)
SELECT event_id, user_id, event_type, value,
       NOT keep AS was_topup,
       CASE WHEN NOT keep THEN round(value * 0.5, 6) ELSE round(value, 6) END AS adj_value
FROM r
WHERE keep OR (exc_rank - n_surv) <= (2 - least(2, n_surv))
"""
)


def q_extrapolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize next-step rows per group from first/last trend (W6)."""
    return extrapolate_groups(
        _sequences(spark, sf_dir),
        keys=["doc_id", "source"],
        ts="event_epoch",
        value="n_tok",
        min_rows=2,
        confidence=0.5,
    )


ORACLE_EXTRAPOLATE = (
    duck_with(SEQUENCES_DUCK)
    + """
SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_obs,
  CAST(max(event_epoch)
       + (max(event_epoch) - min(event_epoch)) // (count(*) - 1) AS BIGINT) AS synth_epoch,
  CAST(greatest(arg_max(n_tok, event_epoch)
       + (arg_max(n_tok, event_epoch) - arg_min(n_tok, event_epoch)), 0) AS INT) AS synth_n_tok,
  CAST(0.5 AS DOUBLE) AS confidence
FROM sequences
GROUP BY doc_id, source
HAVING count(*) >= 2
"""
)


def q_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier flag per user (F4 analog)."""
    ev = datagen.events_epoch_df(spark, sf_dir)
    out = mad_outlier_flag(ev, keys=["user_id"], value_col="value", k=3.0)
    return out.select(
        "event_id", "user_id", "value", "is_outlier", "grp_median", "grp_mad"
    )


ORACLE_MAD_OUTLIER = (
    duck_with(EVENTS_DUCK)
    + """
, med AS (SELECT user_id, median(value::DOUBLE) AS m FROM events_epoch GROUP BY user_id),
mad AS (
  SELECT e.user_id, median(abs(e.value - med.m)::DOUBLE) AS d
  FROM events_epoch e JOIN med USING (user_id)
  GROUP BY e.user_id
)
SELECT e.event_id, e.user_id, e.value,
       abs(e.value - med.m) > 3.0 * mad.d AS is_outlier,
       round(med.m, 6) AS grp_median,
       round(mad.d, 6) AS grp_mad
FROM events_epoch e
JOIN med USING (user_id)
JOIN mad USING (user_id)
"""
)


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: leakage-free as-of feature backfill at sf0.001."""
    return q_asof_per_source(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asof_per_source": q_asof_per_source,
        "asof_any_source": q_asof_any_source,
        "lag_lead_context": q_lag_lead_context,
        "rolling_ntok": q_rolling_ntok,
        "sessionize_events": q_sessionize_events,
        "session_aggs": q_session_aggs,
        "session_top2": q_session_top2,
        "dedup_latest_state": q_dedup_latest_state,
        "group_count_filter": q_group_count_filter,
        "adaptive_topup": q_adaptive_topup,
        "extrapolate": q_extrapolate,
        "mad_outlier": q_mad_outlier,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "asof_per_source": ORACLE_ASOF_PER_SOURCE,
        "asof_any_source": ORACLE_ASOF_ANY_SOURCE,
        "lag_lead_context": ORACLE_LAG_LEAD,
        "rolling_ntok": ORACLE_ROLLING,
        "sessionize_events": ORACLE_SESSIONIZE,
        "session_aggs": ORACLE_SESSION_AGGS,
        "session_top2": ORACLE_SESSION_TOP2,
        "dedup_latest_state": ORACLE_DEDUP_LATEST,
        "group_count_filter": ORACLE_GROUP_COUNT_FILTER,
        "adaptive_topup": ORACLE_ADAPTIVE_TOPUP,
        "extrapolate": ORACLE_EXTRAPOLATE,
        "mad_outlier": ORACLE_MAD_OUTLIER,
    }
