"""First-significant-digit (Benford) distribution audit — the
data-quality plausibility gate for monetary/measured columns.

Reference analog: the reference gates extracted coordinates through
statistical plausibility filters before trusting them — RANSAC regression
over the digit-parsed values with explicit outlier exclusion
(``tasks/geo_referencing/outlier_filter.py:34-165``) and consecutive-digit
noise heuristics (``tasks/geo_referencing/util.py``).  Generalized to the
table-level audit a 100 TB ingest pipeline runs per batch: compare the
first-significant-digit histogram of a positive measured column against
Benford's law (public: Benford 1938; Hill 1995) and emit per-digit
chi-square contributions — fabricated, truncated, or unit-mixed data jumps
out as a digit-histogram distortion long before row-level rules fire.

Scale design: ONE combinable groupBy over 9 digit groups (map-side
partials collapse everything); the total-count broadcast is a single row.
The digit is extracted via exact integer cents (``round(x*100)`` then the
first character of the integer's decimal string), never via float
``log10`` whose libm varies across engines at power-of-ten boundaries.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_digit_audit(df: DataFrame, *, amount_col: str) -> DataFrame:
    """Per-digit Benford audit of a positive money column.

    Output: 9 rows (digit 1..9) with ``n_obs`` (BIGINT), ``p_obs`` (raw
    IEEE division — identical single-op tree in the oracle), ``p_benford``
    (round 9: ln is libm 1-ulp across engines) and ``chisq_term``
    ``(n_obs - n*p)^2 / (n*p)`` (round 6).  Rows with non-positive or NULL
    amounts are excluded (Benford applies to positive measurements).
    """
    cents = F.round(F.col(amount_col) * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        df.where(F.col(amount_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    total = obs.agg(F.sum("n_obs").cast("long").alias("_n"))
    # ln(1+1/d)/ln(10) with the SAME double tree in the oracle; the ln
    # calls are the only cross-engine 1-ulp hazard, handled by round(9).
    ln10 = "ln(10e0)"
    p_benford = F.expr(f"ln(1e0 + 1e0 / cast(digit as double)) / {ln10}")
    return (
        obs.join(F.broadcast(total))
        .withColumn("p_obs", F.col("n_obs") / F.col("_n"))
        .withColumn("p_benford", F.round(p_benford, 9))
        .withColumn(
            "chisq_term",
            F.round(
                F.pow(
                    F.col("n_obs")
                    - F.col("_n") * F.expr(f"ln(1e0 + 1e0 / cast(digit as double)) / {ln10}"),
                    2,
                )
                / (F.col("_n") * F.expr(f"ln(1e0 + 1e0 / cast(digit as double)) / {ln10}")),
                6,
            ),
        )
        .select("digit", "n_obs", "p_obs", "p_benford", "chisq_term")
    )


def benford_expected(digit: int) -> float:
    """Python-side twin for tests: Benford probability of ``digit``."""
    return math.log10(1.0 + 1.0 / digit)


def dq_constraint_report(
    events: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Declarative data-quality constraint report (the Deequ/
    great-expectations audit pattern — public: Schelter et al., "Automating
    Large-Scale Data Quality Verification", VLDB 2018): one row per
    constraint with exact checked/violation counts and a pass flag.

    Reference analog: the reference enforces per-row schemas with pydantic
    ``model_validate`` at every task boundary and drops/quarantines
    malformed rows (``tasks/common/task.py``, ``tasks/common/io.py``);
    this is the batch-level generalization an ingest pipeline runs per
    partition before publishing.

    Constraints (each a combinable aggregate; the referential check is a
    broadcast-able anti-join count — never a row-level materialization):

    * completeness(events.props), uniqueness(events.event_id)
    * range(events.value in [0, 1000]), set(events.event_type)
    * referential: lineitem.l_orderkey ⊆ orders.o_orderkey
    * monotone epoch floor: events.ts >= 2024-01-01T00:00:00Z (exact\n      integer microseconds — unix_micros/epoch_us, timezone-free)
    """
    e = events.select(
        "event_id",
        "event_type",
        "value",
        "props",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("_ep"),
    )
    allowed = ("click", "view", "purchase", "error", "signup")
    base = e.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_null_props"),
        (F.count(F.lit(1)) - F.countDistinct("event_id"))
        .cast("long")
        .alias("v_dup_event_id"),
        F.sum(
            F.when((F.col("value") < 0) | (F.col("value") > 1000), 1).otherwise(0)
        )
        .cast("long")
        .alias("v_value_range"),
        F.sum(F.when(~F.col("event_type").isin(*allowed), 1).otherwise(0))
        .cast("long")
        .alias("v_event_type"),
        F.sum(F.when(F.col("_ep") < 1704067200 * 1_000_000, 1).otherwise(0))
        .cast("long")
        .alias("v_ts_floor"),
    )
    ref = (
        lineitem.select(F.col("l_orderkey").alias("k"))
        .join(
            orders.select(F.col("o_orderkey").alias("k")).distinct(),
            "k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v_orphan"))
    )
    n_li = lineitem.agg(F.count(F.lit(1)).cast("long").alias("n_li"))
    wide = base.crossJoin(F.broadcast(ref)).crossJoin(F.broadcast(n_li))
    checks = [
        ("completeness_events_props", "n", "v_null_props"),
        ("uniqueness_events_event_id", "n", "v_dup_event_id"),
        ("range_events_value_0_1000", "n", "v_value_range"),
        ("set_events_event_type", "n", "v_event_type"),
        ("floor_events_ts_epoch0", "n", "v_ts_floor"),
        ("referential_lineitem_orderkey", "n_li", "v_orphan"),
    ]
    parts = [
        wide.select(
            F.lit(name).alias("constraint_name"),
            F.col(nc).alias("n_checked"),
            F.col(vc).alias("n_violations"),
            (F.col(vc) == 0).alias("passed"),
        )
        for name, nc, vc in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
