"""Aggregate operators mirroring the reference's scoring/aggregation family.

Reference analogs (SURVEY.md §2.4):
  * A1 `_count_keypoints`      — groupBy counts (georeference.py:187-196)
  * A2 `_calculate_confidence` — product of confidences with count boost,
                                 capped at 1 (georeference.py:198-226);
                                 product agg == exp(sum(log)) — no UDAF needed
  * A3 RMSE                    — sqrt(mean(err^2)) (georeference.py:431-479,
                                 eval/18month_eval/eval_utils.py:8-41)
  * A4 `rank_segments`         — rank by score per class
                                 (segmenter_utils.py:20-37)
  * A6 `get_min_max_count`     — hemisphere-normalized min/max/count
                                 (util.py:203-219; absolute_minmax
                                 util/coordinate.py:4-12)
  * A8 hemisphere vote         — sign decision from first/last sorted values
                                 (georeference.py:277-316)

All are single-shuffle grouped/window aggregates with map-side partials.
Money sums are computed in DECIMAL so results are order-independent and
bit-equal across engines (double sums are order-dependent!).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def confidence_product(
    df: DataFrame,
    *,
    keys: Sequence[str],
    value_col: str = "value",
    boost: float = 1.1,
    boost_min_count: int = 3,
) -> DataFrame:
    """Product-aggregate of per-row confidences c = 0.5 + (v % 50)/100,
    with the reference's >2-count boost, capped at 1.  Implemented as
    exp(sum(ln(c))) — a pure SQL product aggregate."""
    # Spark's % is sign-following like DuckDB's % (pmod is NOT: it stays
    # non-negative for negative inputs, which would silently diverge from the
    # oracle — and ln(0.5 + neg/100) can NaN — if value ranges ever go negative)
    c = F.lit(0.5) + F.expr(f"{value_col} % 50.0") / F.lit(100.0)
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.log(c)).alias("_logsum"),
    )
    prod = F.exp(F.col("_logsum"))
    boosted = F.when(F.col("n_obs") >= boost_min_count, prod * F.lit(boost)).otherwise(prod)
    return g.select(
        *keys,
        "n_obs",
        F.round(F.col("_logsum"), 6).alias("log_conf_sum"),
        F.round(F.least(boosted, F.lit(1.0)), 9).alias("confidence"),
    )


def rmse(
    df: DataFrame,
    *,
    keys: Sequence[str],
    value_col: str = "value",
    target: float = 100.0,
) -> DataFrame:
    """Root-mean-square error of value vs a target, per key group."""
    err2 = (F.col(value_col) - F.lit(target)) * (F.col(value_col) - F.lit(target))
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.round(F.sqrt(F.avg(err2)), 6).alias("rmse"),
    )


def minmax_count_abs(
    df: DataFrame,
    *,
    keys: Sequence[str],
    value_col: str = "value",
) -> DataFrame:
    """min/max/count of |value| per group (hemisphere-crossing normalize)."""
    a = F.abs(F.col(value_col))
    return df.groupBy(*keys).agg(
        F.round(F.min(a), 6).alias("abs_min"),
        F.round(F.max(a), 6).alias("abs_max"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )


def first_last_trend(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts: str,
    value_col: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per group: value at earliest and latest timestamp + sign of the move
    (A8 hemisphere vote).  min_by/max_by over a composite deterministic key
    — no full sort."""
    key_asc = F.struct(F.col(ts), F.col(tiebreak))
    return df.groupBy(*keys).agg(
        F.round(F.min_by(F.col(value_col), key_asc), 6).alias("first_value"),
        F.round(F.max_by(F.col(value_col), key_asc), 6).alias("last_value"),
        F.signum(
            F.max_by(F.col(value_col), key_asc) - F.min_by(F.col(value_col), key_asc)
        )
        .cast("int")
        .alias("trend"),
    )


def rank_groups(
    df: DataFrame,
    *,
    partition: Sequence[str],
    entity: str,
    value_col: str = "value",
    top_n: int = 3,
) -> DataFrame:
    """Rank entities within a partition by their value sum; keep top n.

    Sum computed in DECIMAL(18,2) so ranking is deterministic (A4 analog:
    confidence * sqrt(area) ranking)."""
    sums = df.groupBy(*partition, entity).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_dsum"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )
    w = Window.partitionBy(*partition).orderBy(F.col("_dsum").desc(), F.col(entity).asc())
    return (
        sums.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            *partition,
            entity,
            F.col("_dsum").cast("double").alias("value_sum"),
            "n_obs",
            "rank",
        )
    )


def grouped_quantiles(
    df: DataFrame,
    *,
    keys: Sequence[str],
    col: str,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles, exact by default, sketched with ``approx=True``.

    Exact: Spark ``percentile`` == DuckDB ``quantile_cont`` (verified
    bit-equal on integer inputs); shuffles the full column per group — the
    right tool up to large-but-sortable groups (the per-group sort spills
    via UnsafeExternalSorter).

    Approx (the 100x path): ``percentile_approx`` (Greenwald-Khanna sketch,
    mergeable map-side partials — no per-group sort, bounded memory
    ``O(accuracy)`` per group regardless of group size).  Rank error is
    <= 1/accuracy of the group size.  NOT oracle-checkable (no DuckDB sketch
    twin), so the exact op is the verified surface and
    tests/test_approx_quantiles.py pins approx-vs-exact agreement instead.
    """
    if approx:
        pct = F.percentile_approx(
            F.col(col),
            F.array(*[F.lit(p) for p in probs]),
            F.lit(approx_accuracy),
        )
    else:
        pct = F.percentile(F.col(col), F.array(*[F.lit(p) for p in probs]))
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(col).alias(f"min_{col}"),
        F.max(col).alias(f"max_{col}"),
        pct.alias("_pct"),
    )
    cols = [*keys, "n", f"min_{col}", f"max_{col}"]
    out = [F.col(c) for c in cols]
    for i, p in enumerate(probs):
        name = f"p{str(p).replace('0.', '').ljust(2, '0')}_{col}"
        out.append(F.round(F.col("_pct").getItem(i), 9).alias(name))
    return agg.select(*out)


def grouped_topk(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    order_cols: Sequence[Column] | None = None,
    order_exprs=None,
    k: int = 5,
    n_salt: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Scale-safe top-k rows PER GROUP for small k — the two-phase salted
    rank that replaces ``row_number() OVER (PARTITION BY group)`` when a
    group's candidate set is huge (per-source vocabulary, per-query
    candidates): a group-partitioned window sorts the group's ENTIRE
    candidate set in one task.

    Phase 1: rank within (group, salt) — salt = pmod(hash(whole row), n_salt)
    spreads each group's candidates over n_salt bounded tasks; keep local
    rank <= k.  Phase 2: rank within group over the surviving <= k*n_salt
    rows — droplet-sized by construction.  Any row in the true global top-k
    is in its salt partition's top-k, so the result is EXACTLY the naive
    window's output (same total order, same ties).

    ``order_exprs``: list of (Column, bool_desc) pairs defining the total
    order; give a TOTAL order (include a unique tiebreak) or ranks are
    nondeterministic — same contract as every window in this repo.

    Reference analog: the reference's per-class candidate pruning keeps the
    best-n extractions per label class (``tasks/point_extraction``
    confidence top-n); this is that operator at web-scale cardinalities.
    """
    groups = list(group_cols)
    exprs = order_exprs or [(c, False) for c in (order_cols or [])]
    ordering = [
        (c.desc() if d else c.asc()) for c, d in exprs
    ]
    salt = F.pmod(
        F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salt)
    ).alias("_salt")
    w_local = Window.partitionBy(*groups, "_salt").orderBy(*ordering)
    w_final = Window.partitionBy(*groups).orderBy(*ordering)
    return (
        df.select("*", salt)
        .withColumn("_lr", F.row_number().over(w_local))
        .where(F.col("_lr") <= k)
        .withColumn(rank_col, F.row_number().over(w_final).cast("int"))
        .where(F.col(rank_col) <= k)
        .drop("_salt", "_lr")
    )


def grouped_mode(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "mode_value",
    count_col: str = "mode_count",
    n_salt: int = 32,
) -> DataFrame:
    """Exact per-group mode (plurality winner) with a deterministic
    tie-break: highest count wins, ties go to the smallest value.

    Reference analog: the per-document categorical decisions the reference
    takes by tallying observations and keeping the dominant outcome — the
    hemisphere multiplier vote (``tasks/geo_referencing/geo_fencing.py:
    65-74``) and the per-class extraction tallies
    (``tasks/text_extraction/text_extraction.py:133-141``) — generalized
    to the standard plurality aggregate.

    Scale shape: one map-side-combinable count groupBy collapses the input
    to the per-group DISTINCT value set; the winner is then picked by
    :func:`grouped_topk`'s two-phase salted rank (k=1), so a group whose
    distinct-value set is itself huge (per-source vocabularies) never
    funnels through a single task — the same defense ``vocab_index`` and
    ``value_deciles`` use.
    """
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    top = grouped_topk(
        counts,
        group_cols=group_cols,
        order_exprs=[(F.col("_c"), True), (F.col(value_col), False)],
        k=1,
        n_salt=n_salt,
        rank_col="_r",
    )
    return top.select(
        *group_cols,
        F.col(value_col).alias(out_col),
        F.col("_c").alias(count_col),
    )
