"""Ordered-neighbor window operators: lag/lead token context + rolling aggs.

Reference analog: the adjacent-block merge in
``tasks/geo_referencing/coordinates_extractor.py:495-540`` — a token at
position ``idx`` looks at the *next* element in document order, conditional on
a gap bound (W1 in SURVEY.md §2.5); and the token-budget aggregate
``tasks/metadata_extraction/metadata_extraction.py:806-820`` (A10).

Everything here is a pure Spark SQL window — single shuffle on the partition
keys, whole-stage-codegen'd frame evaluation, no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lag_lead_context(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    order: Sequence[str] = ("event_epoch",),
    cols: Sequence[str] = ("tokens", "n_tok"),
    k: int = 1,
) -> DataFrame:
    """Add ``lag_{c}_{i}`` / ``lead_{c}_{i}`` columns for i in 1..k.

    NULL at partition edges (FIXTURES.md §4 requires exact null edges).
    Also emits ``gap_to_prev_sec`` from the first order column.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(o).asc() for o in order])
    # single select: chained withColumn blocks CollapseWindow with an
    # interleaved Project, executing one Window pass PER COLUMN over the
    # sorted partitions; one select plans a single Window node
    exprs = []
    for c in cols:
        for i in range(1, k + 1):
            exprs.append(F.lag(F.col(c), i).over(w).alias(f"lag_{c}_{i}"))
            exprs.append(F.lead(F.col(c), i).over(w).alias(f"lead_{c}_{i}"))
    ts = order[0]
    exprs.append(
        (F.col(ts) - F.lag(F.col(ts), 1).over(w))
        .cast("long")
        .alias("gap_to_prev_sec")
    )
    return df.select("*", *exprs)


def rolling_agg(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    order: Sequence[str] = ("event_epoch",),
    col: str = "n_tok",
    window: int = 5,
) -> DataFrame:
    """Trailing `window`-row sum/mean/min/max of `col` per key group.

    ``roll_mean`` is rounded to 9 decimals so results hash-match the DuckDB
    oracle bit-for-bit (both engines do bigint-sum / count in double).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(o).asc() for o in order])
        .rowsBetween(-(window - 1), 0)
    )
    # single select -> single Window node (see lag_lead_context note)
    return df.select(
        "*",
        F.sum(F.col(col).cast("long")).over(w).alias(f"roll_sum_{col}_w{window}"),
        F.round(F.avg(F.col(col).cast("long")).over(w), 9).alias(
            f"roll_mean_{col}_w{window}"
        ),
        F.min(F.col(col)).over(w).alias(f"roll_min_{col}_w{window}"),
        F.max(F.col(col)).over(w).alias(f"roll_max_{col}_w{window}"),
    )


def rolling_median(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    order: Sequence[str] = ("event_epoch",),
    col: str = "n_tok",
    window: int = 5,
) -> DataFrame:
    """Trailing `window`-row MEDIAN of `col` per key group — the
    order-statistic window the algebraic rolling aggregates can't express
    (robust local level for spike-resistant features).

    Implementation: collect_list over the rows frame (bounded at `window`
    elements, so the per-row state is O(window), never O(partition)),
    array_sort, then exact middle/two-middle interpolation in double —
    (a+b)/2 on integer inputs is bit-equal to quantile_cont(0.5)'s
    a+(b-a)*0.5, so the DuckDB `median(::DOUBLE) OVER frame` oracle matches
    without rounding.  Same single Exchange as the other ordered features
    (shared window spec).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(o).asc() for o in order])
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.array_sort(F.collect_list(F.col(col).cast("double")).over(w))
    m = F.size(arr)
    i1 = F.floor((m + F.lit(1)) / F.lit(2)).cast("int")
    i2 = F.ceil((m + F.lit(1)) / F.lit(2)).cast("int")
    med = (F.element_at(arr, i1) + F.element_at(arr, i2)) / F.lit(2.0)
    return df.withColumn(f"roll_med_{col}_w{window}", med)


def expanding_leakfree_mean(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    ts: str = "ts_us",
    value: str = "value",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Leakage-free expanding mean of ``value`` per key — the target-encoding
    feature: each row sees the mean of STRICTLY EARLIER rows only
    (``rowsBetween(unboundedPreceding, -1)``), so the row's own value (and
    any future) can never leak into its feature — the same zero-temporal-
    leakage contract as the as-of join, in aggregate form.

    Engine-exact: the running sum is integer micro-units (floor(v*1e6),
    order-free) and the mean is one fixed division tree over exact ints, so
    the feature is bit-identical across engines with no rounding.  First
    row per key has no history: NULL mean, n_prior = 0.

    One shuffle on the keys; shares its sort with any other window feature
    on the same (keys, ts) — the bucketed layout (plans/layout.py) plans it
    with zero Exchanges.
    """
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vm = F.floor(F.col(value) * F.lit(1e6))
    n_prior = F.count(F.lit(1)).over(w)
    s_prior = F.sum(vm).over(w)
    mean = F.when(
        n_prior > 0,
        (s_prior.cast("double") / F.lit(1e6)) / n_prior.cast("double"),
    )
    return df.withColumn("n_prior", n_prior.cast("long")).withColumn(
        "prior_mean", mean
    )


def group_zscore(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    value: str = "value",
    scale: int = 1000,
) -> DataFrame:
    """Per-key z-score of ``value`` from engine-exact sufficient statistics:
    the per-key sums run over integer ``scale``-units (milli by default —
    the squared sums must stay below 2^53: |v|*scale squared times the group
    size; at scale=1e3 and |v|<=1e3 that holds to ~9e6 rows per key), and
    mean/std/z come from one fixed IEEE tree, so results are bit-identical
    across engines unrounded.  Zero-variance keys yield NULL z.

    Plan: one map-side-combinable groupBy + a broadcast-or-hash join back —
    never a second window sort over the corpus.
    """
    keys = list(keys)
    vi = F.floor(F.col(value) * F.lit(float(scale)))
    stats = (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(vi).alias("_s"),
            F.sum(vi * vi).alias("_ss"),
        )
    )
    nf = F.col("_n").cast("double")
    sf = F.col("_s").cast("double")
    ssf = F.col("_ss").cast("double")
    stats = stats.withColumn(
        "_mean", (sf / nf) / F.lit(float(scale))
    ).withColumn(
        "_var", (nf * ssf - sf * sf) / (nf * nf) / F.lit(float(scale * scale))
    )
    joined = df.join(stats, keys)
    z = F.when(
        F.col("_var") > 0,
        (F.col(value).cast("double") - F.col("_mean")) / F.sqrt(F.col("_var")),
    )
    return joined.withColumn("zscore", z).drop("_n", "_s", "_ss", "_var").withColumnRenamed(
        "_mean", "key_mean"
    )


def dedup_latest(
    df: DataFrame,
    *,
    keys: Sequence[str],
    order: Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """Keep exactly one row per key group: the greatest (default) order tuple.

    Reference analog: tile-overlap dedup, last-write-wins keyed by decimated
    grid cell (``tasks/point_extraction/tiling.py:289-352``, W4) and the
    coordinate dict override (``tasks/geo_referencing/util.py:76-96``).
    """
    ordering = [F.col(o).desc() if descending else F.col(o).asc() for o in order]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def ewma(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    order: Sequence[str] = ("event_epoch", "seq_no"),
    col: str = "n_tok",
    alpha: float = 0.25,
) -> DataFrame:
    """Exponentially-weighted moving average of `col` per key group, in
    event order — the classic recursive sequential feature
    (acc = (1-alpha)*acc + alpha*x, seeded with the first value).

    A recursion cannot be a SQL window frame, so it runs as a LEFT FOLD over
    the group's ordered value array (collect_list + array_sort + aggregate
    HOF) — all JVM-side, no Python.  Memory bound = group size, the same
    bound any ordered collapse has; groups here are per (doc_id, source)
    sequences, bounded by construction.  The DuckDB twin is
    list_reduce(list(x ORDER BY ...)) — both engines fold left with
    identical IEEE ops, so results are bit-equal.
    """
    keys = list(keys)
    arr = F.array_sort(
        F.collect_list(
            F.struct(*[F.col(o) for o in order], F.col(col).cast("double").alias("_v"))
        )
    )
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        arr.alias("_arr"),
    )
    vals = F.transform(F.col("_arr"), lambda s: s["_v"])
    fold = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    return g.select(*keys, "n", F.round(fold, 9).alias(f"ewma_{col}"))


def range_window_features(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    ts: str = "event_epoch",
    value: str = "n_tok",
    range_sec: int = 86400,
    tiebreak: Sequence[str] = ("seq_no",),
) -> DataFrame:
    """Trailing RANGE-frame activity features: events and value mass inside
    the last ``range_sec`` SECONDS (inclusive of the current row), plus the
    gap to the previous event.

    A RANGE frame is the time-window twin of the ROWS frames used by
    :func:`rolling_agg`: the frame is defined by the *timestamp distance*,
    not a row count, so ties at one timestamp are all in-frame and burst
    density is measured in wall-clock terms — the "events in last 24 h"
    feature family (reference analog: the recency gating of
    ``tasks/geo_referencing/coordinates_extractor.py:495-540``, which
    bounds neighbor influence by coordinate gap rather than index gap).

    Same scale shape as every window here: ONE hash shuffle on ``keys``,
    in-partition sort, codegen'd frame scan, zero Python.
    """
    t = F.col(ts).cast("long")
    w_range = (
        Window.partitionBy(*keys).orderBy(t).rangeBetween(-range_sec, 0)
    )
    w_row = Window.partitionBy(*keys).orderBy(
        t, *[F.col(c) for c in tiebreak]
    )
    return (
        df.withColumn(
            f"n_last_{range_sec}s", F.count(F.lit(1)).over(w_range).cast("long")
        )
        .withColumn(
            f"{value}_last_{range_sec}s",
            F.sum(F.col(value).cast("long")).over(w_range).cast("long"),
        )
        .withColumn("gap_prev_sec", (t - F.lag(t, 1).over(w_row)).cast("long"))
    )


def expanding_lowcard_sums(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts: str,
    order_tiebreak: Sequence[str],
    int_cols: Sequence[str],
    bucket_div: int,
    prefix: str = "prior_",
) -> DataFrame:
    """Expanding (STRICTLY-prior) integer sums per LOW-cardinality key —
    the scale-safe replacement for ``Window.partitionBy(low_card_key)``.

    A naive expanding window partitioned by a low-cardinality key (an event
    type, a label class — or nothing at all for a global prior) funnels the
    whole corpus through a handful of single-task sorts.  Instead, the same
    two-level prefix-sum decomposition as ``operators/binning.py``:

    1. bucket rows by coarse time (``_bkt = ts DIV bucket_div``);
    2. per (key, bucket): ONE combinable groupBy of the partial sums;
    3. an expanding window over the TINY (key x bucket) partial frame
       computes each bucket's strictly-before-this-bucket offsets;
    4. broadcast-join offsets back, then an expanding window partitioned by
       (key, bucket) — bounded per-task work — adds the within-bucket
       strictly-prior sums.

    Integer addition is associative, so ``offset + within`` is bit-identical
    to the naive single-partition window at any bucket granularity.  Adds
    ``{prefix}n`` and ``{prefix}{c}`` (both long) for each c of
    ``int_cols``; rows with no prior history get zeros.

    Reference analog: the reference's per-category running re-scoring
    accumulates per-class state across a whole run
    (``tasks/point_extraction/point_orientation_extractor.py:60-150``
    class-keyed sweeps); here the accumulation is time-ordered and
    leakage-free.
    """
    keys = list(keys)
    order_tiebreak = list(order_tiebreak)
    int_cols = list(int_cols)
    bkt = (F.col(ts).cast("long") / F.lit(bucket_div)).cast("long")
    # floor for negative ts too (cast truncates toward zero)
    bkt = F.when(
        F.col(ts).cast("long") % F.lit(bucket_div) < 0, bkt - 1
    ).otherwise(bkt)
    df = df.withColumn("_bkt", bkt)

    grp = keys + ["_bkt"]
    partials = df.groupBy(*grp).agg(
        F.count(F.lit(1)).cast("long").alias("_pn"),
        *[F.sum(c).cast("long").alias(f"_ps_{c}") for c in int_cols],
    )
    w_off = (
        Window.partitionBy(*(keys or [F.lit(0)]))
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        *grp,
        F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_on"),
        *[
            F.coalesce(F.sum(f"_ps_{c}").over(w_off), F.lit(0)).alias(f"_os_{c}")
            for c in int_cols
        ],
    )
    w_in = (
        Window.partitionBy(*grp)
        .orderBy(F.col(ts).asc(), *[F.col(c).asc() for c in order_tiebreak])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.join(F.broadcast(offsets), grp)
    out = out.select(
        "*",
        (F.col("_on") + F.coalesce(F.count(F.lit(1)).over(w_in), F.lit(0)))
        .cast("long").alias(f"{prefix}n"),
        *[
            (F.col(f"_os_{c}") + F.coalesce(F.sum(c).over(w_in), F.lit(0)))
            .cast("long").alias(f"{prefix}{c}")
            for c in int_cols
        ],
    )
    drop = ["_bkt", "_on"] + [f"_os_{c}" for c in int_cols]
    return out.drop(*drop)
