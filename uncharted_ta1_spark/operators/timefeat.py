"""Time-axis feature primitives over keyed event sequences.

Four operators a point-in-time feature store needs beyond the as-of join
itself: SCD Type-2 intervalization of a changelog, time-weighted averages,
multi-horizon lag/delta matrices, and fixed-grid resampling with
last-observation-carried-forward.

Reference analogs:
  * SCD2 intervalization — the reference memoizes per-map state keyed by
    content+config version and replays deltas idempotently
    (``tasks/common/task.py:188-212``, ``cdr/server.py:273-335``); the SCD2
    table is that changelog re-expressed as validity intervals so any
    timestamp can be answered by interval containment instead of a scan.
  * LOCF gap-fill — ``tasks/geo_referencing/inference.py:21-80`` infers
    coordinates for unobserved positions by carrying surrounding anchor
    state into the gap (InferenceCoordinateExtractor).
  * TWAP / lag matrices — the per-map summary statistics the reference
    accumulates over extraction events (``tasks/geo_referencing/
    georeference.py:80-275`` confidence/score aggregation over time).

Scale notes (100 TB): every operator here is a single hash shuffle on the
group key followed by bounded per-group window work — the same partitioning
as the as-of join, so a pipeline chaining them reuses one Exchange.  The
resample explode fans out rows linearly in grid cells, never quadratically;
per-group grid width is bounded by the key's observation span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    df: DataFrame,
    *,
    keys: list[str],
    ts: str,
    order_tiebreak: list[str],
    payload_cols: list[str],
    open_end: int = -1,
) -> DataFrame:
    """Intervalize a changelog into an SCD Type-2 dimension.

    Each event opens a version valid from its own timestamp until the next
    event's timestamp (exclusive); the latest version stays open
    (``valid_to = open_end`` sentinel, never NULL so downstream range
    predicates stay three-valued-logic-free).  Emits ``version`` (1-based),
    ``is_current`` and ``duration_sec`` (-1 for the open version).

    One window over (keys) ordered by (ts, tiebreak): a single hash
    shuffle; per-group work is linear in the group's event count.
    """
    w = Window.partitionBy(*keys).orderBy(ts, *order_tiebreak)
    nxt = F.lead(F.col(ts)).over(w)
    return df.select(
        *keys,
        F.row_number().over(w).cast("long").alias("version"),
        F.col(ts).cast("long").alias("valid_from"),
        F.coalesce(nxt, F.lit(open_end)).cast("long").alias("valid_to"),
        F.when(nxt.isNull(), F.lit(-1))
        .otherwise(nxt - F.col(ts))
        .cast("long")
        .alias("duration_sec"),
        nxt.isNull().alias("is_current"),
        *[F.col(c).cast("long").alias(c) for c in payload_cols],
    )


def twap(
    df: DataFrame,
    *,
    keys: list[str],
    ts: str,
    order_tiebreak: list[str],
    value: str,
) -> DataFrame:
    """Time-weighted average of a piecewise-constant integer signal.

    Each observation holds from its own timestamp to the next one's, so
    its weight is that gap; the final observation is a zero-width point
    (standard TWAP over the observed span).  Emits the exact BIGINT
    numerator (value x seconds mass) and span alongside the one-division
    double so the oracle hash covers the integer algebra, not float
    accumulation order.  Groups with a zero span emit NULL twap.
    """
    w = Window.partitionBy(*keys).orderBy(ts, *order_tiebreak)
    gap = F.lead(F.col(ts)).over(w) - F.col(ts)
    stepped = df.select(
        *keys,
        F.col(ts).cast("long").alias("_t"),
        (F.col(value).cast("long") * F.coalesce(gap, F.lit(0)))
        .cast("long")
        .alias("_mass"),
    )
    agg = stepped.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_mass").cast("long").alias("twap_num"),
        (F.max("_t") - F.min("_t")).cast("long").alias("span_sec"),
    )
    return agg.select(
        *keys,
        "n_obs",
        "twap_num",
        "span_sec",
        F.when(
            F.col("span_sec") > 0,
            F.col("twap_num").cast("double") / F.col("span_sec").cast("double"),
        ).alias("twap_value"),
    )


def lag_horizons(
    df: DataFrame,
    *,
    keys: list[str],
    ts: str,
    order_tiebreak: list[str],
    value: str,
    horizons: list[int],
    sentinel: int = -1,
) -> DataFrame:
    """Multi-horizon lag / delta / age matrix in ONE window pass.

    For each horizon k: the value k observations back, the signed delta
    against it, and the elapsed seconds — the standard derivative feature
    stack.  Missing history emits ``sentinel`` for the lag and age and 0
    for the delta (NULL-free so the feature vector is dense).

    All horizons share one WindowSpec, so Spark evaluates them in a single
    sort within the single hash shuffle — adding a horizon adds zero
    shuffles and zero extra sorts.
    """
    w = Window.partitionBy(*keys).orderBy(ts, *order_tiebreak)
    v = F.col(value).cast("long")
    cols: list[Column] = [
        *[F.col(k) for k in keys],
        F.col(ts).cast("long").alias(ts),
        *[F.col(c) for c in order_tiebreak],
        v.alias(value),
    ]
    for k in horizons:
        lag_v = F.lag(v, k).over(w)
        lag_t = F.lag(F.col(ts).cast("long"), k).over(w)
        cols.append(
            F.coalesce(lag_v, F.lit(sentinel)).cast("long").alias(f"lag{k}")
        )
        cols.append(
            F.coalesce(v - lag_v, F.lit(0)).cast("long").alias(f"delta{k}")
        )
        cols.append(
            F.coalesce(F.col(ts).cast("long") - lag_t, F.lit(sentinel))
            .cast("long")
            .alias(f"age{k}_sec")
        )
    return df.select(*cols)


def resample_locf(
    df: DataFrame,
    *,
    keys: list[str],
    ts: str,
    order_tiebreak: list[str],
    value: str,
    bucket_sec: int,
) -> DataFrame:
    """Resample a keyed event series onto a fixed time grid with LOCF.

    Grid cells run from each group's first observed bucket to its last;
    cells with no observation carry the last observed value forward
    (last-observation-carried-forward) and report how many buckets stale
    the carried value is.  Within a bucket the LAST event (by ts,
    tiebreak) wins — the same last-write-wins rule as the as-of join.

    Plan: per-(group, bucket) winner via one windowed rank (hash shuffle
    on keys), grid explode via ``sequence`` (linear fan-out, bounded by
    the group's span), then one more window on the SAME key partitioning
    for the forward fill — Spark reuses the partitioning, so the whole
    resample is effectively one Exchange.
    """
    b = (F.col(ts).cast("long") / F.lit(bucket_sec)).cast("long")
    # DIV semantics: ts is always positive here so floor-div == int-div
    bucketed = df.select(
        *keys,
        F.col(ts).cast("long").alias("_t"),
        (F.col(ts).cast("long") - F.col(ts).cast("long") % bucket_sec)
        .alias("_bucket_t"),
        b.alias("_bucket"),
        *[F.col(c) for c in order_tiebreak],
        F.col(value).cast("long").alias("_v"),
    )
    w_in = Window.partitionBy(*keys, "_bucket").orderBy(
        F.col("_t").desc(), *[F.col(c).desc() for c in order_tiebreak]
    )
    per_bucket = (
        bucketed.withColumn("_rn", F.row_number().over(w_in))
        .where(F.col("_rn") == 1)
        .select(*keys, "_bucket", F.col("_v").alias("obs_value"))
    )
    spans = bucketed.groupBy(*keys).agg(
        F.min("_bucket").alias("_b_lo"), F.max("_bucket").alias("_b_hi")
    )
    grid = spans.select(
        *keys,
        F.explode(F.sequence(F.col("_b_lo"), F.col("_b_hi"))).alias("_bucket"),
    )
    joined = grid.join(per_bucket, [*keys, "_bucket"], "left")
    w_fill = (
        Window.partitionBy(*keys)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *keys,
        (F.col("_bucket") * bucket_sec).cast("long").alias("bucket_epoch"),
        F.last("obs_value", ignorenulls=True).over(w_fill)
        .cast("long")
        .alias("value_filled"),
        F.col("obs_value").isNotNull().alias("is_observed"),
        (
            F.col("_bucket")
            - F.last(
                F.when(F.col("obs_value").isNotNull(), F.col("_bucket")),
                ignorenulls=True,
            ).over(w_fill)
        )
        .cast("long")
        .alias("staleness_buckets"),
    )
    return filled


TWO_PI = "6.283185307179586"  # shared literal — identical text in the oracle
EPOCH0_SHIFT = 1704067200  # datagen.EPOCH0: slope is shift-invariant


def calendar_features(df: DataFrame, *, ts: str = "event_epoch") -> DataFrame:
    """Calendar / cyclical encodings of an epoch column — the standard
    seasonality features (hour-of-day, day-of-week, weekend flag, and the
    sin/cos circle embeddings that keep hour 23 adjacent to hour 0).

    Integer parts derive from the epoch by pure div/mod arithmetic (UTC
    pinned — no timezone functions, so the derivation is engine-portable
    by construction; 1970-01-01 was a Thursday, hence the +4).  The trig
    pair is computed from a <=24-value integer domain through a fixed
    IEEE tree and rounded at 9 dp (libm ulp differences cannot move a
    9-dp boundary on this domain — verified exhaustively in tests).
    Pure map work: zero shuffle, zero Python.

    Reference analog: the reference buckets events by wall-clock day for
    its eval cohorts (``eval/18month_eval/eval_utils.py``); cyclical
    encodings are the model-side form of the same calendar signal.
    """
    epoch = F.col(ts)
    day = F.expr(f"{ts} div 86400")
    hour = F.expr(f"{ts} div 3600") % 24
    dow = (day + 4) % 7  # 0 = Sunday
    out = df.select(
        "doc_id",
        "source",
        F.col("seq_no").cast("long").alias("seq_no"),
        epoch.cast("long").alias(ts),
        hour.cast("long").alias("hour_of_day"),
        dow.cast("long").alias("day_of_week"),
        ((dow == 0) | (dow == 6)).alias("is_weekend"),
    )
    return out.select(
        "*",
        F.expr(
            f"round(sin({TWO_PI} * CAST(hour_of_day AS DOUBLE) / 24.0), 9) + 0.0"
        ).alias("hour_sin"),
        F.expr(
            f"round(cos({TWO_PI} * CAST(hour_of_day AS DOUBLE) / 24.0), 9) + 0.0"
        ).alias("hour_cos"),
        F.expr(
            f"round(sin({TWO_PI} * CAST(day_of_week AS DOUBLE) / 7.0), 9) + 0.0"
        ).alias("dow_sin"),
        F.expr(
            f"round(cos({TWO_PI} * CAST(day_of_week AS DOUBLE) / 7.0), 9) + 0.0"
        ).alias("dow_cos"),
    )


def rolling_slope(
    df: DataFrame,
    *,
    keys: list[str],
    ts: str = "event_epoch",
    order_tiebreak: list[str] = ("seq_no",),
    value: str = "n_tok",
    window: int = 5,
) -> DataFrame:
    """Trailing ``window``-row OLS slope of ``value`` against time per
    key — the trend feature of a rolling feature matrix (least-squares
    slope = (k·Σxy − Σx·Σy) / (k·Σx² − (Σx)²), Gauss normal equations).

    The time axis is shifted by the corpus epoch origin before squaring
    (slope is shift-invariant) so every register fits in BIGINT exactly;
    the numerator/denominator are emitted alongside the one rounded
    division, pinning the integer algebra in the oracle hash.  NULL slope
    when the frame's timestamps are all equal (den = 0).  One hash
    shuffle on the key, one window pass — same partitioning as the as-of
    join.
    """
    x = (F.col(ts) - F.lit(EPOCH0_SHIFT)).cast("long")
    y = F.col(value).cast("long")
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts, *order_tiebreak)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    k = F.count(F.lit(1)).over(w).cast("long")
    sx = F.sum(x).over(w).cast("long")
    sy = F.sum(y).over(w).cast("long")
    sxy = F.sum(x * y).over(w).cast("long")
    sxx = F.sum(x * x).over(w).cast("long")
    num = (k * sxy - sx * sy).cast("long")
    den = (k * sxx - sx * sx).cast("long")
    return df.select(
        *keys,
        F.col(ts).cast("long").alias(ts),
        F.col("seq_no").cast("long").alias("seq_no"),
        y.alias(value),
        k.alias("n_window"),
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(
            den != 0,
            F.round(num.cast("double") / den.cast("double"), 9) + F.lit(0.0),
        ).alias("slope"),
    )
