"""Deterministic hash sampling — the 100 TB sampling primitive.

A training-data pipeline samples constantly (eval holdouts, ablation
subsets, debugging slices).  ``df.sample()`` is seed-and-partitioning
dependent: the same row can enter or leave the sample when the file layout
changes, which silently breaks train/eval splits.  Hash-threshold sampling
is the scale-correct alternative: membership is a pure function of the ROW
KEY, so the sample is stable across reruns, repartitions, engines and time
— and composable (a 10% sample of a 50% sample is the 5% whose hash falls
in both thresholds).

Reference analog: the reference pins every stochastic choice to a fixed
seed for reproducibility (``tasks/geo_referencing/ground_control.py:25``
``random.seed(911)``, ``outlier_filter.py:190-194`` RANSAC
``random_state=911``) — here the "seed" is the content key itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import md5_i64

SCALE = 1_000_000  # rate resolution: 1e-6


def hash_sample(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose md5(key) mod 1e6 falls below rate*1e6.

    ``salt`` decorrelates independent samples over the same keys (eval split
    vs debug slice).  Filter only — no shuffle; pushes down to the scan
    stage and composes with any downstream plan.
    """
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return df.where(md5_i64(key, salt=salt) % SCALE < int(rate * SCALE))


def stratified_hash_sample(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling — the class-rebalancing step of a training
    pipeline (downsample the over-represented language/source/domain, keep
    the rare one whole) with the same determinism contract as
    :func:`hash_sample`.

    ``rates`` maps stratum value -> keep rate; strata not listed keep
    ``default_rate``.  Still filter-only: the per-stratum threshold is a
    CASE expression on the stratum column, so there is NO join, NO shuffle,
    and the predicate stays scan-side.  Sampling within each stratum uses
    the same hash bucket as :func:`hash_sample`, so a stratified sample is
    consistent with (a subset/superset of) an unstratified one at the
    corresponding rate — re-stratifying never reshuffles membership.
    """
    thr = F.lit(int(default_rate * SCALE))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(int(rate * SCALE))
        ).otherwise(thr)
    return df.where(sample_bucket_expr(key_cols, salt=salt) < thr)


def importance_sample(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    weight_col: str,
    min_rate: float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Quality-weighted sampling: keep probability = clamp(weight, min_rate, 1)
    — the importance-resampling step of a curation pipeline (keep all of the
    best documents, a deterministic thinning of the worst; DCLM/FineWeb-style
    quality upsampling by the complementary rates).

    Same determinism contract as :func:`hash_sample` (membership is a pure
    function of the key and the weight), same filter-only plan: the
    threshold is ``floor(clamp(w)*1e6)`` — floor EXPLICITLY, because a bare
    double→int cast truncates in Spark but rounds in DuckDB and membership
    must be engine-exact.
    """
    thr = F.floor(
        F.least(F.greatest(F.col(weight_col), F.lit(float(min_rate))), F.lit(1.0))
        * F.lit(float(SCALE))
    ).cast("long")
    return df.where(sample_bucket_expr(key_cols, salt=salt) < thr)


def fixed_k_hash_sample(
    df: DataFrame,
    *,
    strata: Sequence[str],
    key_cols: Sequence[str],
    k: int,
    salt: str = "fixedk",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically: rank
    rows inside each stratum by their stable content hash (the same
    rerun-stable md5 bucket as every other sampler here — no RNG, no
    shuffle-order dependence) and keep the k smallest.  The per-class
    "cap the sample at k" pattern (reference analog: the <=250-matches-per-
    symbol cap, template_match_point_extractor.py:49) as a reproducible
    sampler rather than an arbitrary head.

    Rank plan: the two-phase salted top-k (aggregates.grouped_topk) — a
    plain stratum-partitioned window would sort a whole stratum's rows in
    ONE task (the class-partitioned-rank scale-killer); the salted rank
    keeps at most k rows per (stratum, salt) before the droplet-sized
    final rank, bit-identical to the naive window.
    """
    from uncharted_ta1_spark.operators.aggregates import grouped_topk

    h = sample_bucket_expr(key_cols, salt=salt)
    order_exprs = [(h, False)] + [(F.col(c), False) for c in key_cols]
    return grouped_topk(
        df,
        group_cols=list(strata),
        order_exprs=order_exprs,
        k=k,
        rank_col="_rk",
    ).drop("_rk")


def sample_bucket_expr(key_cols: Sequence[str], salt: str = "") -> F.Column:
    """The underlying [0, 1e6) bucket — exposed so train/val/test splits can
    partition ONE hash into disjoint ranges instead of re-hashing per split."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return md5_i64(key, salt=salt) % SCALE


def weighted_fixed_k_sample(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    weight_col: str,
    k: int,
    min_weight: float = 0.01,
    salt: str = "aes",
    score_col: str = "aes_score",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k rows, deterministic:
    the Efraimidis–Spirakis A-ES scheme (public: "Weighted random sampling
    with a reservoir", IPL 2006) — each row draws u in (0,1) and the k
    largest u^(1/w) keys win, which is provably a weighted sample without
    replacement.  Complements :func:`importance_sample` (Poisson keep/drop,
    random size) and :func:`fixed_k_hash_sample` (uniform fixed-k): this is
    the "exactly k documents, proportional-to-quality" curation primitive.

    Determinism + portability: u derives from the stable md5 bucket of the
    key (no RNG), and rows are ranked by ln(u)/w — the monotone log of the
    A-ES key, so the order is identical but needs no cross-engine ``pow``.
    Weights clamp to >= ``min_weight`` so zero-quality rows stay rankable
    (ln(u)/0 would be -inf).

    Scale shape: pure column math + ``orderBy().limit(k)`` — Spark plans a
    distributed TakeOrdered partial top-k, never a global sort.
    """
    u = (md5_i64(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols]),
        salt=salt,
    ).cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(float(min_weight)))
    score = F.log(u) / w
    return (
        df.withColumn(score_col, score)
        .orderBy(F.col(score_col).desc(), *[F.col(c) for c in key_cols])
        .limit(k)
        .withColumn(score_col, F.round(F.col(score_col), 6))
    )
