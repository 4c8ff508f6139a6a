"""Temperature-based corpus mixing weights — the multilingual/multi-source
sampling-rate computation of a large-scale pretraining pipeline (Conneau et
al., "Unsupervised Cross-lingual Representation Learning at Scale", ACL
2020 §3.1; the mT5/XLM-R ``p_i^alpha`` rule — public method): a source with
raw token share ``p_i`` is sampled proportionally to ``p_i^alpha`` with
``alpha < 1``, up-weighting tail sources without letting any head source
dominate.

Reference analog: the inverse-support weighting the reference applies when
fusing multi-source evidence (``tasks/geo_referencing/point_geocoder.py:
178-189`` — each geocoded point contributes ``1/len(results)`` so prolific
sources don't drown sparse ones), lifted from per-point fusion to
corpus-level source sampling rates.

Scale design (100 TB corpus):

* The corpus-sized work is ONE map-side-combinable groupBy (per-source
  sequence count + token mass).  Everything downstream runs on the
  #sources-row table (droplet-sized at any corpus scale) with the scalar
  totals broadcast.
* Engine-exact math: ``m^alpha`` is evaluated as ``exp(alpha * ln(m))``
  (one fixed IEEE tree over an exact BIGINT) and floored to MICRO units —
  micro, not nano, because the weight magnitude is O(m^alpha) and a 1-ulp
  libm divergence must stay far from the floor boundary.  Shares and
  expected draws are then pure integer arithmetic over the floored
  weights: bit-identical across engines, reruns and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIX_ALPHA = 0.3  # the mT5 default sampling temperature exponent
MIX_BUDGET = 1_000_000  # draws allocated by expected_draws


def temperature_mix(
    seq: DataFrame,
    *,
    source_col: str = "source",
    ntok_col: str = "n_tok",
    alpha: float = MIX_ALPHA,
    budget: int = MIX_BUDGET,
) -> DataFrame:
    """Per-source sampling weights at temperature ``alpha``.

    Returns one row per source: ``n_seq``, ``token_mass`` (exact BIGINTs),
    ``raw_share`` / ``mix_weight`` (9-dp doubles derived from exact
    integers), ``expected_draws`` (integer floor allocation of ``budget``
    draws — the per-source quota a sampler would consume).
    """
    src = seq.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_seq"),
        F.sum(ntok_col).cast("long").alias("token_mass"),
    )
    w = src.withColumn(
        "_w_micro",
        F.floor(
            F.exp(F.lit(alpha) * F.log(F.col("token_mass").cast("double")))
            * F.lit(1e6)
        ).cast("long"),
    )
    tot = w.agg(
        F.sum("_w_micro").cast("long").alias("_tw"),
        F.sum("token_mass").cast("long").alias("_tm"),
    )
    return (
        w.join(F.broadcast(tot))
        .select(
            source_col,
            "n_seq",
            "token_mass",
            F.round(
                F.col("token_mass").cast("double") / F.col("_tm").cast("double"),
                9,
            ).alias("raw_share"),
            F.round(
                F.col("_w_micro").cast("double") / F.col("_tw").cast("double"),
                9,
            ).alias("mix_weight"),
            F.expr(f"({budget}L * _w_micro) div _tw")
            .cast("long")
            .alias("expected_draws"),
        )
    )


def quota_allocation(
    seq: DataFrame,
    *,
    source_col: str = "source",
    ntok_col: str = "n_tok",
    budget: int = MIX_BUDGET,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer sampling
    budget across sources by token mass — the standard exact-quota method
    (public: Hamilton/Vinton apportionment; used where
    :func:`temperature_mix`'s floor quotas must instead sum to EXACTLY the
    budget, e.g. fixed-size eval-set assembly).

    ``quota_i = floor(B*w_i/W) + 1`` for the L strata with the largest
    remainders ``(B*w_i) mod W`` (ties by source asc), where
    ``L = B - Σ floor`` — pure BIGINT arithmetic end-to-end, bit-exact in
    any engine.

    Scale shape: ONE combinable groupBy over the corpus; the ranking
    window runs on the #sources-row droplet table (bounded by the source
    cardinality, documented — never corpus-sized).
    """
    from pyspark.sql.window import Window

    w = seq.groupBy(source_col).agg(
        F.sum(ntok_col).cast("long").alias("token_mass")
    )
    tot = w.agg(F.sum("token_mass").cast("long").alias("_tm"))
    base = w.join(F.broadcast(tot)).select(
        source_col,
        "token_mass",
        F.expr(f"({budget}L * token_mass) div _tm").cast("long").alias("floor_quota"),
        F.expr(f"({budget}L * token_mass) % _tm").cast("long").alias("remainder"),
    )
    # droplet-sized window: #sources rows
    rk = Window.orderBy(F.col("remainder").desc(), F.col(source_col).asc())
    leftover = base.agg(
        (F.lit(budget) - F.sum("floor_quota")).cast("long").alias("_left")
    )
    return (
        base.withColumn("rem_rank", F.row_number().over(rk).cast("long"))
        .join(F.broadcast(leftover))
        .select(
            source_col,
            "token_mass",
            "floor_quota",
            "remainder",
            "rem_rank",
            (
                F.col("floor_quota")
                + F.when(F.col("rem_rank") <= F.col("_left"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )
