"""Salted two-phase aggregation — explicit hot-key skew handling.

North-rule requirement: "salted repartitioning for skewed doc_id hot keys".
The derived corpus is skewed by construction (FIXTURES.md §1: doc_id % 50
hot docs carry 12x replicas; the bench amplifier multiplies that).

Pattern: for an algebraic aggregate over a skewed key,
  phase 1: groupBy(key, salt) where salt = pmod(hash(stable_discriminator),
           n_salts) — the hot key's rows split across n_salts reducers;
  phase 2: groupBy(key) over the n_salts partial rows — tiny.

Phase 1's map-side partial aggregation already collapses most rows; salting
matters when a single key's post-combine partial stream still overwhelms one
reducer (10^12-row corpora with viral documents).  Salting is ONLY legal for
algebraic aggregates (sum/count/min/max/avg-as-sum+count...) — order-
dependent window semantics must never be salted across a partition boundary
(SURVEY.md §7 hard-parts note); for windows the engine bounds skew by
bucketing instead (plans/backfill.py).

The salt is derived from a *data column* (deterministic), not rand(), so
re-runs and resumes are reproducible (north rule: no wall-clock/RNG).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    *,
    keys: Sequence[str],
    salt_from: str,
    n_salts: int = 16,
    aggs: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}; all are algebraic so partial-of-partial is exact.
    """
    keys = list(keys)
    aggs = aggs or {"n_rows": ("*", "count")}

    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))

    phase1_aggs: list[Column] = []
    phase2_aggs: list[Column] = []
    for out, (col, fn) in aggs.items():
        c = F.lit(1) if col == "*" else F.col(col)
        if fn == "count":
            phase1_aggs.append(F.count(c).cast("long").alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(F.col(f"_p_{out}")).cast("long").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(c.cast("long")).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(F.col(f"_p_{out}")).cast("long").alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(c).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(F.col(f"_p_{out}")).alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(c).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(F.col(f"_p_{out}")).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    keys: Sequence[str],
    salt_from: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi join: salt the BIG side, replicate the SMALL side.

    The manual form of AQE's skew-join split, for when the skew is known
    up front (a handful of ultra-hot keys — here 5 event types over 10^5+
    rows each; at corpus scale, viral documents): each big-side row gets a
    deterministic salt in [0, n_salts) derived from a data column, the
    small side is exploded n_salts times, and the join key becomes
    (keys..., salt) — so one hot key's probe rows spread over ``n_salts``
    reducers instead of one.  Results are EXACTLY the plain join's (each
    big row matches the single replica carrying its salt).

    Replication multiplies the small side by ``n_salts`` — only legal when
    |small| × n_salts still fits a shuffle comfortably (it must, or it was
    never the small side).  The salt comes from a data column, never
    rand(): re-runs and resumed stages see identical placement.
    """
    keys = list(keys)
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return b.join(s, [*keys, "_salt"]).drop("_salt")
