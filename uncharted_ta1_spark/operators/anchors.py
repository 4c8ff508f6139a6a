"""Colinearity check + anchor-point synthesis (W7).

Reference analog: ``tasks/geo_referencing/finalize_coordinates.py:30-230`` —
per coordinate group, (a) ``_check_colinearity``: if the minor-axis pixel
spread over the major-axis spread is below ``COLINEARITY_THRES = 0.05`` the
group is ill-conditioned for the polynomial georeference fit, so a DERIVED
keypoint is synthesized far away on the minor axis, offset along the major
axis by the group's fitted skew slope; (b) ``_infer_third_coord``: a group
with exactly 2 distinct points gets a third anchor assuming zero skew
(new_i = first_i + 1).  Synthesized rows carry confidence 0.5 and are ADDED
to the group, never replacing originals.

Spark-first recast over integer pixel coordinates:
- the 5% colinearity test is the exact integer cross-multiplication
  ``(j_max - j_min) * 20 < (i_max - i_min)`` — no float compare at all;
- the skew slope is the closed-form least-squares of j over i from exact
  int64 sums (same scheme as operators/groupfit.py), and the reference's
  ``int(m * dj)`` truncation is replicated sign-exactly with floor/ceil;
- one ``groupBy(keys)`` computes every group statistic (single shuffle);
  synthesized rows are built from the agg output and unioned under the
  originals, which never shuffle at all.

Deviations (documented): the reference's "first keypoint" is dict insertion
order; here it is the deterministic min over (i, j, id).  The reference's
corner-count early exit (>=3 corners skips the task) has no analog because
the input model has no corner type.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONF_SYNTH = 0.5  # reference finalize_coordinates.py:173 confidence=0.5


def synthesize_anchors(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("grp",),
    i_col: str = "pi",
    j_col: str = "pj",
    deg_col: str = "deg",
    id_col: str = "id",
    i_size: int = 10_000,
    j_lo: int = 0,
    j_hi: int = 12_000,
) -> DataFrame:
    """Return the input rows (confidence 1.0, is_synthetic false) plus at
    most ONE synthesized anchor per group (id = -1, confidence 0.5):

    - colinear rule: >=2 distinct degrees, i_range > 0 and
      j_range/i_range < 1/20 -> anchor at the far minor-axis bound, offset
      along the major axis by trunc(slope * (first_j - new_j)) (min +/-1 px);
    - third-point rule (only when the colinear rule did not fire): exactly
      2 rows with 2 distinct degrees -> anchor at (first_i + 1, far bound).
    """
    keys = list(keys)
    i, j, d, rid = (F.col(c) for c in (i_col, j_col, deg_col, id_col))

    # one deterministic "first keypoint" per group: min over (i, j, id)
    packed = ((i.cast("long") * F.lit(16384) + j.cast("long"))
              * F.lit(2_147_483_648) + rid.cast("long"))
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct(d).cast("long").alias("nd"),
        F.min(i).cast("long").alias("i_min"),
        F.max(i).cast("long").alias("i_max"),
        F.min(j).cast("long").alias("j_min"),
        F.max(j).cast("long").alias("j_max"),
        F.sum(i.cast("long")).alias("si"),
        F.sum(j.cast("long")).alias("sj"),
        F.sum(i.cast("long") * i.cast("long")).alias("sii"),
        F.sum(i.cast("long") * j.cast("long")).alias("sij"),
        F.min_by(i, packed).cast("long").alias("f_i"),
        F.min_by(j, packed).cast("long").alias("f_j"),
        F.min_by(d, packed).alias("f_deg"),
    )

    colinear = (
        (F.col("nd") >= 2)
        & (F.col("i_max") > F.col("i_min"))
        & ((F.col("j_max") - F.col("j_min")) * 20 < F.col("i_max") - F.col("i_min"))
    )
    third = (~colinear) & (F.col("n") == 2) & (F.col("nd") == 2)

    j_mid = (j_lo + j_hi) / 2.0
    new_j = F.when(F.col("f_j") > F.lit(j_mid), F.lit(j_lo)).otherwise(F.lit(j_hi))

    num = F.col("n") * F.col("sij") - F.col("si") * F.col("sj")
    d1 = F.col("n") * F.col("sii") - F.col("si") * F.col("si")
    m = num.cast("double") / d1.cast("double")
    off_f = m * (F.col("f_j") - new_j).cast("double")
    # int() truncates toward zero: floor for positive, ceil for negative
    i_off = F.when(off_f >= 0, F.floor(off_f)).otherwise(F.ceil(off_f))
    i_off = F.when(i_off == 0, F.lit(1)).otherwise(i_off)

    new_i_colinear = F.greatest(
        F.least(F.col("f_i") + i_off, F.lit(i_size - 1)), F.lit(0)
    )
    new_i_third = F.greatest(
        F.least(F.col("f_i") + F.lit(1), F.lit(i_size - 1)), F.lit(0)
    )

    synth = (
        g.where(colinear | third)
        .select(
            *keys,
            F.lit(-1).cast("long").alias(id_col),
            F.when(colinear, new_i_colinear).otherwise(new_i_third)
            .cast("long").alias(i_col),
            new_j.cast("long").alias(j_col),
            F.col("f_deg").alias(deg_col),
            F.lit(CONF_SYNTH).alias("confidence"),
            F.lit(True).alias("is_synthetic"),
        )
    )
    originals = df.select(
        *keys,
        rid.cast("long").alias(id_col),
        i.cast("long").alias(i_col),
        j.cast("long").alias(j_col),
        d.alias(deg_col),
        F.lit(1.0).alias("confidence"),
        F.lit(False).alias("is_synthetic"),
    )
    return originals.unionByName(synth)
