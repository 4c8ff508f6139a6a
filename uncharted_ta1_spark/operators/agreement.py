"""Inter-annotator agreement: Cohen's kappa from confusion counts.

Reference analog: the reference routinely has TWO opinions about the same
item — two extractors voting on a coordinate's hemisphere
(``tasks/geo_referencing/coordinates_extractor.py`` hemisphere votes), a
model prediction vs a ground-truth label
(``tasks/segmentation/ditod/table_evaluation/evaluate.py:360-400``), a
YOLO box vs a legend annotation
(``tasks/point_extraction/legend_analyzer.py:202-300``).  Raw percent
agreement flatters lopsided label distributions; Cohen's kappa is the
standard chance-corrected statistic a labeling pipeline reports before
trusting weak labels at scale.

Scale shape: ONE combinable conditional aggregation per group — four
BIGINT confusion cells — then the kappa formula over the per-group
summary row.  No joins, no windows, no second pass; the float result
comes from exact integer counts through a fixed IEEE tree, so it
hash-matches a SQL oracle bit for bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cohen_kappa(
    df: DataFrame,
    *,
    rater_a: Column,
    rater_b: Column,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Per-``keys`` Cohen's kappa between two boolean rater columns.

    Returns (keys..., n, n11, n10, n01, n00, po, kappa): ``po`` is the
    observed agreement rate; ``kappa`` is NULL when expected agreement is
    1 (a degenerate group where both raters are constant — kappa is
    undefined there, and reporting NULL beats a 0/0).
    """
    a = rater_a.cast("long")
    b = rater_b.cast("long")
    cells = df.groupBy(*[F.col(c) for c in keys]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("n11"),
        F.sum(a * (1 - b)).cast("long").alias("n10"),
        F.sum((1 - a) * b).cast("long").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("n00"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    po = (dbl("n11") + dbl("n00")) / dbl("n")
    pa = (dbl("n11") + dbl("n10")) / dbl("n")
    pb = (dbl("n11") + dbl("n01")) / dbl("n")
    pe = pa * pb + (F.lit(1.0) - pa) * (F.lit(1.0) - pb)
    return cells.select(
        *keys,
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 9).alias("po"),
        F.when(pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 9)).alias(
            "kappa"
        ),
    )
