"""Dual-derivation check for fit_residual_outliers (VERDICT r05 task #7).

`fit_residual_outliers` was the one query ever driver-red (r02, a signed-zero
rounding artifact, fixed) and has never been resampled by the driver.  Its
DuckDB oracle is one independent derivation; this test adds a THIRD, fully
independent path — the same exact-integer normal-equation fit expressed as
pure Spark column algebra (zero pandas, zero Arrow, no hash-bucket
applyInPandas machinery) — and asserts agreement with the operator at every
tier including the 5x sf0.5 stress tier.

Both paths share only the IEEE-754 expression tree (by design: the fixed
tree is the determinism contract, see groupfit.py module docstring); they
share no execution machinery, so agreement rules out Arrow transfer, pandas
groupby, bucket-merge, and dtype bugs in one shot.

Equality is bit-strict: NaN must meet NaN (Spark's <=> treats NaN equal),
and zero residuals must agree in SIGN (checked via 1/x reciprocal-infinity,
the exact artifact that made r02 red).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from uncharted_ta1_spark.operators.groupfit import fit_residual_outliers

SF05 = "/tmp/sparkgraft_sf0.5"


def _sql_fit_residuals(seq, sigma=2.0):
    """Normal-equation residuals as pure column algebra.

    Exact integer sufficient statistics (x centered on the group min epoch)
    -> slope/intercept/rmse through the same fixed IEEE tree as
    groupfit._group_params, but computed by Catalyst expressions instead of
    numpy over Arrow batches.
    """
    x0 = seq.groupBy("doc_id", "source").agg(
        F.min("event_epoch").alias("x0")
    )
    b = (
        seq.join(x0, ["doc_id", "source"])
        .withColumn("x", (F.col("event_epoch") - F.col("x0")).cast("long"))
        .withColumn("y", F.col("n_tok").cast("long"))
    )
    p = b.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    p = (
        p.withColumn("num", F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .withColumn("d1", F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .withColumn("d2", F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .withColumn("numf", F.col("num").cast("double"))
        .withColumn("d1f", F.col("d1").cast("double"))
        .withColumn("nf", F.col("n").cast("double"))
        .withColumn("has_fit", F.col("d1") != 0)
        # ANSI mode: /0 throws even for doubles, so every d1f division is
        # gated on has_fit (CaseWhen evaluates only the taken branch)
        .withColumn(
            "slope",
            F.when(F.col("has_fit"), F.col("numf") / F.col("d1f")),
        )
        .withColumn(
            "intercept",
            (F.col("sy").cast("double") - F.col("slope") * F.col("sx").cast("double"))
            / F.col("nf"),
        )
        .withColumn(
            "rmse",
            F.when(
                F.col("has_fit"),
                F.sqrt(
                    F.greatest(
                        (F.col("d2").cast("double")
                         - (F.col("numf") * F.col("numf")) / F.col("d1f"))
                        / (F.col("nf") * F.col("nf")),
                        F.lit(0.0),
                    )
                ),
            ),
        )
    )
    r = F.col("y").cast("double") - (
        F.col("intercept") + F.col("slope") * F.col("x").cast("double")
    )
    # no-fit rows: NULL (pandas NaN -> Arrow null on the operator side)
    return b.join(
        p.select("doc_id", "source", "has_fit", "slope", "intercept", "rmse"),
        ["doc_id", "source"],
    ).select(
        "doc_id",
        "source",
        "seq_no",
        F.when(F.col("has_fit"), r).alias("resid2"),
        (F.col("has_fit") & (F.abs(r) > F.lit(sigma) * F.col("rmse")))
        .alias("is_outlier2"),
    )


def _assert_bit_agreement(spark, sf_dir):
    seq = E._sequences(spark, sf_dir)
    ours = fit_residual_outliers(seq, sigma=2.0).select(
        "doc_id", "source", "seq_no", "resid", "is_outlier"
    )
    theirs = _sql_fit_residuals(seq, sigma=2.0)
    j = ours.join(theirs, ["doc_id", "source", "seq_no"], "full_outer")
    # <=> : NULL-safe and NaN-meets-NaN; the string cast distinguishes
    # "-0.0" from "0.0" (the exact r02 artifact) without ANSI-unsafe division
    bad = j.where(
        ~F.col("resid").eqNullSafe(F.col("resid2"))
        | ~F.col("is_outlier").eqNullSafe(F.col("is_outlier2"))
        | (
            (F.col("resid") == 0.0)
            & (
                F.col("resid").cast("string")
                != F.col("resid2").cast("string")
            )
        )
    )
    n_rows = ours.count()
    assert n_rows > 0
    mism = bad.limit(5).collect()
    assert not mism, mism


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_dual_derivation_agrees(spark, sf_dir):
    _assert_bit_agreement(spark, sf_dir)


def test_dual_derivation_agrees_sf05_stress(spark):
    """The 5x id-shifted stress tier (built on demand, cached in /tmp)."""
    if not os.path.isdir(SF05):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "make_sf.py")],
            check=True,
            timeout=600,
        )
    _assert_bit_agreement(spark, SF05)
