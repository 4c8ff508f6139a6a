"""Token JSD and Zipf-slope corpus diagnostics."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.feathash import vocab_index


def _jsd(spark, docs):
    """Inline twin of q_token_jsd's algebra over a hand corpus."""
    from uncharted_ta1_spark.functions.portable import words_col

    toks = spark.createDataFrame(docs).select(
        (F.col("lang") == "en").alias("is_en"),
        F.explode(words_col(F.col("text"))).alias("word"),
    )
    per = toks.groupBy("word").agg(
        F.sum(F.col("is_en").cast("long")).alias("a"),
        F.sum((~F.col("is_en")).cast("long")).alias("b"),
    )
    tot = per.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    j = per.join(F.broadcast(tot))
    p = F.col("a").cast("double") / F.col("na").cast("double")
    q = F.col("b").cast("double") / F.col("nb").cast("double")
    m = (p + q) / F.lit(2.0)
    term = F.when(F.col("a") > 0, p * F.log(p / m) / F.lit(2.0)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("b") > 0, q * F.log(q / m) / F.lit(2.0)).otherwise(
        F.lit(0.0)
    )
    [r] = (
        j.select(F.floor(term * F.lit(1e12)).alias("t"))
        .agg((F.sum("t") / F.lit(1e12)).alias("jsd"))
        .collect()
    )
    return r.jsd


def test_jsd_identical_distributions_zero(spark):
    docs = [
        Row(lang="en", text="x y z x"),
        Row(lang="de", text="x y z x"),
    ]
    assert abs(_jsd(spark, docs)) < 1e-9


def test_jsd_disjoint_distributions_ln2(spark):
    docs = [
        Row(lang="en", text="aa bb cc"),
        Row(lang="fr", text="dd ee ff"),
    ]
    # disjoint supports: JSD = ln 2 (up to the 1e-12 floor grid)
    assert abs(_jsd(spark, docs) - math.log(2.0)) < 1e-9


def test_zipf_slope_on_exact_power_law(spark):
    # word_i appears round(2000 / i) times: ln f = ln 2000 - 1 * ln rank
    words = []
    for i in range(1, 30):
        words += [f"w{i:02d}"] * round(2000 / i)
    docs = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    v = vocab_index(docs)
    x = F.log((F.col("word_id") + 1).cast("double"))
    y = F.log(F.col("n_occurrences").cast("double"))
    qz = v.select(
        F.floor(x * F.lit(1e6)).alias("qx"),
        F.floor(y * F.lit(1e6)).alias("qy"),
        F.floor(x * y * F.lit(1e6)).alias("qxy"),
        F.floor(x * x * F.lit(1e6)).alias("qxx"),
    )
    [s] = qz.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum("qxy").alias("sxy"),
        F.sum("qxx").alias("sxx"),
    ).collect()
    n, sx, sy, sxy, sxx = (
        float(s.n),
        s.sx / 1e6,
        s.sy / 1e6,
        s.sxy / 1e6,
        s.sxx / 1e6,
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(slope + 1.0) < 0.01
