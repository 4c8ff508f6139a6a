"""Moment-sketch profile: exact registers + population shape statistics."""

from __future__ import annotations


def test_moment_profile_hand_computed(spark):
    from uncharted_ta1_spark.operators.moments import moment_profile

    # g1: symmetric {1,2,3} -> skew 0, excess kurtosis -1.5 (uniform-3)
    # g2: {1,1,1,5} -> right-skewed
    rows = [("g1", v) for v in (1, 2, 3)] + [("g2", v) for v in (1, 1, 1, 5)]
    df = spark.createDataFrame(rows, ["source", "n_tok"])
    out = moment_profile(df).toPandas().set_index("source")

    r1 = out.loc["g1"]
    assert (r1.n, r1.s1, r1.s2, r1.s3, r1.s4) == (3, 6, 14, 36, 98)
    assert r1["mean"] == 2.0 and r1.variance == round(2 / 3, 6)
    assert r1.skewness == 0.0
    assert r1.kurtosis_excess == -1.5

    r2 = out.loc["g2"]
    mu = 2.0
    m2 = (28 / 4) - mu * mu  # = 3
    m3 = (128 / 4) - 3 * mu * (28 / 4) + 2 * mu**3  # = 6
    m4 = (628 / 4) - 4 * mu * (128 / 4) + 6 * mu * mu * (28 / 4) - 3 * mu**4  # = 27
    assert (r2.n, r2.s1, r2.s2, r2.s3, r2.s4) == (4, 8, 28, 128, 628)
    assert r2.variance == round(m2, 6)
    assert abs(r2.skewness - m3 / (m2**1.5)) < 1e-6
    assert abs(r2.kurtosis_excess - (m4 / m2**2 - 3)) < 1e-6


def test_moment_profile_degenerate_group_nulls(spark):
    """A constant group has zero variance: skew/kurtosis must be NULL,
    never a division error or Inf."""
    from uncharted_ta1_spark.operators.moments import moment_profile

    df = spark.createDataFrame([("c", 7), ("c", 7), ("c", 7)], ["source", "n_tok"])
    r = moment_profile(df).toPandas().iloc[0]
    assert r.variance == 0.0
    assert r.skewness is None or r.skewness != r.skewness  # NULL/NaN-safe
    assert r.kurtosis_excess is None or r.kurtosis_excess != r.kurtosis_excess


def test_moment_registers_merge_additively(spark):
    """The five registers computed over two disjoint halves sum to the
    whole-frame registers — the mergeable-sketch property."""
    from uncharted_ta1_spark.operators.moments import moment_profile

    rows = [("s", v) for v in range(1, 65)]
    whole = moment_profile(
        spark.createDataFrame(rows, ["source", "n_tok"])
    ).toPandas().iloc[0]
    h1 = moment_profile(
        spark.createDataFrame(rows[:32], ["source", "n_tok"])
    ).toPandas().iloc[0]
    h2 = moment_profile(
        spark.createDataFrame(rows[32:], ["source", "n_tok"])
    ).toPandas().iloc[0]
    for reg in ("n", "s1", "s2", "s3", "s4"):
        assert h1[reg] + h2[reg] == whole[reg]
