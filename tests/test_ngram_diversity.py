"""Hand-counted distinct-n diversity ratios."""

from __future__ import annotations


def test_ngram_diversity_hand_counted(spark):
    from uncharted_ta1_spark.operators.textstats import ngram_diversity

    rows = [
        ("a", 0, "tpl", [1, 2, 1, 2]),   # bigrams: 1_2, 2_1, 1_2 -> d2=2/t2=3
        ("b", 0, "tpl", [1, 2]),          # bigram: 1_2 (repeat across rows)
        ("c", 0, "div", [5, 6, 7]),       # all distinct
        ("d", 0, "solo1", [9]),           # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id string, seq_no long, source string, tokens array<int>")
    out = ngram_diversity(df).toPandas().set_index("source")

    tpl = out.loc["tpl"]
    assert (tpl.t1, tpl.d1, tpl.t2, tpl.d2) == (6, 2, 4, 2)
    assert tpl.distinct1 == round(2 / 6, 9) and tpl.distinct2 == 0.5

    div = out.loc["div"]
    assert (div.t1, div.d1, div.t2, div.d2) == (3, 3, 2, 2)
    assert div.distinct1 == 1.0 and div.distinct2 == 1.0

    solo = out.loc["solo1"]
    assert (solo.t1, solo.d1, solo.t2, solo.d2) == (1, 1, 0, 0)
    assert solo.distinct2 is None or solo.distinct2 != solo.distinct2
