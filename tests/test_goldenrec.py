"""Golden-record survivorship vs a pure-python model."""

from __future__ import annotations


def test_golden_records_hand_fixture(spark):
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.operators.goldenrec import golden_records

    rows = [
        # cluster 1: en majority, source tie (s1/s2 once each -> s1 wins lex)
        (5, "en", "s2", 100, 1),
        (3, "en", "s1", 250, 1),
        (9, "de", "s1", 80, 1),
        # cluster 2: lang tie (de/en once each -> de wins lex)
        (7, "de", "s9", 10, 2),
        (2, "en", "s9", 20, 2),
        # cluster 3: singleton
        (11, "zh", "s3", 42, 3),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long, ck long"
    )
    got = {
        r.cluster_key: r
        for r in golden_records(docs, cluster_key=F.col("ck")).collect()
    }
    r = got[1]
    assert (r.golden_doc_id, r.n_members, r.golden_n_chars) == (3, 3, 250)
    assert (r.golden_lang, r.golden_source) == ("en", "s1")
    r = got[2]
    assert (r.golden_doc_id, r.golden_lang, r.golden_source) == (2, "de", "s9")
    r = got[3]
    assert (r.n_members, r.golden_lang, r.golden_n_chars) == (1, "zh", 42)


def test_golden_records_cover_all_docs_on_corpus(spark):
    """Every document lands in exactly one cluster; member counts sum to
    the corpus size; the surviving id is always a member."""
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.functions.portable import md5_i64, words_col
    from uncharted_ta1_spark.operators.goldenrec import golden_records

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    key = md5_i64(F.array_join(F.slice(words_col(F.col("text")), 1, 3), " "))
    out = golden_records(docs, cluster_key=key).toPandas()
    assert out.n_members.sum() == docs.count()
    assert (out.n_members >= 1).all()
    assert out.cluster_key.is_unique
    # at least one real multi-member cluster must exist in the corpus
    assert (out.n_members > 1).any()
