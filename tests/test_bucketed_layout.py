"""Bucketed+sorted layout: the whole window-feature stack runs SHUFFLE-FREE
over a table whose physical layout matches the window keys (the Iceberg
bucket-transform analog) — and produces bit-identical results to the
shuffled path."""

from __future__ import annotations

import re

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.features import sequence_features
from uncharted_ta1_spark.plans.layout import read_bucketed, write_bucketed_sequences

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_window_features_shuffle_free_on_bucketed_layout(spark):
    seq = datagen.sequences_df(spark, SF).select(
        "doc_id", "source", "seq_no", "event_epoch", "tokens", "n_tok"
    )
    write_bucketed_sequences(seq, "seq_bucketed_test", n_buckets=8)
    t = read_bucketed(spark, "seq_bucketed_test")

    feats_bucketed = sequence_features(t)
    plan = _plan(feats_bucketed)
    # the scan satisfies the window's distribution AND ordering: no shuffle
    assert len(re.findall(r"Exchange", plan)) == 0, plan

    # unbucketed baseline needs its one hash exchange
    feats_shuffled = sequence_features(seq)
    assert len(re.findall(r"Exchange", _plan(feats_shuffled))) == 1

    # identical results (column subset that is hashable for exceptAll)
    cols = [
        "doc_id", "source", "seq_no", "event_epoch", "n_tok",
        "lag_n_tok_1", "lead_n_tok_1", "roll_sum_n_tok_w5",
        "session_id", "session_len", "session_sum_n_tok",
    ]
    a = feats_bucketed.select(*cols)
    b = feats_shuffled.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    spark.sql("DROP TABLE IF EXISTS seq_bucketed_test")


def test_equi_join_on_bucket_keys_has_no_extra_shuffle(spark):
    """A groupBy on the bucket keys over the bucketed table is map-side only."""
    import pyspark.sql.functions as F

    seq = datagen.sequences_df(spark, SF).select(
        "doc_id", "source", "seq_no", "event_epoch", "n_tok"
    )
    write_bucketed_sequences(seq, "seq_bucketed_test2", n_buckets=8)
    t = read_bucketed(spark, "seq_bucketed_test2")
    agg = t.groupBy("doc_id", "source").agg(F.sum("n_tok").alias("s"))
    assert "Exchange" not in _plan(agg)
    # values still correct vs the shuffled computation
    base = seq.groupBy("doc_id", "source").agg(F.sum("n_tok").alias("s"))
    assert agg.exceptAll(base).count() == 0 and base.exceptAll(agg).count() == 0
    spark.sql("DROP TABLE IF EXISTS seq_bucketed_test2")
