"""Bitemporal as-of: hand-computed fixtures + leakage-freedom property."""

from __future__ import annotations


def _fixture(spark):
    events = spark.createDataFrame(
        [
            # doc A: e1 arrives instantly, e2 arrives 500s late
            ("A", "s", 0, 1000, 1000, 10),
            ("A", "s", 1, 1200, 1700, 20),
            # doc B: same epoch twice (tiebreak by seq), both on time
            ("B", "s", 0, 2000, 2000, 30),
            ("B", "s", 1, 2000, 2000, 40),
            # doc C: its only row arrives after every probe
            ("C", "s", 0, 3000, 9999, 50),
        ],
        "doc_id string, source string, seq_no int, event_epoch long, "
        "ingest_epoch long, n_tok long",
    )
    probes = spark.createDataFrame(
        [
            ("p1", "A", "s", 1300),  # naive picks e2(1200); bt must pick e1
            ("p2", "A", "s", 1800),  # e2 arrived by 1800: both pick e2
            ("p3", "A", "s", 900),   # before everything: fallback, no leak
            ("p4", "B", "s", 2000),  # inclusive tie: seq 1 wins both
            ("p5", "C", "s", 3500),  # naive would leak the unarrived row
            ("p6", "Z", "s", 1000),  # unknown entity: fallback
        ],
        "probe_id string, doc_id string, source string, ts_epoch long",
    )
    return events, probes


def test_bitemporal_hand_cases(spark):
    from uncharted_ta1_spark.operators.bitemporal import bitemporal_asof

    events, probes = _fixture(spark)
    got = {
        r.probe_id: r
        for r in bitemporal_asof(events, probes).collect()
    }
    assert len(got) == 6
    r = got["p1"]
    assert (r.bt_event_epoch, r.bt_tiebreak, r.bt_payload) == (1000, 0, 10)
    assert r.naive_event_epoch == 1200 and r.late_leak and not r.fallback_used
    r = got["p2"]
    assert (r.bt_event_epoch, r.bt_payload) == (1200, 20)
    assert not r.late_leak and not r.fallback_used
    r = got["p3"]
    assert r.fallback_used and not r.late_leak
    assert (r.bt_event_epoch, r.bt_payload, r.naive_event_epoch) == (-1, -1, -1)
    r = got["p4"]
    assert (r.bt_event_epoch, r.bt_tiebreak, r.bt_payload) == (2000, 1, 40)
    assert not r.late_leak
    r = got["p5"]
    assert r.fallback_used and r.late_leak and r.naive_event_epoch == 3000
    r = got["p6"]
    assert r.fallback_used and not r.late_leak


def test_bitemporal_never_leaks_on_corpus(spark):
    """Leakage-freedom property on the real corpus: every answered probe's
    row satisfies BOTH event_epoch <= ts and ingest_epoch <= ts, checked
    by joining the answers back against the event table."""
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.datagen import probes_df, sequences_df
    from uncharted_ta1_spark.operators.bitemporal import bitemporal_asof

    seq = sequences_df(spark, "/root/testdata/sf0.001").withColumn(
        "ingest_epoch",
        (
            F.col("event_epoch")
            + F.pmod(F.col("doc_num") * 13 + F.col("seq_no") * 29, F.lit(900))
        ).cast("long"),
    )
    probes = probes_df(spark, "/root/testdata/sf0.001")
    out = bitemporal_asof(seq, probes)
    answered = out.where(~F.col("fallback_used"))
    bad = (
        answered.join(
            seq.select(
                "doc_id",
                "source",
                F.col("seq_no").cast("long").alias("bt_tiebreak"),
                F.col("event_epoch").alias("bt_event_epoch"),
                "ingest_epoch",
            ),
            ["doc_id", "source", "bt_event_epoch", "bt_tiebreak"],
        )
        .where(
            (F.col("bt_event_epoch") > F.col("ts_epoch"))
            | (F.col("ingest_epoch") > F.col("ts_epoch"))
        )
        .count()
    )
    assert bad == 0
    # the synthetic delays must actually produce leak flags to audit
    n_leak = out.where("late_leak").count()
    assert n_leak > 0
    # and every late_leak=false answered probe agrees with the naive as-of
    agree = answered.where(
        (~F.col("late_leak"))
        & (F.col("naive_event_epoch") != F.col("bt_event_epoch"))
    ).count()
    assert agree == 0
