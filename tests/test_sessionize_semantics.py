"""Sessionization boundary semantics: a gap of exactly `gap` stays in-session
(DBSCAN <= eps reachability, reference geo_coordinates.py:23-26); strictly
greater starts a new session.  Plus invariants of the derived tables."""

from __future__ import annotations

import pyspark.sql.functions as F

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.operators.sessionize import sessionize

SF = "/root/testdata/sf0.001"


def test_gap_boundary_exact(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 100, 0), (3, 200, 0), (4, 301, 0), (5, 401, 0)],
        "event_id long, ts_us long, user_id long",
    )
    out = sessionize(df, keys=["user_id"], ts="ts_us", gap=100)
    got = {r.event_id: r.session_id for r in out.collect()}
    # gaps: 100 (stay), 100 (stay), 101 (new), 100 (stay)
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}


def test_sessions_monotone_and_dense(spark):
    ev = datagen.events_epoch_df(spark, SF)
    out = sessionize(ev, keys=["user_id"], ts="ts_us", gap=1_800_000_000)
    pdf = out.select("user_id", "ts_us", "session_id").toPandas()
    for _, grp in pdf.sort_values(["user_id", "ts_us"]).groupby("user_id"):
        sids = grp.session_id.tolist()
        assert sids[0] == 0
        for a, b in zip(sids, sids[1:]):
            assert b in (a, a + 1)  # dense, monotone


def test_sequences_invariants(spark):
    seq = datagen.sequences_df(spark, SF)
    # n_tok == size(tokens) everywhere (FIXTURES.md §1 invariant)
    assert seq.where(F.size("tokens") != F.col("n_tok")).count() == 0
    # (doc_id, source, event_epoch) is a key
    assert (
        seq.groupBy("doc_id", "source", "event_epoch").count().where("count > 1").count()
        == 0
    )
    # hot-key skew exists (FIXTURES.md: ~1% of docs carry a large share)
    per_doc = seq.groupBy("doc_id").count().toPandas()
    top1pct = per_doc["count"].nlargest(max(len(per_doc) // 100, 1)).sum()
    assert top1pct / per_doc["count"].sum() > 0.03


def test_derivation_deterministic(spark):
    a = datagen.sequences_df(spark, SF).orderBy("doc_id", "source", "seq_no").toPandas()
    b = datagen.sequences_df(spark, SF).orderBy("doc_id", "source", "seq_no").toPandas()
    assert a.equals(b)
