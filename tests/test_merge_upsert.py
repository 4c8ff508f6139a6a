"""MERGE-upsert semantics: last-write-wins by key, survivors untouched,
replay idempotence (ST6)."""

from __future__ import annotations

from tests.oracle_check import canonical_rows
from uncharted_ta1_spark.plans.merge import merge_upsert, read_current


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, op_id string, payload long")


def test_merge_upsert_semantics(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = merge_upsert(spark, t, _df(spark, [("d1", "op", 1), ("d2", "op", 2)]), ["doc_id", "op_id"])
    assert s1 == {"version": 0, "rows_total": 2, "rows_updated": 0, "rows_inserted": 2}

    # d2 updated, d3 inserted, d1 untouched
    s2 = merge_upsert(spark, t, _df(spark, [("d2", "op", 20), ("d3", "op", 3)]), ["doc_id", "op_id"])
    assert s2["rows_total"] == 3 and s2["rows_updated"] == 1 and s2["rows_inserted"] == 1
    got = {r.doc_id: r.payload for r in read_current(spark, t).collect()}
    assert got == {"d1": 1, "d2": 20, "d3": 3}


def test_merge_replay_idempotent(spark, tmp_path):
    t = str(tmp_path / "tbl2")
    upd = _df(spark, [("a", "op", 1), ("b", "op", 2)])
    merge_upsert(spark, t, upd, ["doc_id", "op_id"])
    before = canonical_rows(read_current(spark, t).toPandas())
    s = merge_upsert(spark, t, upd, ["doc_id", "op_id"])  # replay
    after = canonical_rows(read_current(spark, t).toPandas())
    assert before == after
    assert s["rows_updated"] == 2 and s["rows_inserted"] == 0
