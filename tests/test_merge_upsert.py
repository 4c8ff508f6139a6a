"""MERGE-upsert semantics: last-write-wins by key, survivors untouched,
replay idempotence (ST6), O(delta) bucket-scoped rewrites."""

from __future__ import annotations

import os

from tests.oracle_check import canonical_rows
from uncharted_ta1_spark.plans.merge import current_manifest, merge_upsert, read_current


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


def test_merge_intra_batch_duplicate_keys_collapse(spark, tmp_path):
    """Several rows for one key inside ONE batch must collapse to a single
    surviving row (greatest order_col wins) — no duplicate keys in target."""
    t = str(tmp_path / "tbl3")
    upd = spark.createDataFrame(
        [("k", "op", 1, 10), ("k", "op", 2, 20), ("j", "op", 1, 5)],
        "doc_id string, op_id string, ver long, payload long",
    )
    s = merge_upsert(spark, t, upd, ["doc_id", "op_id"], order_col="ver")
    assert s["rows_total"] == 2 and s["rows_inserted"] == 2
    got = {r.doc_id: r.payload for r in read_current(spark, t).collect()}
    assert got == {"k": 20, "j": 5}


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """O(delta) guarantee: a merge must NOT rewrite buckets its updates do
    not touch — untouched buckets stay byte-identical files, referenced from
    the prior snapshot by the new manifest."""
    t = str(tmp_path / "tbl4")
    base = [(f"d{i}", "op", i) for i in range(64)]
    merge_upsert(spark, t, _df(spark, base), ["doc_id", "op_id"], n_buckets=8)
    m1 = current_manifest(t)

    def bucket_files(manifest, b):
        d = os.path.join(t, manifest["buckets"][b]["path"])
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        }

    s2 = merge_upsert(spark, t, _df(spark, [("d1", "op", 100)]), ["doc_id", "op_id"])
    m2 = current_manifest(t)
    touched = {b for b in m2["buckets"] if m2["buckets"][b]["path"] != m1["buckets"][b]["path"]}
    assert len(touched) == 1, "single-key update must touch exactly one bucket"
    for b in m2["buckets"]:
        if b in touched:
            assert m2["buckets"][b]["path"].startswith(f"v{m2['version']}.data")
        else:
            # untouched bucket: same path AND same physical files
            assert m2["buckets"][b] == m1["buckets"][b]
            assert bucket_files(m2, b) == bucket_files(m1, b)
    assert s2["rows_total"] == 64 and s2["rows_updated"] == 1
    got = {r.doc_id: r.payload for r in read_current(spark, t).collect()}
    assert got["d1"] == 100 and len(got) == 64


def test_concurrent_commit_collision_fails_loudly(spark, tmp_path):
    """Two writers that both observed version v must not both commit v+1:
    the second commit hits the O_CREAT|O_EXCL manifest CAS and raises
    instead of silently discarding the first writer's rows."""
    import pytest

    from uncharted_ta1_spark.plans.merge import _manifest_path

    t = str(tmp_path / "tbl_cas")
    merge_upsert(spark, t, _df(spark, [("d1", "op", 1)]), ["doc_id", "op_id"])
    # simulate a racing writer that already committed version 1
    with open(_manifest_path(t, 1), "w") as f:
        f.write("{}")
    with pytest.raises(RuntimeError, match="concurrent merge"):
        merge_upsert(spark, t, _df(spark, [("d2", "op", 2)]), ["doc_id", "op_id"])
