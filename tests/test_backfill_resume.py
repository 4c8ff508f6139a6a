"""Checkpoint/resume invariants of the backfill driver.

Mirrors the reference's cache-hit-equals-recompute assertions
(``tasks/text_extraction/test/test_text_extractor.py:49-56``) and the
FIXTURES.md §5 resume fixture: delete half the checkpoints, re-run, final
table identical to a clean run.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from tests.oracle_check import canonical_rows
from uncharted_ta1_spark.plans.backfill import (
    OP_ID,
    read_backfill_output,
    run_backfill,
)

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


def _collect(spark, out_dir):
    pdf = read_backfill_output(spark, out_dir).drop("bucket").toPandas()
    # run-vs-run comparison of operator output (array payloads allowed) —
    # never crosses the driver surface, so the lenient canonicalizer is fine
    return canonical_rows(pdf, strict=False)


def test_backfill_resume_identical(spark, tmp_path):
    clean_dir = str(tmp_path / "clean")
    s1 = run_backfill(spark, SF, clean_dir, n_buckets=N_BUCKETS)
    assert s1["buckets_computed"] == N_BUCKETS
    clean = _collect(spark, clean_dir)
    assert len(clean) > 0

    # interrupted run: drop output + checkpoint rows for half the buckets
    broken_dir = str(tmp_path / "broken")
    run_backfill(spark, SF, broken_dir, n_buckets=N_BUCKETS)
    killed = {0, 3, 5, 6}
    for b in killed:
        shutil.rmtree(os.path.join(broken_dir, "data", f"bucket={b}"))
    ckpt = os.path.join(broken_dir, "_checkpoint")
    for fname in os.listdir(ckpt):
        fp = os.path.join(ckpt, fname)
        if fname.endswith(".parquet") and pq.read_table(fp).to_pylist()[0]["bucket"] in killed:
            os.remove(fp)

    s2 = run_backfill(spark, SF, broken_dir, n_buckets=N_BUCKETS)
    assert s2["buckets_done_before"] == N_BUCKETS - len(killed)
    assert s2["buckets_computed"] == len(killed)
    assert _collect(spark, broken_dir) == clean

    # idempotent: a third run computes nothing
    s3 = run_backfill(spark, SF, broken_dir, n_buckets=N_BUCKETS)
    assert s3["buckets_computed"] == 0


def test_orphan_bucket_replaced_not_duplicated(spark, tmp_path):
    """Crash window between a bucket's data rename and its checkpoint commit:
    the next run must REPLACE the orphan bucket dir, never append to it —
    row counts stay identical to a clean run (round-1 ADVICE duplication
    window)."""
    out = str(tmp_path / "orphan")
    run_backfill(spark, SF, out, n_buckets=N_BUCKETS)
    clean = _collect(spark, out)

    # simulate the crash: bucket 2's data is visible but its commit is gone
    ckpt = os.path.join(out, "_checkpoint")
    for fname in os.listdir(ckpt):
        fp = os.path.join(ckpt, fname)
        if fname.endswith(".parquet") and pq.read_table(fp).to_pylist()[0]["bucket"] == 2:
            os.remove(fp)

    s = run_backfill(spark, SF, out, n_buckets=N_BUCKETS)
    assert s["buckets_computed"] == 1
    assert _collect(spark, out) == clean  # no duplicate rows in bucket 2


def test_config_rotation_invalidates(spark, tmp_path):
    out = str(tmp_path / "cfg")
    run_backfill(spark, SF, out, n_buckets=4)
    # same config → no work; changed config → full recompute
    assert run_backfill(spark, SF, out, n_buckets=4)["buckets_computed"] == 0
    s = run_backfill(spark, SF, out, n_buckets=4, gap_sec=600)
    assert s["buckets_computed"] == 4


def test_lineage_metrics_recorded(spark, tmp_path):
    out = str(tmp_path / "lin")
    run_backfill(spark, SF, out, n_buckets=4)
    from uncharted_ta1_spark.plans.checkpoint import CheckpointLog

    rows = CheckpointLog(os.path.join(out, "_checkpoint")).lineage()
    assert len(rows) == 4
    assert all(r["op_id"] == OP_ID for r in rows)
    assert sum(r["rows_written"] for r in rows) > 0
    assert all(r["bytes_written"] > 0 for r in rows)
    assert all(r["committed_at_epoch"] > 0 for r in rows)
