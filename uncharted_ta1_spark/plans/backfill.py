"""Resumable, bucket-partitioned feature backfill driver.

The batch analog of the reference's queued per-document processing with
memoized resume (``tasks/common/request_client.py:355-475`` +
``task.py:188-212``): the corpus is split into ``n_buckets`` by a stable
md5-based hash of ``doc_id``, each bucket is computed and committed
atomically with lineage metrics, and a re-run skips committed buckets.

Why buckets (and not per-row merge): at 10^12 rows the resume check must be
O(buckets), not O(rows) — a bucket is the unit of both progress and data
layout (the output is physically partitioned by ``bucket``, so downstream
reads prune).  The same hash also bounds skew: a hot doc_id concentrates in
ONE bucket and slows only that bucket's task, never the whole stage; bucket
count is the lever (north rule: salted repartitioning for hot keys).

Determinism: the output content is a pure function of (input tables, config)
— verified by tests/test_backfill_resume.py which deletes half the
checkpoints and asserts the re-run reproduces the clean-run output exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.features import SESSION_GAP_SEC, feature_backfill
from uncharted_ta1_spark.functions.portable import md5_i64
from uncharted_ta1_spark.plans.checkpoint import CheckpointLog, config_hash

OP_ID = "feature_backfill"


def bucket_col(doc_id: F.Column, n_buckets: int) -> F.Column:
    return F.pmod(md5_i64(doc_id), F.lit(n_buckets)).cast("int")


def _dir_stats(path: str) -> tuple[int, int]:
    """(rows, bytes) of one bucket's parquet directory, from file metadata."""
    import pyarrow.parquet as pq

    rows = 0
    nbytes = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                fp = os.path.join(root, f)
                rows += pq.ParquetFile(fp).metadata.num_rows
                nbytes += os.path.getsize(fp)
    return rows, nbytes


def run_backfill(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    n_buckets: int = 8,
    gap_sec: int = SESSION_GAP_SEC,
    start_epoch: int | None = None,
    end_epoch: int | None = None,
) -> dict:
    """Compute the feature table for all not-yet-committed buckets.

    Returns a summary dict {buckets_done_before, buckets_computed, rows}.
    """
    cfg = {
        "op": OP_ID,
        "sf_dir": sf_dir,
        "n_buckets": n_buckets,
        "gap_sec": gap_sec,
        "start_epoch": start_epoch,
        "end_epoch": end_epoch,
    }
    cfg_hash = config_hash(cfg)
    log = CheckpointLog(os.path.join(out_dir, "_checkpoint"))
    done = log.completed_buckets(OP_ID, cfg_hash)
    todo = [b for b in range(n_buckets) if b not in done]
    if not todo:
        return {"buckets_done_before": len(done), "buckets_computed": 0, "rows": 0}

    seq = datagen.sequences_df(spark, sf_dir).select(
        "doc_id", "source", "seq_no", "event_epoch", "tokens", "n_tok"
    )
    prb = datagen.probes_df(spark, sf_dir).select(
        "probe_id", "doc_id", "source", "ts_epoch"
    )
    # prune both sides to pending buckets BEFORE the shuffle — on a real
    # bucket-partitioned Iceberg table this becomes partition pruning
    seq = seq.withColumn("bucket", bucket_col(F.col("doc_id"), n_buckets))
    prb = prb.withColumn("bucket", bucket_col(F.col("doc_id"), n_buckets))
    if len(todo) < n_buckets:
        seq = seq.where(F.col("bucket").isin(todo))
        prb = prb.where(F.col("bucket").isin(todo))

    out = feature_backfill(
        seq.drop("bucket"),
        prb,
        gap_sec=gap_sec,
        start_epoch=start_epoch,
        end_epoch=end_epoch,
    )

    # Crash-safe commit protocol: write ALL pending buckets into a staging
    # dir, then atomically rename each bucket dir into data/bucket=N
    # immediately before its checkpoint commit.  A crash leaves a bucket in
    # exactly one of two states: (a) not renamed + not committed -> the next
    # run recomputes it from scratch; (b) renamed + not committed -> the next
    # run sees it pending, REPLACES the orphan dir and re-commits.  Never
    # appended-to twice, so no duplicate rows (round-1 ADVICE: append-mode
    # write + late commit had a duplication window).
    import shutil

    data_dir = os.path.join(out_dir, "data")
    staging = os.path.join(out_dir, "_staging")
    shutil.rmtree(staging, ignore_errors=True)
    # no repartition("bucket") before the write: it forced one extra FULL
    # exchange of the wide feature rows into <= n_buckets tasks (a
    # parallelism collapse AND the widest shuffle in the plan — guide §2.4).
    # The dynamic partitionBy write splits each task's output by bucket
    # directly; the commit/rename protocol only needs the bucket=N dirs,
    # not one-file-per-bucket.  At cluster scale the recurring form of this
    # job writes through the bucketed table layout (plans/layout.py), which
    # clusters at ingest instead of per-run.
    (
        out.write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )

    os.makedirs(data_dir, exist_ok=True)
    total_rows = 0
    for b in todo:
        sdir = os.path.join(staging, f"bucket={b}")
        bdir = os.path.join(data_dir, f"bucket={b}")
        if os.path.isdir(sdir):
            if os.path.isdir(bdir):
                shutil.rmtree(bdir)  # orphan of a crashed run: replace, don't append
            os.replace(sdir, bdir)
        rows, nbytes = _dir_stats(bdir) if os.path.isdir(bdir) else (0, 0)
        log.commit(OP_ID, cfg_hash, b, rows, nbytes)
        total_rows += rows
    shutil.rmtree(staging, ignore_errors=True)
    return {
        "buckets_done_before": len(done),
        "buckets_computed": len(todo),
        "rows": total_rows,
    }


def read_backfill_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))
