"""Idempotent keyed upsert — the sandbox stand-in for Iceberg MERGE INTO.

Reference analog (SURVEY.md §2.10 ST6): every task memoizes by content/config
hash so replays are cheap and reprocessing never duplicates output
(``tasks/common/task.py:188-212``; keyed blob cache ``image_cache.py:17-69``).

Semantics: rows in `updates` replace target rows with the same key
(last-write-wins by key, like the reference's dict-override merge), other
target rows survive, new keys insert.  Re-applying the same updates is a
no-op on content — the idempotence that makes streaming replays and backfill
retries safe.

Implementation: read target → anti-join on keys → union → atomic directory
swap (write to a versioned dir, flip a pointer file).  On Iceberg this whole
module is `MERGE INTO t USING u ON keys WHEN MATCHED UPDATE * WHEN NOT
MATCHED INSERT *` with snapshot isolation; the directory-pointer swap mimics
the snapshot commit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _current_version(target_dir: str) -> int | None:
    ptr = os.path.join(target_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    return int(open(ptr).read().strip())


def _data_dir(target_dir: str, version: int) -> str:
    return os.path.join(target_dir, f"v{version}")


def read_current(spark: SparkSession, target_dir: str) -> DataFrame | None:
    v = _current_version(target_dir)
    if v is None:
        return None
    return spark.read.parquet(_data_dir(target_dir, v))


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key_cols: list[str],
) -> dict:
    """Upsert `updates` into the keyed table at `target_dir`.

    Returns {"version", "rows_total", "rows_updated", "rows_inserted"}.
    """
    os.makedirs(target_dir, exist_ok=True)
    current = read_current(spark, target_dir)
    if current is None:
        new_df = updates
        updated = 0
        inserted = updates.count()
        next_v = 0
    else:
        kept = current.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
        n_current = current.count()
        n_kept = kept.count()
        updated = n_current - n_kept
        inserted = updates.count() - updated
        new_df = kept.unionByName(updates)
        next_v = _current_version(target_dir) + 1

    new_dir = _data_dir(target_dir, next_v)
    new_df.write.mode("overwrite").parquet(new_dir)
    total = spark.read.parquet(new_dir).count()

    tmp_ptr = os.path.join(target_dir, "._CURRENT.tmp")
    with open(tmp_ptr, "w") as f:
        f.write(str(next_v))
    os.replace(tmp_ptr, os.path.join(target_dir, "_CURRENT"))  # atomic flip
    return {
        "version": next_v,
        "rows_total": total,
        "rows_updated": int(updated),
        "rows_inserted": int(inserted),
    }
