"""Idempotent keyed upsert — the sandbox stand-in for Iceberg MERGE INTO.

Reference analog (SURVEY.md §2.10 ST6): every task memoizes by content/config
hash so replays are cheap and reprocessing never duplicates output
(``tasks/common/task.py:188-212``; keyed blob cache ``image_cache.py:17-69``).

Semantics: rows in `updates` replace target rows with the same key
(last-write-wins by key, like the reference's dict-override merge), other
target rows survive, new keys insert.  Re-applying the same updates is a
no-op on content — the idempotence that makes streaming replays and backfill
retries safe.

Scale design (O(delta), not O(table)): the table is hash-bucketed on the key
columns.  A merge rewrites ONLY the buckets its updates touch; untouched
buckets are carried forward by reference in a versioned JSON manifest — the
same shape as an Iceberg snapshot: the manifest lists (bucket -> data path,
row count), a commit writes new bucket files plus a new manifest and
atomically flips a pointer file.  Readers of older snapshots are never
disturbed (data files are immutable once referenced).  On real Iceberg this
whole module is `MERGE INTO t USING u ON keys WHEN MATCHED THEN UPDATE *
WHEN NOT MATCHED THEN INSERT *` with snapshot isolation; bucket pruning is
what Iceberg's bucket partition transform gives for free.

Per-snapshot lineage (version, per-bucket rows, rows_total) rides in the
manifest — the metrics half of the north rule's "lineage + metrics in
Iceberg metadata".
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.functions.portable import md5_i64

_SEP = "\x1f"


def _key_bucket(key_cols: list[str], n_buckets: int) -> F.Column:
    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    return F.pmod(md5_i64(key), F.lit(n_buckets)).cast("int")


def _ptr_path(target_dir: str) -> str:
    return os.path.join(target_dir, "_CURRENT")


def _manifest_path(target_dir: str, version: int) -> str:
    return os.path.join(target_dir, f"v{version}.manifest.json")


def current_manifest(target_dir: str) -> dict | None:
    ptr = _ptr_path(target_dir)
    if not os.path.exists(ptr):
        return None
    version = int(open(ptr).read().strip())
    with open(_manifest_path(target_dir, version)) as f:
        return json.load(f)


def _bucket_paths(target_dir: str, manifest: dict, buckets=None) -> list[str]:
    entries = manifest["buckets"]
    keys = sorted(entries, key=int) if buckets is None else [str(b) for b in buckets]
    return [os.path.join(target_dir, entries[k]["path"]) for k in keys if k in entries]


def read_current(spark: SparkSession, target_dir: str) -> DataFrame | None:
    m = current_manifest(target_dir)
    if m is None:
        return None
    paths = _bucket_paths(target_dir, m)
    return spark.read.parquet(*paths)


def read_snapshot(spark: SparkSession, target_dir: str, version: int) -> DataFrame:
    """Time-travel read of an older snapshot (Iceberg VERSION AS OF analog).

    Data files are immutable once referenced by a manifest and never deleted
    by later merges, so every historical version stays readable.
    """
    with open(_manifest_path(target_dir, version)) as f:
        m = json.load(f)
    return spark.read.parquet(*_bucket_paths(target_dir, m))


def _dir_rows(path: str) -> int:
    """Row count of one bucket dir from parquet footers — no Spark job."""
    import pyarrow.parquet as pq

    rows = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                rows += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return rows


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    *,
    n_buckets: int = 16,
    order_col: str | None = None,
) -> dict:
    """Upsert `updates` into the keyed table at `target_dir`.

    ``order_col``: when `updates` may contain several rows per key, the row
    with the greatest ``order_col`` wins (last-write-wins *within* the batch
    too).  Without it, duplicate keys in one batch are collapsed by an
    internal deterministic tie-break on the bucket hash of all columns —
    pass ``order_col`` when intra-batch ordering matters.

    Returns {"version", "rows_total", "rows_updated", "rows_inserted"}.
    """
    os.makedirs(target_dir, exist_ok=True)

    # sweep stale scratch manifests from crashed committers (the versioned
    # manifest names themselves are never partial — see the commit note
    # below).  Age-gated so a concurrent committer mid-write is never robbed
    # of its tmp file; an hour-old .tmp is a crash artifact.
    now = time.time()
    for fn in os.listdir(target_dir):
        if fn.startswith(".manifest-") and fn.endswith(".tmp"):
            p = os.path.join(target_dir, fn)
            try:
                if now - os.path.getmtime(p) > 3600:
                    os.unlink(p)
            except OSError:
                pass

    # --- collapse updates to one row per key (ADVICE round 1: duplicate keys
    # in one batch must not survive the anti-join+union) -------------------
    if order_col is not None:
        ordering = [F.col(order_col).desc()]
    else:
        ordering = [md5_i64(F.concat_ws(_SEP, *[F.col(c).cast("string") for c in updates.columns])).desc()]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)
    updates = (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    manifest = current_manifest(target_dir)
    if manifest is not None and manifest["n_buckets"] != n_buckets:
        n_buckets = manifest["n_buckets"]  # bucket layout is a table property

    updates = updates.withColumn("_bucket", _key_bucket(key_cols, n_buckets))
    # touched-bucket set is bounded by n_buckets — a driver-side list, O(1)
    touched = sorted(
        r["_bucket"] for r in updates.select("_bucket").distinct().collect()
    )

    next_v = 0 if manifest is None else manifest["version"] + 1

    if manifest is None:
        new_df = updates
        n_updated = 0
        n_inserted = new_df.count()
        old_entries: dict = {}
    else:
        old_entries = dict(manifest["buckets"])
        tpaths = _bucket_paths(target_dir, manifest, touched)
        if tpaths:
            cur = spark.read.parquet(*tpaths)
            upd_keys = updates.select(*key_cols).withColumn("_u", F.lit(1))
            # one aggregation for both counters (no per-counter .count() jobs)
            tagged = (
                cur.select(*key_cols).withColumn("_t", F.lit(1))
                .join(upd_keys, key_cols, "full_outer")
            )
            stats = tagged.agg(
                F.sum(F.when(F.col("_t").isNotNull() & F.col("_u").isNotNull(), 1).otherwise(0)).alias("updated"),
                F.sum(F.when(F.col("_t").isNull() & F.col("_u").isNotNull(), 1).otherwise(0)).alias("inserted"),
            ).first()
            n_updated = int(stats["updated"] or 0)
            n_inserted = int(stats["inserted"] or 0)
            kept = cur.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
            kept = kept.withColumn("_bucket", _key_bucket(key_cols, n_buckets))
            new_df = kept.unionByName(updates)
        else:
            new_df = updates
            n_updated = 0
            n_inserted = updates.count()

    # --- write ONLY the touched buckets under this version ----------------
    data_rel = f"v{next_v}.data"
    data_dir = os.path.join(target_dir, data_rel)
    (
        new_df.repartition("_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(data_dir)
    )

    entries = dict(old_entries)
    for b in touched:
        bdir = os.path.join(data_dir, f"_bucket={b}")
        if os.path.isdir(bdir):
            entries[str(b)] = {"path": f"{data_rel}/_bucket={b}", "rows": _dir_rows(bdir)}
        else:
            entries.pop(str(b), None)
    rows_total = sum(e["rows"] for e in entries.values())

    new_manifest = {
        "version": next_v,
        "n_buckets": n_buckets,
        "key_cols": list(key_cols),
        "rows_total": rows_total,
        "rows_updated": n_updated,
        "rows_inserted": n_inserted,
        "buckets": entries,
    }
    # compare-and-swap commit with crash atomicity: the manifest is written
    # COMPLETELY to a private tmp file, then published under its versioned
    # name via os.link — which, like O_EXCL, fails if the name exists (two
    # writers that both read version v-1 cannot both commit v; the loser
    # fails loudly instead of silently discarding the winner's rows —
    # Iceberg's optimistic-concurrency commit analog), but unlike a direct
    # O_EXCL write can never leave a PARTIAL manifest-v file behind on a
    # crash: the versioned name either does not exist or points at a fully
    # written manifest, so a crashed commit never wedges later merges.
    mpath = _manifest_path(target_dir, next_v)
    tmp_m = os.path.join(target_dir, f".manifest-{next_v}.{os.getpid()}.tmp")
    with open(tmp_m, "w") as f:
        json.dump(new_manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp_m, mpath)  # atomic AND exclusive publish
    except FileExistsError as e:
        raise RuntimeError(
            f"concurrent merge detected: manifest version {next_v} already "
            "committed by another writer; re-read the table and retry"
        ) from e
    finally:
        # best-effort scratch cleanup on EVERY exit path (success, lost
        # race, or an os.link failure such as a no-hardlink filesystem) —
        # a leaked .tmp never wedges anything, but it shouldn't accumulate
        try:
            os.unlink(tmp_m)
        except OSError:
            pass

    tmp_ptr = os.path.join(target_dir, "._CURRENT.tmp")
    with open(tmp_ptr, "w") as f:
        f.write(str(next_v))
    os.replace(tmp_ptr, _ptr_path(target_dir))  # atomic snapshot flip
    return {
        "version": next_v,
        "rows_total": rows_total,
        "rows_updated": n_updated,
        "rows_inserted": n_inserted,
    }
