"""Bucketed + sorted physical layout — the shuffle-free feature path.

The north rule's input is an Iceberg table of pre-tokenized sequences.
Iceberg's ``bucket(N, doc_id)`` partition transform plus sorted data files
have an exact Spark analog: a bucketed table (``bucketBy(N, keys)`` +
``sortBy(keys, event_time)``).  When the sequences table is stored this way,
EVERY ordered window feature (lag/lead/rolling/session — the whole
``sequence_features`` stack) plans with ZERO Exchange nodes: the scan itself
satisfies the window's ClusteredDistribution and the sort order satisfies
its ordering (asserted by tests/test_bucketed_layout.py).

At 100 TB this is the difference between re-shuffling the corpus on every
backfill run and paying the shuffle ONCE at ingest: the recurring cost of
the feature pipeline drops to scan + window + the thin as-of union.  The
same layout co-locates equi-joins on the bucket keys (no shuffle on the
bucketed side) — the storage-level complement of plans/backfill.py's
logical bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_sequences(
    seq: DataFrame,
    table: str,
    *,
    n_buckets: int = 8,
    keys: tuple[str, str] = ("doc_id", "source"),
    order: str = "event_epoch",
) -> None:
    """Persist the sequences as a bucketed, per-bucket-sorted table.

    On Iceberg: ``ALTER TABLE ... WRITE ORDERED BY`` + a bucket partition
    transform; here Spark's managed bucketed table is the sandbox stand-in.
    """
    (
        seq.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys, order)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
