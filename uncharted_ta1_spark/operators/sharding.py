"""Deterministic token-budgeted export sharding + shard manifests — the
"ship the curated corpus" step: assign every document a shard id such
that shards are contiguous in a stable order and each holds ~budget
tokens, and emit a content-hashed manifest per shard so a downstream
trainer (or a resumed export) can verify integrity file by file.

Reference analog: the reference's CDR writer partitions results into
per-map output objects with content hashing for idempotent re-publish
(``cdr/server.py:273-335``; ``tasks/common/io.py`` bucketed object
writes) — here generalized to fixed-token-budget training shards (the
public WebDataset/TFRecord sharding convention).

Semantics: within each split, documents order by doc_id; a document's
shard is floor(exclusive_token_cumsum / budget) — whole documents never
split, so a shard can exceed the budget by at most one document's
tokens (documented WebDataset behavior).  Everything is exact integer
arithmetic; the manifest hash is an md5 over the ordered doc-id csv —
deterministic in any engine.

Scale design (100 TB): the running token sum comes from
:func:`uncharted_ta1_spark.operators.binning.bucketed_cumsum` — GK
range buckets + broadcast offsets, NO per-split global sort (with 3
splits the naive window would funnel the corpus through 3 tasks).  The
manifest reduction is one combinable groupBy per shard; the ordered
hash uses sort_array(collect_list) over shard-sized groups (bounded by
budget / min_doc_tokens rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHARD_BUDGET = 2000  # tokens per shard at the test tiers


def shard_manifest(
    docs: DataFrame,
    *,
    split_col: Column,
    weight_col: Column,
    budget: int = SHARD_BUDGET,
) -> DataFrame:
    """Per-(split, shard) manifest: doc/token counts, id range, md5 of
    the ordered doc-id csv."""
    from uncharted_ta1_spark.operators.binning import bucketed_cumsum

    base = docs.select(
        "doc_id", split_col.alias("split"), weight_col.cast("long").alias("w")
    )
    cum = bucketed_cumsum(
        base, keys=["split"], order_col="doc_id", val_col="w", out_col="_cum"
    )
    assigned = cum.select(
        "split",
        "doc_id",
        "w",
        F.expr(f"(_cum - w) div {budget}").cast("long").alias("shard_id"),
    )
    return assigned.groupBy("split", "shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id"))),
                    lambda s: s.doc_id.cast("string"),
                ),
                ",",
            )
        ).alias("manifest_hash"),
    )
