"""uncharted_ta1_spark — a PySpark-native point-in-time feature-engineering engine.

A from-scratch re-expression of the query/data-processing capabilities of the
DARPA-CRITICALMAAS/uncharted-ta1 ("LARA") reference pipeline as an idiomatic
Spark engine: leakage-free as-of joins, lag/lead token-context windows,
activity-gap sessionization, grouped-aggregate filters, dedup/similarity
operators for training-data pipelines, and a checkpointed resumable backfill
driver with per-partition lineage metrics.

Design notes (scale-first):
  * Everything is declared with the DataFrame / Spark SQL API so Catalyst
    performs predicate pushdown, column pruning and join planning; AQE handles
    skew joins and partition coalescing at runtime.
  * Per-token work (token-array slicing, n_tok-weighted aggregates) stays
    JVM-side via builtin higher-order array functions; the only Python that
    touches data is Arrow-batched (pandas UDFs / mapInPandas) — zero
    per-row Python, mirroring the north rule.
  * The as-of join is a single-shuffle union+window formulation (no
    inequality join, no broadcast of the big side) — see operators/asof.py.
"""

__version__ = "0.1.0"
