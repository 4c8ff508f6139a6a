"""Connected components over candidate-pair graphs — dup clusters.

Every dedup pipeline ends here: pair generators (minhash/simhash/jaccard)
emit EDGES, but the deliverable is CLUSTERS — one canonical document per
connected component, everything else marked duplicate.  Reference analog:
the reference collapses duplicate extractions by key-override merge
(``tasks/common/pipeline.py:188-199``, ``text_filter.py:113-124``); at
corpus scale the same idea needs transitive closure over the near-dup graph.

Algorithm: iterative min-label propagation.  Every node starts labeled with
itself; each round a node adopts the minimum label among itself and its
neighbors; converges in O(graph diameter) rounds (dup clusters are
small-world: diameter is tiny).  Each round is ONE hash-join + ONE groupBy
— all shuffle-bounded, no per-key quadratic term; ``localCheckpoint``
truncates the lineage so plans don't grow with iterations.  The per-round
``count`` of changed labels is the convergence test — a scalar job result,
not a data collect (at 10^12 edges you'd cap rounds at log2(diameter)+slack
and skip the check; ``max_iter`` is that cap).

Determinism: labels are min() over string ids — binary collation in both
Spark and DuckDB for the ASCII ids used here, so the cluster ids are
engine-exact; the oracle is a recursive-CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    edges: DataFrame,
    *,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every node with >= 1 edge.

    ``cluster_id`` is the lexicographically smallest member — the canonical
    doc of the dup cluster.  Singletons (no edges) are by definition their
    own cluster and are not emitted (semi-join the corpus afterwards if the
    full partition is needed).
    """
    # materialize the symmetrized edge set ONCE — every iteration joins
    # against it, and without the checkpoint the full upstream lineage
    # (e.g. a simhash pair generator) would recompute per round
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = sym.select("a").distinct().withColumn("lab", F.col("a"))

    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("a").alias("b"), F.col("lab").alias("blab")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("blab").alias("nlab"))
        )
        folded = F.least(F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab")))
        # the convergence flag rides the update row: ONE materializing job
        # per round (the checkpoint), then a cheap count over checkpointed
        # data — no extra join against the previous generation
        new_labels = (
            labels.join(nbr_min, "a", "left")
            .select(
                "a",
                folded.alias("newlab"),
                (folded != F.col("lab")).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where(F.col("chg")).count()
        labels = new_labels.select("a", F.col("newlab").alias("lab"))
        if changed == 0:
            break

    w = Window.partitionBy("lab")
    return labels.select(
        F.col("a").alias("doc_id"),
        F.col("lab").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
    )
