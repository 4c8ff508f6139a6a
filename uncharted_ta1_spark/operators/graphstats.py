"""Triangle counting / clustering coefficients over a candidate-pair graph.

The dedup stack emits near-duplicate CANDIDATE PAIRS (simhash bands,
MinHash-LSH buckets, embedding near-dups); the natural audit of such a
graph is its triangle density — true duplicate clusters are near-cliques
(high local clustering), while banding false-positives show up as
low-coefficient spokes.  The reference runs the single-node version of
this idea when it merges overlapping detections through pairwise overlap
graphs (``tasks/segmentation/denoise_segments.py:18-110`` unary_union of
intersecting shapes; ``tasks/point_extraction/tiling.py`` overlap-dedup);
triangle counting is the graph-shaped audit of the same pair structure at
corpus scale.

Algorithm (public, standard): degree-ordered orientation.  Orient every
undirected edge from its (degree, id)-smaller endpoint to the larger; a
triangle {a,b,c} then has EXACTLY one wedge a→b→c whose closing edge a→c
is also oriented — so one equi-join builds wedges and one more
equi-(semi-)join closes them, with no double counting and no pair-level
distinct.  Orientation bounds every node's out-degree by O(sqrt(m)), which
is what keeps the wedge join's per-key fan-out bounded on skewed
(hub-heavy) graphs — the reason this beats the naive "join edges three
ways" at 100 TB.

Determinism: everything is integer; the clustering coefficient is the
only float (one division, rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(
    edges: DataFrame,
    *,
    src: str = "doc1",
    dst: str = "doc2",
    out_id: str = "doc_id",
) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient.

    ``edges`` must be UNIQUE undirected pairs with ``src < dst`` (the
    shape every pair generator in operators/dedup.py emits); duplicate
    edge rows would inflate both degrees and triangle counts.

    Returns one row per node of degree >= 2: (node, degree, n_triangles,
    clustering_coeff = 2T / (deg * (deg - 1))).

    The edge list and the oriented edge list are MATERIALIZED
    (localCheckpoint — the repo's CTE-inlining defense): the plan
    references edges ~8 times (degree pass, orientation, both wedge
    sides, the closing side), and without a checkpoint Spark would
    re-evaluate the upstream pair-generation join for every reference.
    """
    edges = edges.localCheckpoint()
    und = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("other")
    ).unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("other")))
    deg = und.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )

    e = (
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .join(
            deg.select(F.col("node").alias("_u"), F.col("degree").alias("_da")),
            "_u",
        )
        .join(
            deg.select(F.col("node").alias("_v"), F.col("degree").alias("_db")),
            "_v",
        )
    )
    lower = F.struct(F.col("_da"), F.col("_u")) < F.struct(
        F.col("_db"), F.col("_v")
    )
    ed = e.select(
        F.when(lower, F.col("_u")).otherwise(F.col("_v")).alias("s"),
        F.when(lower, F.col("_v")).otherwise(F.col("_u")).alias("d"),
    ).localCheckpoint()

    wedges = (
        ed.alias("e1")
        .join(ed.alias("e2"), F.col("e1.d") == F.col("e2.s"))
        .select(
            F.col("e1.s").alias("a"),
            F.col("e1.d").alias("b"),
            F.col("e2.d").alias("c"),
        )
    )
    # closing edge: oriented a -> c (ed rows are unique, so semi == inner)
    tri = wedges.join(
        ed.select(F.col("s").alias("a"), F.col("d").alias("c")),
        ["a", "c"],
        "semi",
    )
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        deg.where(F.col("degree") >= 2)
        .join(per_node, "node", "left")
        .select(
            F.col("node").alias(out_id),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (
                    F.col("degree").cast("double")
                    * (F.col("degree").cast("double") - F.lit(1.0))
                ),
                9,
            ).alias("clustering_coeff"),
        )
    )


def kcore_membership(
    edges: DataFrame,
    *,
    k: int = 3,
    rounds: int = 8,
    src: str = "doc1",
    dst: str = "doc2",
    out_id: str = "doc_id",
) -> DataFrame:
    """Nodes surviving ``rounds`` rounds of k-core peeling (remove every
    node of degree < k, restrict edges, repeat) + their residual degree
    and whether the peel CONVERGED (a fixpoint was reached within the
    round budget — when true, the output IS the k-core).

    The dense-subgraph quality filter of web-graph curation (public
    algorithm: Seidman 1983 cores; the standard iterative peel).  The
    fixed round budget is part of the operator's SEMANTIC — it makes the
    result engine-portable (the DuckDB oracle replays the same bounded
    chain) while the convergence flag reports whether the budget bound
    ever bit.  Peeling is idempotent at the fixpoint, so early exit on
    convergence returns the identical result.

    Scale shape: each round is one degree groupBy + two semi-joins, and
    each round's edge set is MATERIALIZED (localCheckpoint — the linear
    iterative chain, the repo's CTE-inlining defense); rounds never
    re-evaluate their predecessors.
    """
    # Each round's surviving-edge count rides the checkpoint
    # materialization as an observed metric instead of a second job over
    # the cached partitions (guide §1.2: one action per round, not two;
    # same fusion as merge_upsert's commit counters).
    from pyspark.sql import Observation

    obs0 = Observation()
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_cur = int(obs0.get["n"])
    converged = False
    for _ in range(rounds):
        und = cur.select(F.col("a").alias("node")).unionByName(
            cur.select(F.col("b").alias("node"))
        )
        deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.where(F.col("_d") >= k).select("node")
        obs = Observation()
        nxt = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "semi")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        n_nxt = int(obs.get["n"])
        cur = nxt
        if n_nxt == n_cur:
            converged = True
            break
        n_cur = n_nxt
    und = cur.select(F.col("a").alias("node")).unionByName(
        cur.select(F.col("b").alias("node"))
    )
    out = und.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )
    return out.select(
        F.col("node").alias(out_id),
        "core_degree",
        F.lit(converged).alias("converged"),
    )
