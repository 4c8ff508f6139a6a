"""TextRank: PageRank over the corpus word co-occurrence graph — the
graph-centrality keyword ranker (Mihalcea & Tarau 2004) and this repo's
iterative-algorithm exemplar alongside BPE (operators/bpe.py) and Lloyd
IVF training (operators/similarity.py).

Reference analog: the reference ranks candidates by vote/confidence
products (``tasks/metadata_extraction`` place votes,
``tasks/point_extraction`` score fields); TextRank is the corpus-level
version where a term's weight comes from the whole co-occurrence graph,
not a per-row score.

Exact-integer iteration: ranks live in BIGINT micro-units (1.0 = 1e6) and
each round is

    p'(v) = 150000 + (850 * sum_{u->v} ((p(u) * c(u,v)) DIV outdeg(u))) DIV 1000

— additive integer sums are order-independent, so the result is
bit-identical across engines and partitionings with no float tree to pin.
The round SQL text is SHARED with the DuckDB oracle modulo one token (the
integer-division operator: Spark ``DIV``, DuckDB ``//``).

Scale shape: edges/out-degrees/nodes are built once and MATERIALIZED
(localCheckpoint + temp view); each round is then one edge-join shuffle +
one groupBy whose output is vocabulary-sized.  Each pr{r} is referenced
exactly once by round r+1, so the assembled chain stays linear under
Spark's CTE inlining (the BPE exponential-re-eval trap does not bite; see
operators/bpe.py:19-31 for when it does).  At 10^12 tokens the edge table
is |V|^2-bounded and the per-round cost is one co-partitioned join on w1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import words_col

DAMP_NUM = 850  # 0.85 damping as a milli-ratio
BASE_MICRO = 150000  # (1 - 0.85) in micro-units


def word_edges(docs: DataFrame) -> DataFrame:
    """Directed adjacent-word edges (w1 -> w2) with occurrence counts.
    One explode + one combinable groupBy; output is <= |V|^2 rows."""
    words = words_col(F.col("text"))
    pairs = (
        docs.select(words.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS w1,"
                    "             element_at(ws, i + 1) AS w2))"
                )
            ).alias("e")
        )
        .select("e.w1", "e.w2")
    )
    return pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def round_sql(r: int, div: str) -> str:
    """pr{r}: one damped-update round from pr{r-1}.  ``div`` is the
    integer-division token ('DIV' for Spark, '//' for DuckDB); the text is
    otherwise identical in both engines."""
    return f"""
pr{r} AS (
  SELECT n.w,
         CAST({BASE_MICRO} + ({DAMP_NUM} * COALESCE(s.contrib, 0)) {div} 1000
              AS BIGINT) AS p
  FROM tr_nodes n LEFT JOIN (
    SELECT e.w2 AS w,
           CAST(sum((p.p * e.c) {div} o.outdeg) AS BIGINT) AS contrib
    FROM tr_wedges e
    JOIN pr{r - 1} p ON p.w = e.w1
    JOIN tr_outd o ON o.w = e.w1
    GROUP BY e.w2
  ) s ON s.w = n.w
)"""


def chain_sql(rounds: int, div: str) -> str:
    """The pr0..pr{rounds} CTE chain + final projection (shared text),
    WITHOUT a leading WITH so callers can splice it after their own CTEs
    (the Spark runner prepends ``WITH``; the oracle prepends the dialect
    edge-table derivation)."""
    ctes = ["pr0 AS (SELECT w, CAST(1000000 AS BIGINT) AS p FROM tr_nodes)"]
    for r in range(1, rounds + 1):
        ctes.append(round_sql(r, div).strip())
    return (
        ",\n".join(ctes) + f"""
SELECT pr{rounds}.w AS word, pr{rounds}.p AS pr_micro,
       CAST(COALESCE(o.outdeg, 0) AS BIGINT) AS outdeg
FROM pr{rounds} LEFT JOIN tr_outd o ON o.w = pr{rounds}.w
"""
    )


def textrank(spark: SparkSession, docs: DataFrame, rounds: int = 3) -> DataFrame:
    """Run ``rounds`` exact-integer TextRank rounds over ``docs``."""
    edges = word_edges(docs).localCheckpoint()
    edges.createOrReplaceTempView("tr_wedges")
    outd = edges.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c").cast("long").alias("outdeg")
    ).localCheckpoint()
    outd.createOrReplaceTempView("tr_outd")
    nodes = (
        edges.select(F.col("w1").alias("w"))
        .unionByName(edges.select(F.col("w2").alias("w")))
        .distinct()
        .localCheckpoint()
    )
    nodes.createOrReplaceTempView("tr_nodes")
    return spark.sql("WITH " + chain_sql(rounds, "DIV"))
