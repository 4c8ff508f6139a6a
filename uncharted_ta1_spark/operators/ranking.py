"""BM25 term-query retrieval over the documents table.

Sibling of ``textstats.tfidf_top_terms`` (per-document keyword direction);
this is the query→documents direction: score every document that contains
at least one query term and return the top-k.  The reference ranks its
extractions by hand-tuned confidence products
(``tasks/point_extraction/point_extraction.py`` score fields,
``tasks/metadata_extraction/metadata_extraction.py`` place-name
relevance); BM25 is the corpus-statistics version a web-scale pipeline
needs for retrieval-quality filtering and query-based corpus slicing.

Scale shape: document frequency and average-doc-length are tiny broadcast
aggregates; the corpus-sized side is exploded and filtered to the query
terms BEFORE any shuffle (the word filter prunes ~all rows at the scan);
final top-k is orderBy+limit, which Spark plans as TakeOrdered
(distributed partial top-k), never a single-partition global sort.

Float determinism: per-term contributions are pivoted into fixed columns
and summed with a fixed-order ``+`` chain — never an order-dependent
SUM over rows — so the DuckDB oracle evaluating the same IEEE tree over
the same exact-integer inputs reproduces the doubles bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import words_col


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents for a fixed term query under BM25.

    score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); df counts documents
    containing the term.  Documents matching no term are not scored.
    """
    words = words_col(F.col("text"))
    tc = (
        docs.select("doc_id", F.explode(words).alias("word"))
        .filter(F.col("word").isin(terms))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dl = docs.select(
        "doc_id", F.size(words_col(F.col("text"))).cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(words_col(F.col("text"))).cast("long"))
        .cast("long")
        .alias("tot_len"),
    )
    df_tab = tc.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    base = (
        tc.join(dl, "doc_id", "inner")
        .join(F.broadcast(df_tab), "word")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("tot_len").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    contrib = idf * tf_d * F.lit(k1 + 1.0) / denom
    # pivot: one column per query term -> fixed-order scalar + chain
    pivoted = base.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("word") == t, contrib).otherwise(F.lit(0.0)))
            .alias(f"c{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.col(f"c{i}")
    return (
        pivoted.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def bm25_ranked(docs: DataFrame, terms: list[str], k: int = 50,
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """``bm25_topk`` with an explicit 1-based ``rank`` column, computed on
    the UNROUNDED score (rounding first could reorder near-ties) over the
    <= k surviving rows — a droplet-sized window, no scale concern."""
    from pyspark.sql.window import Window

    top = bm25_topk(docs, terms, k=k, k1=k1, b=b)
    # bm25_topk already rounds; recompute rank on (score desc, doc_id) —
    # its output order key.  Ties at 6dp share the order the engine and
    # the oracle both use (score desc, doc_id asc), so the rank is
    # deterministic and engine-portable even across rounding.
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id", "score", F.row_number().over(w).cast("int").alias("rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (public formula:
    Cormack/Clarke/Buettcher, SIGIR 2009): fused(d) = sum_i 1/(k + rank_i)
    over the lists containing d; absent lists contribute 0.

    The hybrid lexical+dense retrieval combiner every RAG-era curation
    pipeline runs.  Scale shape: each input is already a bounded top-k
    list (droplet-sized), so the fusion is a cascade of outer joins +
    fixed-order float adds over <= sum(k_i) rows — the heavy retrieval
    work stays in the upstream operators (BM25's pruned scan, ANN's
    bucketed search).  Missing ranks surface as -1 sentinels (never NULL)
    so downstream hashing is stable.

    Float determinism: each term is one division 1.0/(k + rank); terms
    combine with a fixed-order ``+`` chain in list order — the same IEEE
    tree the oracle evaluates.
    """
    from pyspark.sql.window import Window

    if len(rankings) < 2:
        raise ValueError("fusion needs at least two rankings")
    fused = None
    for i, r in enumerate(rankings):
        ri = r.select(
            F.col(id_col), F.col(rank_col).cast("long").alias(f"_r{i}")
        )
        fused = ri if fused is None else fused.join(ri, id_col, "full_outer")
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.when(
            F.col(f"_r{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(f"_r{i}").cast("double")),
        ).otherwise(F.lit(0.0))
    w = Window.orderBy(F.col("_s").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("_s", score)
        .withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .where(F.col("fused_rank") <= topk)
        .select(
            F.col(id_col),
            F.col("fused_rank"),
            F.round(F.col("_s"), 9).alias("rrf_score"),
            *[
                F.coalesce(F.col(f"_r{i}"), F.lit(-1))
                .cast("long")
                .alias(f"rank_{i}")
                for i in range(len(rankings))
            ],
        )
    )


def ndcg_at_k(
    graded_ranking: DataFrame,
    nrel: DataFrame,
    *,
    query_col: str = "qid",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """NDCG@k per query for a binary-relevance ranking.

    ``graded_ranking``: (query, rank<=k, rel in {0,1}) — the system's
    top-k with relevance already joined on; ``nrel``: (query, n_rel) —
    each query's TOTAL relevant count in the searched corpus.  Taking
    n_rel as an input keeps the operator's shape right at scale: the
    caller derives it from a combinable aggregate (e.g. per-label corpus
    counts), never a |queries| x |corpus| relevance materialization.

    DCG terms 1/log2(1+rank) are nano-floored to exact integers before
    summing (the repo's order-free float-sum defense — a SUM over doubles
    is order-dependent across engines), so dcg/idcg are exact BIGINTs and
    only the final ratio is floating point.  IDCG is the closed-form
    ideal: the first min(k, n_rel) terms, built from a k-row sequence.

    Reference analog: the reference scores its extractions against ground
    truth with rank-blind F1 (``eval/18month_eval/eval_utils.py:8-41``);
    NDCG is the rank-aware upgrade a retrieval-quality gate needs.
    """
    def _term(pos_col):
        return F.floor(
            F.lit(1e9)
            / (F.log(F.lit(1.0) + pos_col.cast("double")) / F.log(F.lit(2.0)))
            + F.lit(0.5)
        ).cast("long")

    graded = graded_ranking.withColumn(
        "_t",
        F.when(F.col(rel_col) == 1, _term(F.col(rank_col))).otherwise(
            F.lit(0).cast("long")
        ),
    )
    dcg = graded.groupBy(query_col).agg(
        F.sum("_t").cast("long").alias("dcg_nano"),
        F.sum(F.col(rel_col).cast("long")).alias("hits_at_k"),
    )
    seq = (
        nrel.select(
            query_col,
            "n_rel",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("_i"),
        )
        .where(F.col("_i") <= F.least(F.lit(k).cast("long"), F.col("n_rel")))
        .withColumn("_t", _term(F.col("_i")))
        .groupBy(query_col, "n_rel")
        .agg(F.sum("_t").cast("long").alias("idcg_nano"))
    )
    return dcg.join(seq, query_col).select(
        query_col,
        "n_rel",
        "hits_at_k",
        F.round(
            F.col("dcg_nano").cast("double") / F.col("idcg_nano").cast("double"),
            9,
        ).alias("ndcg"),
    )
