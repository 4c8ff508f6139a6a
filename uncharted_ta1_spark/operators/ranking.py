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
