"""Sparse-feature encoders: the hashing trick and deterministic vocabulary
indexing (the StringIndexer twin).

Both turn a token stream into model-ready integer features, the step the
reference performs implicitly inside its vendored model tokenizers
(``tasks/segmentation/layoutlmft/models/layoutlmv3/tokenization_layoutlmv3.
py`` vocab lookup; the md5 cache-key hashing of C11,
``tasks/metadata_extraction/metadata_extraction.py:453-476``, supplies the
portable hash).  The hashing trick itself is a public method (Weinberger et
al., "Feature Hashing for Large Scale Multitask Learning", ICML 2009).

Scale design:

* :func:`hashed_features` — stateless: NO vocabulary pass, no global
  state, output dimensionality fixed at ``n_buckets`` regardless of corpus
  size.  One explode + one combinable groupBy; the estimator every 100 TB
  text pipeline starts with because it needs zero coordination.
* :func:`vocab_index` — stateful: exact frequency-ranked ids.  The rank is
  a global sort, but over the DISTINCT vocabulary (corpus-compressed by the
  word-count groupBy, which is map-side combinable); a Zipf-shaped 10^12-row
  corpus has a vocabulary orders of magnitude smaller than the corpus, and
  the optional ``min_count`` floor trims the long tail before the sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.functions.portable import md5_i64, words_col

FEATHASH_SALT = "feathash"


def hashed_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = FEATHASH_SALT,
) -> DataFrame:
    """Hashing-trick featurizer: every word hashes to ``bucket = h & (B-1)``
    with a sign bit from the next hash bit (``(h >> log2B) & 1``) — the
    signed construction that makes collisions cancel in expectation.

    Returns one row per (doc, non-empty bucket): ``feat_val`` (signed
    count, the model feature) and ``n_terms`` (collision mass diagnostics).
    ``n_buckets`` must be a power of two (bitmask bucketing keeps the
    Spark and DuckDB hash trees identical).
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = n_buckets.bit_length() - 1
    words = docs.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("word")
    )
    h = md5_i64(F.col("word"), salt=salt)
    sign = F.when(
        F.shiftright(h, shift).bitwiseAND(F.lit(1)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        words.withColumn("bucket", h.bitwiseAND(F.lit(n_buckets - 1)).cast("int"))
        .withColumn("_sign", sign)
        .groupBy(id_col, "bucket")
        .agg(
            F.sum("_sign").cast("long").alias("feat_val"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )


def vocab_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Deterministic frequency-ranked vocabulary: id 0 is the most frequent
    word, ties broken lexicographically — StringIndexer's contract, made
    reproducible.  Returns (word, word_id, n_occurrences).

    The global row_number runs on the distinct-vocabulary table only (the
    corpus-sized work is the combinable word-count groupBy before it).
    """
    counts = (
        docs.select(F.explode(words_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    return counts.withColumn(
        "word_id", (F.row_number().over(w) - 1).cast("long")
    ).select("word", "word_id", "n_occurrences")
