"""Skip-gram training-pair generation with deterministic negative sampling
— the word2vec/embedding-pretraining data step (Mikolov et al., "Distributed
Representations of Words and Phrases", NeurIPS 2013) a token corpus
pipeline feeds its embedding trainer.

Reference analog: the co-occurrence/context evidence the reference's
metadata extraction aggregates around extracted tokens
(``tasks/metadata_extraction/metadata_extraction.py`` place-name voting over
surrounding text; the ±k context framing of W1 in SURVEY.md) — generalized
to the standard (center, context) pair emission with window ``w``.

Scale design (100 TB corpus):

* Pair emission is pure array math on the document row — ``posexplode`` +
  two ``slice``s of the words array (no self-join on position, which would
  be quadratic in document length on the join side).  Output is linear:
  ≤ 2w rows per token.
* Pair counts: ONE combinable groupBy (map-side partials absorb hot pairs).
* Top-N screening: total-order ``orderBy().limit()`` — Spark plans a
  TakeOrdered partial top-k, never a global sort; the rank window then
  runs on the already-bounded N-row frame.
* Negative sampling is deterministic and rerun-stable: negative ``r`` for a
  pair is ``md5(salt‖center‖'|'‖context‖'#'‖r) mod |V|`` — a content-
  addressed slot into the frequency-ranked vocabulary
  (:func:`uncharted_ta1_spark.operators.feathash.vocab_index`, the
  GK-bucketed scale-safe rank).  The ≤ N·k probe frame is broadcast into
  an equi-join against the vocabulary — one scan of the (possibly 10⁹-row)
  vocab table, zero shuffle of it.  Sampling is uniform over the vocab,
  not unigram^0.75 — documented simplification that keeps both engines
  bit-identical; the distribution choice is orthogonal to the plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.functions.portable import md5_i64, words_col
from uncharted_ta1_spark.operators.feathash import vocab_index

SKIPGRAM_NEG_SALT = "sgneg"


def skipgram_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    window: int = 2,
    min_pair_count: int = 2,
    top_n: int = 200,
    neg_k: int = 3,
) -> DataFrame:
    """Top-``top_n`` (center, context) skip-gram pairs by count (ties:
    center, context), each with ``neg_k`` deterministic negative words.

    Returns one row per (pair, negative): ``center, context, n_pairs,
    rank, neg_rank, neg_word`` — all-integer/string output, bit-portable.
    """
    d = docs.select(words_col(F.col(text_col)).alias("w"))
    tok = d.select("w", F.posexplode("w").alias("i0", "center"))
    i = F.col("i0") + 1  # 1-based position for slice math
    lstart = F.greatest(i - window, F.lit(1))
    left = F.slice(F.col("w"), lstart, i - lstart)
    right = F.slice(
        F.col("w"), i + 1, F.least(F.lit(window), F.size("w") - i)
    )
    pairs = tok.select(
        "center", F.explode(F.concat(left, right)).alias("context")
    )
    pc = (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .where(F.col("n_pairs") >= min_pair_count)
    )
    order = [
        F.col("n_pairs").desc(),
        F.col("center").asc(),
        F.col("context").asc(),
    ]
    top = pc.orderBy(*order).limit(top_n)
    # rank window runs on the already-limited top_n-row frame — bounded
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("int")
    )

    vocab = vocab_index(docs, text_col=text_col)
    vsize = vocab.agg(F.count(F.lit(1)).cast("long").alias("_v"))
    negs = (
        ranked.crossJoin(F.broadcast(vsize))
        .select(
            "*",
            F.explode(
                F.array(*[F.lit(r) for r in range(1, neg_k + 1)])
            ).alias("neg_rank"),
        )
        .withColumn(
            "_slot",
            md5_i64(
                F.concat(
                    F.col("center"),
                    F.lit("|"),
                    F.col("context"),
                    F.lit("#"),
                    F.col("neg_rank").cast("string"),
                ),
                salt=SKIPGRAM_NEG_SALT,
            )
            % F.col("_v"),
        )
    )
    return (
        vocab.select(
            F.col("word_id").alias("_slot"), F.col("word").alias("neg_word")
        )
        .join(F.broadcast(negs), "_slot")
        .select(
            "center",
            "context",
            "n_pairs",
            "rank",
            F.col("neg_rank").cast("int").alias("neg_rank"),
            "neg_word",
        )
    )
