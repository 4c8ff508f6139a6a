"""Greedy longest-match-first (maximal munch) subword encoding against a
corpus-derived substring vocabulary — the WordPiece inference rule (Wu et
al., "Google's Neural Machine Translation System", 2016 §3.1 — public
method; the greedy-longest-match decode used by BERT tokenizers).
Complements the repo's merge-based BPE pair (``operators/bpe.py``): BPE
learns by iterative pair fusion, WordPiece segments by longest vocabulary
prefix at each position.

Reference analog: the vendored BERT-family tokenizer the reference ships
for layout models (``tasks/segmentation/layoutlmft/models/layoutlmv3/
tokenization_layoutlmv3.py``) performs exactly this greedy longest-match
loop per word; here it is re-expressed as relational algebra.

Vocabulary rule (deterministic, corpus-derived): every length-1 substring
is always in-vocab (so segmentation never needs an UNK fallback), and a
length-2..max_piece substring joins the vocabulary when it occurs in at
least ``min_df`` DISTINCT words.

Scale design (100 TB corpus):

* ALL per-character work happens on the **distinct-word table** — encode
  each word once, vocabulary-sized (10⁸ rows at web scale), never the
  token stream.  Candidate substrings fan out ≤ len×max_piece per word
  (bounded by the max word length, a corpus constant).
* The piece-df count and the per-(word,pos) longest-match reduction are
  combinable groupBys; the vocabulary membership test is an equi join on
  the piece string (hash join, never a sort of the corpus).
* The greedy cover itself is a per-row ``aggregate`` fold over the word's
  positions — O(len) JVM work per word, zero shuffle, zero Python.  The
  DuckDB oracle unrolls the same iteration as a bounded MATERIALIZED
  round chain (the repo's iterative-oracle convention; rounds = a fixed
  cap ≥ max word length, excess rounds are empty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE = 4
MIN_DF = 3
GREEDY_ROUNDS = 24  # oracle unroll cap; must exceed the corpus max word length


def wordpiece_encode(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_piece: int = MAX_PIECE,
    min_df: int = MIN_DF,
) -> DataFrame:
    """Per distinct word: greedy longest-match segmentation.

    Returns (word, n_words = #docs-stream occurrences is NOT tracked here —
    the distinct-word factoring is the point), with ``n_chars``,
    ``n_pieces``, ``pieces_csv`` (the maximal-munch segmentation) and the
    9-dp ``fertility`` (pieces per character).
    """
    from uncharted_ta1_spark.functions.portable import words_col

    words = (
        docs.select(F.explode(words_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    # candidate substrings: (word, pos 0-based, k) with pos + k <= len
    cands = (
        words.select(
            "word",
            F.explode(F.sequence(F.lit(0), F.length("word") - 1)).alias("pos"),
        )
        .select(
            "word",
            "pos",
            F.explode(F.sequence(F.lit(1), F.lit(max_piece))).alias("k"),
        )
        .where(F.col("pos") + F.col("k") <= F.length("word"))
        .withColumn("piece", F.expr("substring(word, pos + 1, k)"))
    )
    vocab = (
        cands.groupBy("piece")
        .agg(F.countDistinct("word").cast("long").alias("df"))
        .where((F.length("piece") == 1) | (F.col("df") >= min_df))
        .select("piece")
    )
    # longest in-vocab match at each position (len-1 pieces guarantee >= 1)
    lens = (
        cands.join(vocab, "piece")
        .groupBy("word", "pos")
        .agg(F.max("k").cast("int").alias("match_len"))
    )
    lens_arr = lens.groupBy("word").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "match_len"))),
            lambda s: s.match_len,
        ).alias("lens")
    )
    # greedy maximal munch: fold over positions; acc = (next uncovered
    # position, selected positions).  Pure JVM, O(len) per word.
    folded = words.join(lens_arr, "word").withColumn(
        "_sel",
        F.aggregate(
            F.sequence(F.lit(0), F.length("word") - 1),
            F.struct(
                F.lit(0).alias("nxt"),
                F.array().cast("array<int>").alias("sel"),
            ),
            lambda acc, i: F.when(
                i == acc.nxt,
                F.struct(
                    (acc.nxt + F.element_at(F.col("lens"), i + 1)).alias("nxt"),
                    F.concat(acc.sel, F.array(i)).alias("sel"),
                ),
            ).otherwise(acc),
        ).sel,
    )
    return folded.select(
        "word",
        "n_occurrences",
        F.length("word").cast("long").alias("n_chars"),
        F.size("_sel").cast("long").alias("n_pieces"),
        F.array_join(
            F.transform(
                "_sel",
                lambda p: F.col("word").substr(
                    p + 1, F.element_at(F.col("lens"), p + 1)
                ),
            ),
            " ",
        ).alias("pieces_csv"),
        F.round(
            F.size("_sel").cast("double") / F.length("word").cast("double"), 9
        ).alias("fertility"),
    )


def optimal_segmentation(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_piece: int = MAX_PIECE,
    min_df: int = MIN_DF,
) -> DataFrame:
    """Minimum-piece segmentation per distinct word against the SAME
    df-thresholded vocabulary as :func:`wordpiece_encode` — the exact DP
    lower bound (unigram-LM Viterbi with unit piece costs; Kudo 2018's
    segmentation lattice specialized to min-pieces) that greedy maximal
    munch only approximates.  Emitting both exposes exactly where the
    greedy tokenizer over-fragments (`greedy_is_optimal` = false rows).

    dp[i] = 1 + min over k<=max_piece with word[i-k:i] in vocab of
    dp[i-k]; per-position valid piece lengths are packed into a BITMASK
    column (one combinable groupBy over the candidate table — shared
    shape with the greedy path), and the DP runs as a per-row JVM
    ``aggregate`` fold over positions with a constant-width (max_piece)
    inner min.  Everything is the distinct-word table — vocabulary-sized
    — and exact integers end to end.
    """
    from pyspark.sql import functions as F  # noqa: F401 (local clarity)

    from uncharted_ta1_spark.functions.portable import words_col

    words = (
        docs.select(F.explode(words_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    cands = (
        words.select(
            "word",
            F.explode(F.sequence(F.lit(0), F.length("word") - 1)).alias("pos"),
        )
        .select(
            "word",
            "pos",
            F.explode(F.sequence(F.lit(1), F.lit(max_piece))).alias("k"),
        )
        .where(F.col("pos") + F.col("k") <= F.length("word"))
        .withColumn("piece", F.expr("substring(word, pos + 1, k)"))
    )
    vocab = (
        cands.groupBy("piece")
        .agg(F.countDistinct("word").cast("long").alias("df"))
        .where((F.length("piece") == 1) | (F.col("df") >= min_df))
        .select("piece")
    )
    # (word, pos, k) rows are unique by construction, so the mask is a
    # plain sum of bit values
    masks = (
        cands.join(vocab, "piece")
        .groupBy("word", "pos")
        .agg(F.sum(F.expr("shiftleft(1, k - 1)")).cast("long").alias("mask"))
    )
    masks_arr = masks.groupBy("word").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mask"))),
            lambda s: s.mask,
        ).alias("masks")
    )
    big = F.lit(1 << 40).cast("long")

    def step(acc, i):
        # dp value for position i (1-based): min over k of acc[i-k] + 1
        # where piece word[i-k:i] (mask bit k at 0-based pos i-k) is in-vocab
        opts = [
            F.when(
                (i >= F.lit(kk))
                & (
                    F.shiftright(
                        F.element_at(F.col("masks"), i - kk + 1), kk - 1
                    ).bitwiseAND(F.lit(1))
                    == 1
                ),
                F.element_at(acc, i - kk + 1) + 1,
            ).otherwise(big)
            for kk in range(1, max_piece + 1)
        ]
        return F.concat(acc, F.array(F.least(*opts)))

    folded = words.join(masks_arr, "word").withColumn(
        "_dp",
        F.aggregate(
            F.sequence(F.lit(1), F.length("word")),
            F.array(F.lit(0).cast("long")),
            step,
        ),
    )
    greedy = wordpiece_encode(
        docs, text_col=text_col, max_piece=max_piece, min_df=min_df
    ).select("word", F.col("n_pieces").alias("greedy_pieces"))
    return (
        folded.select(
            "word",
            "n_occurrences",
            F.length("word").cast("long").alias("n_chars"),
            F.element_at("_dp", -1).cast("long").alias("min_pieces"),
        )
        .join(greedy, "word")
        .select(
            "word",
            "n_occurrences",
            "n_chars",
            "greedy_pieces",
            "min_pieces",
            (F.col("greedy_pieces") == F.col("min_pieces")).alias(
                "greedy_is_optimal"
            ),
            (F.col("greedy_pieces") - F.col("min_pieces"))
            .cast("long")
            .alias("saved_pieces"),
        )
    )
