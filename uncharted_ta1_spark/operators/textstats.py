"""Text-analysis operators for training-data curation.

Columnar throughout: higher-order array functions over the whitespace-token
array; no UDFs, no per-row Python.  Reference analogs: the alphanumeric text
filter + token-budget loop (``tasks/metadata_extraction/metadata_extraction.py
:877-901, 806-820``) and the text-quality heuristics scattered through the
metadata pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import md5_i64, shingles_col, words_col

# language-marker word lists (tiny literal dims; broadcast-free constants)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "ein", "das"),
    "fr": ("le", "la", "et", "un", "des"),
}

# BPE-ish token pattern: letter runs, digit runs, single other non-space
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

TOKEN_BUDGET = 3500  # reference LLM prompt budget (metadata_extraction.py:234)


def _marker_count(words: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w))).cast("long")


def text_quality(docs: DataFrame) -> DataFrame:
    """Length / word-shape / stopword-ratio quality features + score."""
    words = words_col(F.col("text"))
    d = docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_txt"),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("_char_sum"),
        _marker_count(words, LANG_MARKERS["en"]).alias("n_stopwords"),
    )
    return d.select(
        "doc_id",
        "lang",
        "n_chars_txt",
        "n_words",
        F.round(F.col("_char_sum") / F.col("n_words"), 9).alias("avg_word_len"),
        F.round(F.col("n_stopwords") / F.col("n_words"), 9).alias("stopword_ratio"),
        F.round(
            F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
            + F.least(F.col("n_stopwords") / F.col("n_words") * F.lit(5.0), F.lit(1.0))
            * F.lit(0.5),
            9,
        ).alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language vote with deterministic tie-break (en > de > fr)."""
    words = words_col(F.col("text"))
    d = docs.select(
        "doc_id",
        "lang",
        _marker_count(words, LANG_MARKERS["en"]).alias("en_hits"),
        _marker_count(words, LANG_MARKERS["de"]).alias("de_hits"),
        _marker_count(words, LANG_MARKERS["fr"]).alias("fr_hits"),
    )
    return d.withColumn(
        "predicted_lang",
        F.when(
            (F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")),
            F.lit("en"),
        )
        .when(F.col("de_hits") >= F.col("fr_hits"), F.lit("de"))
        .otherwise(F.lit("fr")),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish regex token counts and the reference's 3500-token
    budget predicate (A10/F5 analog)."""
    words = words_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
    ).withColumn("within_budget", F.col("n_bpe_tokens") <= TOKEN_BUDGET)


def doc_fingerprint(docs: DataFrame, *, n: int = 3, prefix_words: int = 8) -> DataFrame:
    """Content fingerprint: min/max shingle hash (1-perm minhash), distinct
    shingle count, and a word-prefix rolling-hash analog."""
    words = words_col(F.col("text"))
    sh = F.transform(shingles_col(words, n), lambda s: md5_i64(s))
    return docs.select(
        "doc_id",
        F.array_min(sh).alias("min_sh_hash"),
        F.array_max(sh).alias("max_sh_hash"),
        F.size(F.array_distinct(sh)).cast("long").alias("n_distinct_shingles"),
        md5_i64(F.array_join(F.slice(words, 1, prefix_words), " ")).alias("prefix_hash"),
    )


def consecutive_run_flags(seq: DataFrame) -> DataFrame:
    """Consecutive-number noise check over token sequences (C3).

    Reference analog: extracted coordinates that form a consecutive number
    series (49, 50, 51) are scale-bar/grid noise, not coordinates
    (``tasks/geo_referencing/coordinates_extractor.py:607-619``,
    ``_check_consecutive``).  Generalized to token arrays: count adjacent
    +1 steps and flag rows whose whole token array is one consecutive run.

    Shuffle-free: pure columnar array HOFs (slice + zip_with + filter) on
    each row — no explode, no window, survives any scale the scan survives.
    """
    # clamp: size=0 would make n-1 = -1 and slice throws at runtime (the
    # engine's datagen guarantees >=1 token, but the operator must not)
    n = F.greatest(F.size("tokens"), F.lit(1))
    heads = F.slice(F.col("tokens"), 2, n - 1)   # tokens[2..n]
    prevs = F.slice(F.col("tokens"), 1, n - 1)   # tokens[1..n-1]
    incr = F.filter(
        F.zip_with(heads, prevs, lambda a, b: (a - b) == F.lit(1)),
        lambda x: x,
    )
    return seq.select(
        "doc_id",
        "source",
        "seq_no",
        "n_tok",
        F.size(incr).cast("long").alias("n_adjacent_incr"),
        (
            (F.col("n_tok") >= 3) & (F.size(incr) == (F.col("n_tok") - 1))
        ).alias("is_consecutive_run"),
    )


def token_bigrams(seq: DataFrame, *, top_n: int = 100) -> DataFrame:
    """Corpus-wide adjacent-token bigram counts, deterministic top-N.

    The vocabulary/co-occurrence statistic of a training-data pipeline
    (n-gram LM stats, tokenizer merge candidates).  One explode + one
    map-side-combinable count shuffle; the top-N is a total order
    (count desc, t1, t2) so the cut is reproducible.
    """
    # same empty-array clamp as consecutive_run_flags
    n = F.greatest(F.size("tokens"), F.lit(1))
    pairs = F.zip_with(
        F.slice(F.col("tokens"), 1, n - 1),
        F.slice(F.col("tokens"), 2, n - 1),
        lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
    )
    exploded = seq.select(F.explode(pairs).alias("p")).select("p.t1", "p.t2")
    return (
        exploded.groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(top_n)
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Per-document mean bigram log-probability under an add-1-smoothed
    corpus bigram LM — the perplexity-proxy quality score of a training
    pipeline (low score = unnatural word sequences / gibberish), computed
    exactly, in-engine, with no model artifact.

    score(doc) = (Σ_bigrams k·ln((C(w1,w2)+1)/(C(w1)+V))) / Σ k over the
    doc's bigram counts k, corpus counts C, vocab size V.  All counts are
    exact integers; the one order-dependent float sum is rounded (6 dp).
    Plan: bigram instances aggregate per-doc first (map-side combinable), the
    corpus LM is a reaggregation of that same table (never a second pass
    over the raw text), and the scalar V broadcasts.  Joins shuffle on the
    bigram/unigram keys — vocabulary-sized, sublinear in corpus size.
    """
    words = words_col(F.col("text"))
    d = docs.select("doc_id", words.alias("w"))
    n = F.greatest(F.size("w"), F.lit(1))
    pairs = F.zip_with(
        F.slice(F.col("w"), 1, n - 1),
        F.slice(F.col("w"), 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_bg = (
        d.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    bg_corpus = doc_bg.groupBy("w1", "w2").agg(F.sum("k").cast("long").alias("c12"))
    ug = (
        d.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    # vocab size = |ug| — reuse the unigram aggregate instead of a second
    # full explode+distinct over the corpus
    voc = ug.agg(F.count(F.lit(1)).cast("long").alias("v"))
    scored = (
        doc_bg.join(bg_corpus, ["w1", "w2"])
        .join(ug.withColumnRenamed("word", "w1"), "w1")
        .crossJoin(F.broadcast(voc))
        .withColumn(
            "lp",
            F.col("k").cast("double")
            * F.log(
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.round(F.sum("lp") / F.sum("k").cast("double"), 6).alias("avg_logprob"),
    )


def word_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon entropy (nats) of the word distribution —
    the repetitiveness / gibberish quality proxy of a corpus pipeline
    (low entropy = boilerplate or keyword stuffing).

    H = ln(n) - (Σ c·ln c) / n over exact per-word counts c, n = Σ c.
    The Σ c·ln c accumulation order differs between engines, so the result
    is rounded (6 dp) and signed-zero-collapsed (+0.0) per the repo's
    cross-engine float rules; everything upstream of the sum is exact
    integers.  Plan: one explode + one (doc, word) count + one per-doc
    aggregate — both groupBys map-side combinable.
    """
    words = words_col(F.col("text"))
    wc = (
        docs.select("doc_id", F.explode(words).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.countDistinct("word").cast("long").alias("n_distinct_words"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("_clnc"),
    )
    return agg.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        (
            F.round(
                F.log(F.col("n_words").cast("double"))
                - F.col("_clnc") / F.col("n_words").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("entropy_nats"),
    )


def tfidf_top_terms(docs: DataFrame, *, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (score = tf * ln((N+1)/(df+1))).

    Plan: one explode of words, one (doc, word) count shuffle, one word-df
    count shuffle joined back, broadcast scalar N, window top-k.  All float
    math is a fixed expression tree over exact integer counts — bit-identical
    to the DuckDB oracle.
    """
    words = words_col(F.col("text"))
    dw = docs.select("doc_id", F.explode(words).alias("word"))
    tf = dw.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = dw.select("doc_id", "word").distinct().groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = docs.select(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    from pyspark.sql.window import Window

    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * F.log(
                (F.col("n_docs") + F.lit(1)).cast("double")
                / (F.col("df") + F.lit(1)).cast("double")
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id", "word", "tf", "df",
            F.round("score", 9).alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pmi_collocations(
    docs: DataFrame, *, min_count: int = 5, top_n: int = 100
) -> DataFrame:
    """Top collocations by pointwise mutual information — the classic
    corpus-analytics surface (multi-word-expression mining, tokenizer merge
    screening) over exact integer counts.

    pmi(w1,w2) = ln( (c12/B) / ((c1/N)(c2/N)) ), computed as ONE fixed IEEE
    tree ln((c12*N*N)/(B*c1*c2)) over doubles cast from exact BIGINT counts,
    rounded 6 dp — bit-portable (same recipe as bigram_logprob).  Bigrams
    below ``min_count`` are screened first (the standard low-count PMI
    noise filter).

    Plan: two combinable count passes (bigram, unigram — both
    vocabulary-sized after aggregation), equi joins on the word keys,
    broadcast scalar totals, then a TOTAL-ORDER top-N
    (pmi desc, c12 desc, w1, w2) via TakeOrdered — a distributed partial
    top-k, never a global sort; the rank column is added on the 100-row
    result frame.

    Reference analog: the vocabulary/co-occurrence vote tallies of
    ``tasks/metadata_extraction`` (place-name votes over extracted text)
    generalized to association strength.
    """
    words = words_col(F.col("text"))
    d = docs.select(words.alias("w"))
    n = F.greatest(F.size("w"), F.lit(1))
    pairs = F.zip_with(
        F.slice(F.col("w"), 1, n - 1),
        F.slice(F.col("w"), 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    ug = (
        d.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    totals = ug.agg(
        F.sum("c").cast("long").alias("n_uni"),
    ).crossJoin(
        F.broadcast(
            bg.agg(F.sum("c12").cast("long").alias("n_big"))
        )
    )
    scored = (
        bg.where(F.col("c12") >= min_count)
        .join(ug.select(F.col("word").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(ug.select(F.col("word").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (
                        F.col("c12").cast("double")
                        * F.col("n_uni").cast("double")
                        * F.col("n_uni").cast("double")
                    )
                    / (
                        F.col("n_big").cast("double")
                        * F.col("c1").cast("double")
                        * F.col("c2").cast("double")
                    )
                ),
                6,
            )
            + F.lit(0.0),
        )
    )
    top = (
        scored.select("w1", "w2", "c12", "c1", "c2", "pmi")
        .orderBy(
            F.col("pmi").desc(),
            F.col("c12").desc(),
            F.col("w1").asc(),
            F.col("w2").asc(),
        )
        .limit(top_n)
    )
    w_rank = Window.orderBy(
        F.col("pmi").desc(),
        F.col("c12").desc(),
        F.col("w1").asc(),
        F.col("w2").asc(),
    )
    # rank window runs on the already-limited top_n-row frame — bounded
    return top.withColumn(
        "rank", F.row_number().over(w_rank).cast("int")
    )


def ngram_diversity(seq: DataFrame, *, tokens_col: str = "tokens") -> DataFrame:
    """Per-source distinct-1/distinct-2 generation-diversity ratios (Li et
    al., "A Diversity-Promoting Objective Function for Neural Conversation
    Models", NAACL 2016 — public metric): #distinct n-grams / #n-grams over
    the source's token stream.  A mode-collapsed or template-heavy source
    shows a low ratio; the audit every synthetic-data pipeline runs.

    Reference analog: the repetition screens of the metadata-extraction
    text filters (consecutive-number noise, tasks/metadata_extraction);
    this is the corpus-level n-gram generalization.

    Scale shape: bigrams are per-row JVM ``zip_with`` (zero Python); the
    corpus reduces through TWO combinable aggregations (count + two-phase
    partial-distinct count per (source, gram)) whose outputs are
    #sources-row tables joined by broadcast.  No window, no sort.
    """
    from uncharted_ta1_spark.operators.bleu import _bigrams

    uni = (
        seq.select("source", F.explode(F.col(tokens_col)).alias("g"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("t1"),
            F.countDistinct("g").cast("long").alias("d1"),
        )
    )
    bi = (
        seq.withColumn("_bg", F.expr(_bigrams(tokens_col)))
        .select("source", F.explode("_bg").alias("g"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("t2"),
            F.countDistinct("g").cast("long").alias("d2"),
        )
    )
    return (
        uni.join(F.broadcast(bi), "source", "left")
        .select(
            "source",
            "t1",
            "d1",
            F.coalesce("t2", F.lit(0)).cast("long").alias("t2"),
            F.coalesce("d2", F.lit(0)).cast("long").alias("d2"),
            F.round(
                F.col("d1").cast("double") / F.col("t1").cast("double"), 9
            ).alias("distinct1"),
            F.round(
                F.col("d2").cast("double")
                / F.nullif(F.col("t2").cast("double"), F.lit(0.0)),
                9,
            ).alias("distinct2"),
        )
    )


KN_DISCOUNT = "0.75"  # absolute discount D — shared literal with the oracle

# fixed IEEE tree for the interpolated KN bigram probability, shared
# textually with the DuckDB oracle (dual-dialect invariant):
#   P(w2|w1) = max(c12-D,0)/c1 + D*nright/c1 * (nleft/T)
KN_P_EXPR = (
    f"(greatest(CAST(c12 AS DOUBLE) - {KN_DISCOUNT}, 0.0)"
    " / CAST(c1 AS DOUBLE)"
    f" + {KN_DISCOUNT} * CAST(nright AS DOUBLE) / CAST(c1 AS DOUBLE)"
    " * (CAST(nleft AS DOUBLE) / CAST(t_types AS DOUBLE)))"
)


def kn_bigram_logprob(docs: DataFrame) -> DataFrame:
    """Per-document mean log-probability under an interpolated Kneser-Ney
    bigram LM (Kneser & Ney 1995; Chen & Goodman 1999 interpolated form,
    absolute discount D=0.75 — public method): the industrial-strength
    perplexity proxy that add-1 (``bigram_logprob``) only approximates.
    Builds on the SAME statistics ``kn_continuation`` audits: c(w1,w2),
    c(w1), N1+(w1,·) right-continuation fan-out, N1+(·,w2) left-
    continuation support, T = distinct bigram types.

    Every count is an exact BIGINT from combinable groupBys on
    vocabulary-sized keys; the probability rides ONE fixed IEEE tree
    (KN_P_EXPR, textually shared with the oracle) and the per-doc
    order-dependent float sum rounds at 6 dp.  P > 0 always (the
    continuation term is never zero for an observed bigram), so no
    NaN/-Inf path exists.
    """
    words = words_col(F.col("text"))
    d = docs.select("doc_id", words.alias("w"))
    n = F.greatest(F.size("w"), F.lit(1))
    pairs = F.zip_with(
        F.slice(F.col("w"), 1, n - 1),
        F.slice(F.col("w"), 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_bg = (
        d.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    bg = doc_bg.groupBy("w1", "w2").agg(F.sum("k").cast("long").alias("c12"))
    c1 = (
        d.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    nright = bg.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("nright")
    )
    nleft = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("nleft"))
    t_types = bg.agg(F.count(F.lit(1)).cast("long").alias("t_types"))
    scored = (
        doc_bg.join(bg, ["w1", "w2"])
        .join(c1, "w1")
        .join(nright, "w1")
        .join(nleft, "w2")
        .crossJoin(F.broadcast(t_types))
        .withColumn(
            "lp", F.col("k").cast("double") * F.expr(f"ln({KN_P_EXPR})")
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.round(F.sum("lp") / F.sum("k").cast("double"), 6).alias(
            "kn_logprob"
        ),
    )
