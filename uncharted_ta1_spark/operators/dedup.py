"""Deduplication operators for large-scale training-data pipelines.

Four tiers, cheapest to most robust, all shuffle-lean:

  * exact_dedup        — hash-groupBy; one shuffle on the content hash.
  * jaccard_pairs      — n-gram shingle inverted-index self-join; the join
                         key is the shingle hash so only docs *sharing* a
                         shingle ever meet (no cartesian).
  * minhash signatures + LSH banding — the 100TB path: constant-size
                         signatures per doc, candidate pairs only within LSH
                         buckets, exact jaccard verified on candidates only.
  * simhash            — 16-bit similarity hash + banded hamming candidates.

Reference analog: the dedup-by-key patterns of the reference (text filter
dedup ``tasks/metadata_extraction/text_filter.py:113-124``, tile-overlap
dedup W4) generalized to content-level near-dup detection.

All hashes are md5-based (functions/portable.py) so the DuckDB oracle
reproduces them bit-for-bit.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import (
    MERSENNE31,
    md5_i64,
    shingles_col,
    words_col,
)


def doc_shingles(docs: DataFrame, *, n: int = 3, distinct: bool = True) -> DataFrame:
    """(doc_id, sh_hash) — hashed n-word shingles per document (DISTINCT by
    default; ``distinct=False`` keeps multiplicities, the input of the
    repetition quality filter).

    The doc frame is repartitioned before the explode: the shingle+hash
    work is CPU-bound per document, and a small corpus arriving as one
    parquet split would otherwise run it single-threaded (measured 5.8s ->
    1.5s at sf0.1).  At corpus scale the scan supplies many splits and the
    repartition is a cheap rebalance of doc-sized rows, never shingle-sized.
    """
    words = words_col(F.col("text"))
    par = 2 * docs.sparkSession.sparkContext.defaultParallelism
    out = (
        docs.repartition(par, "doc_id")
        .select("doc_id", F.explode(shingles_col(words, n)).alias("shingle"))
        .select("doc_id", md5_i64(F.col("shingle")).alias("sh_hash"))
    )
    return out.distinct() if distinct else out


def span_duplication(docs: DataFrame, *, span_words: int = 10) -> DataFrame:
    """Cross-document duplicated-span fraction (C4-style span dedup signal).

    Chunks each document's words into consecutive non-overlapping
    ``span_words``-word spans (the tail span may be shorter), hashes each,
    and reports per document how many of its span instances occur in more
    than one distinct document — the boilerplate / license-block /
    navigation-chrome signal that corpus-level span dedup removes.

    Plan: one explode (map-side), one distinct + groupBy for span document
    frequency, one equi join back, one per-doc groupBy.  No all-pairs path:
    the join key is the span hash, so cost is linear in corpus spans plus
    the (small) hot-span fan-in, exactly the shape that survives 100 TB.
    """
    words = words_col(F.col("text"))
    n_spans_arr = F.ceil(F.size(words) / F.lit(span_words)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(1), F.greatest(n_spans_arr, F.lit(1))),
        lambda k: F.array_join(
            F.slice(words, (k - F.lit(1)) * span_words + F.lit(1), span_words), " "
        ),
    )
    par = 2 * docs.sparkSession.sparkContext.defaultParallelism
    inst = (
        docs.repartition(par, "doc_id")
        .select("doc_id", F.explode(spans).alias("span"))
        .select("doc_id", md5_i64(F.col("span")).alias("span_hash"))
    )
    # (doc_id, span_hash) is unique after distinct(), so a plain count is
    # the distinct-doc count — avoids stacking a second dedup (countDistinct
    # plans an Expand + extra aggregate) on already-distinct rows
    doc_freq = (
        inst.select("doc_id", "span_hash")
        .distinct()
        .groupBy("span_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("span_df"))
    )
    return (
        inst.join(doc_freq, "span_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("span_df") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"))
            .alias("dup_span_frac"),
        )
    )


def span_scrub(
    docs: DataFrame, *, span_words: int = 10, df_threshold: int = 2
) -> DataFrame:
    """Boilerplate REMOVAL (the transform the span-dedup signal exists to
    drive): aligned ``span_words``-word spans appearing in >=
    ``df_threshold`` distinct documents (license blocks, navigation chrome)
    are dropped and each document's text is rebuilt from its kept spans in
    order — C4-style line/span dedup as an actual cleaning stage, not just
    a score.

    Plan: the same linear span-hash machinery as :func:`span_duplication`
    (explode, span document-frequency, equi join back) plus one per-doc
    rebuild groupBy (collect kept (position, span) pairs, sort, join) —
    positions make the rebuild order-exact regardless of shuffle order.
    Fully-boilerplate documents emit empty text, never NULL.
    """
    words = words_col(F.col("text"))
    n_spans_arr = F.ceil(F.size(words) / F.lit(span_words)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(1), F.greatest(n_spans_arr, F.lit(1))),
        lambda k: F.array_join(
            F.slice(words, (k - F.lit(1)) * span_words + F.lit(1), span_words), " "
        ),
    )
    par = 2 * docs.sparkSession.sparkContext.defaultParallelism
    inst = (
        docs.repartition(par, "doc_id")
        .select("doc_id", F.posexplode(spans).alias("k", "span"))
        .withColumn("span_hash", md5_i64(F.col("span")))
    )
    doc_freq = (
        inst.select("doc_id", "span_hash")
        .distinct()
        .groupBy("span_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("span_df"))
    )
    marked = inst.join(doc_freq, "span_hash")
    kept = F.array_sort(
        F.collect_list(
            F.when(F.col("span_df") < df_threshold, F.struct("k", "span"))
        )
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(
                F.when(F.col("span_df") >= df_threshold, 1).otherwise(0)
            ).cast("long").alias("n_spans_removed"),
            F.array_join(
                F.transform(kept, lambda s: s["span"]), " "
            ).alias("clean_text"),
        )
        .select("doc_id", "n_spans", "n_spans_removed", "clean_text")
    )


def sliding_span_duplication(
    docs: DataFrame, *, span_words: int = 10, stride: int = 5
) -> DataFrame:
    """Sliding-window variant of :func:`span_duplication`: windows of
    ``span_words`` words start every ``stride`` words (stride < span), so a
    duplicated passage of >= span_words + stride - 1 words is caught at ANY
    alignment — aligned non-overlapping spans miss passages that straddle a
    span boundary (Lee et al.-style substring dedup without the
    suffix-array build; the aligned path stays as the cheap tier).

    Documents shorter than one window contribute a single whole-doc window.
    Cost grows by span/stride explode fan-out (2x at 10/5) — same linear
    equi-join plan as the aligned tier, still no all-pairs path.
    """
    words = words_col(F.col("text"))
    w, s = span_words, stride
    n_starts = F.greatest(
        (F.floor((F.size(words) - F.lit(w)) / F.lit(s)) + F.lit(1)),
        F.lit(1),
    ).cast("int")
    spans = F.transform(
        F.sequence(F.lit(1), n_starts),
        lambda k: F.array_join(
            F.slice(words, (k - F.lit(1)) * s + F.lit(1), w), " "
        ),
    )
    par = 2 * docs.sparkSession.sparkContext.defaultParallelism
    inst = (
        docs.repartition(par, "doc_id")
        .select("doc_id", F.explode(spans).alias("span"))
        .select("doc_id", md5_i64(F.col("span")).alias("span_hash"))
    )
    doc_freq = (
        inst.select("doc_id", "span_hash")
        .distinct()
        .groupBy("span_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("span_df"))
    )
    return (
        inst.join(doc_freq, "span_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("span_df") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"))
            .alias("dup_span_frac"),
        )
    )


def exact_duplicate_spans(
    docs: DataFrame,
    *,
    n_anchor: int = 8,
    max_df: int = 50,
    min_span_words: int = 10,
) -> DataFrame:
    """EXACT longest-duplicated-substring detection between document pairs
    (word-level) — the suffix-array tier of the public "deduplicating
    training data" recipe (Lee et al. 2022), re-expressed as bounded
    relational algebra instead of a suffix-array build:

      1. every stride-1 ``n_anchor``-word gram with its start position
         (one row per word position — linear in corpus words);
      2. gram document-frequency; keep grams shared by 2..``max_df``
         distinct docs (the hot-gram cap, same role as jaccard_pairs'
         hot-shingle cap: boilerplate grams in >max_df docs would fan the
         pair join quadratically, and those passages are already caught —
         and removed — by the aligned span_scrub tier);
      3. position-pair join on the gram hash (doc_a < doc_b): a duplicated
         passage of L words produces L-n+1 matches on ONE diagonal
         (pos_a - pos_b constant);
      4. gaps-and-islands per (pair, diagonal): consecutive pos_a runs are
         maximal exact duplicated spans of length run + n_anchor - 1.

    Exactness contract: for any pair of docs, every maximal duplicated
    passage of >= ``n_anchor`` words whose grams stay under the df cap is
    recovered at its EXACT word length and start positions — including
    passages shorter than span_words + stride - 1 that the sliding tier
    misses at unlucky alignments (property-tested).

    Scale: corpus-sized work is one explode + one combinable groupBy + one
    equi join keyed on the gram hash; the island windows partition by
    (doc_a, doc_b, diagonal) — bounded by document length, never by corpus
    size.  Returns one row per qualifying pair: the longest span (ties →
    smallest start_a, then start_b) plus the count of distinct duplicated
    islands >= ``min_span_words``.

    Reference analog: the span-overlap dedup of W4
    (``tasks/text_extraction/...`` tile-overlap suppression) taken to
    exact cross-document substring granularity.
    """
    n = n_anchor
    words = words_col(F.col("text"))
    grams = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(F.size(words) - F.lit(n - 1), F.lit(0)),
        ),
        lambda k: F.array_join(F.slice(words, k, n), " "),
    )
    par = 2 * docs.sparkSession.sparkContext.defaultParallelism
    inst = (
        docs.repartition(par, "doc_id")
        .select("doc_id", F.posexplode(grams).alias("pos0", "gram"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            md5_i64(F.col("gram")).alias("gram_hash"),
        )
    )
    gram_df = (
        inst.select("doc_id", "gram_hash")
        .distinct()
        .groupBy("gram_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("g_df"))
        .where((F.col("g_df") >= 2) & (F.col("g_df") <= max_df))
    )
    shared = inst.join(gram_df.select("gram_hash"), "gram_hash")
    a = shared.select(
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
        "gram_hash",
    )
    b = shared.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        "gram_hash",
    )
    matches = a.join(b, "gram_hash").where(F.col("doc_a") < F.col("doc_b"))
    diag = matches.select(
        "doc_a",
        "doc_b",
        (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        "pos_a",
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    islands = (
        diag.withColumn(
            "grp", F.col("pos_a") - F.row_number().over(w)
        )
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pos_a").alias("start_a"),
            (F.count(F.lit(1)) + F.lit(n - 1)).cast("long").alias("span_words"),
        )
        .select(
            "doc_a",
            "doc_b",
            "span_words",
            "start_a",
            (F.col("start_a") - F.col("diag")).alias("start_b"),
        )
    )
    pick = Window.partitionBy("doc_a", "doc_b").orderBy(
        F.desc("span_words"), F.asc("start_a"), F.asc("start_b")
    )
    return (
        islands.withColumn("_rk", F.row_number().over(pick))
        .withColumn(
            "n_long_islands",
            F.sum(
                F.when(F.col("span_words") >= min_span_words, 1).otherwise(0)
            ).over(Window.partitionBy("doc_a", "doc_b")).cast("long"),
        )
        .where((F.col("_rk") == 1) & (F.col("span_words") >= min_span_words))
        .select(
            "doc_a",
            "doc_b",
            F.col("span_words").alias("longest_span_words"),
            F.col("start_a").alias("longest_start_a"),
            F.col("start_b").alias("longest_start_b"),
            "n_long_islands",
        )
    )


def shingle_repetition(docs: DataFrame, *, n: int = 3) -> DataFrame:
    """Intra-document repetition quality signal: the fraction of a doc's
    n-word shingles that are repeats (1 - distinct/total) — the
    Gopher/RefinedWeb-style "duplicate n-gram fraction" filter every LLM
    corpus pipeline applies before training.  Exact integer counts through
    a fixed float tree; one map-side-combinable groupBy.  Docs with fewer
    than ``n`` words have no shingles and are not emitted."""
    sh = doc_shingles(docs, n=n, distinct=False)
    agg = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.countDistinct("sh_hash").cast("long").alias("n_distinct"),
    )
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_distinct",
        ((F.col("n_shingles") - F.col("n_distinct")).cast("double")
         / F.col("n_shingles").cast("double")).alias("rep_frac"),
    )


def contamination_pairs(
    train_sh: DataFrame,
    eval_sh: DataFrame,
    *,
    min_common: int = 3,
) -> DataFrame:
    """Train-vs-eval decontamination: (train_doc, eval_doc) pairs sharing
    >= ``min_common`` distinct n-gram shingles, with the fraction of the
    EVAL doc's shingles found in the train doc — the benchmark-overlap
    removal step of an LLM data pipeline (same inverted-index equi-join
    shape as :func:`jaccard_pairs`, cross-corpus instead of self).

    The eval corpus is tiny relative to train, so its shingle index
    broadcasts: the candidate join adds no train-side shuffle at all.
    """
    ev = eval_sh.select(
        F.col("doc_id").alias("eval_doc"), "sh_hash"
    )
    ev_sizes = ev.groupBy("eval_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_sh")
    )
    common = (
        train_sh.join(F.broadcast(ev), "sh_hash")
        .groupBy(F.col("doc_id").alias("train_doc"), F.col("eval_doc"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    return common.join(F.broadcast(ev_sizes), "eval_doc").select(
        "train_doc",
        "eval_doc",
        "n_common",
        "n_eval_sh",
        (F.col("n_common").cast("double") / F.col("n_eval_sh").cast("double"))
        .alias("overlap_frac"),
    )


def exact_dedup(docs: DataFrame, *, prefix_words: int | None = None) -> DataFrame:
    """Exact dedup by content hash (optionally on a word-prefix key).

    Returns one row per distinct key: canonical doc (min doc_id), dup count.
    Scale: one hash-partition shuffle on the 60-bit key; min/count are
    map-side partial aggregates.
    """
    if prefix_words is None:
        key = F.col("text")
    else:
        key = F.array_join(F.slice(words_col(F.col("text")), 1, prefix_words), " ")
    return (
        docs.select(md5_i64(key).alias("key_hash"), "doc_id")
        .groupBy("key_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


def overlap_pair_counts(
    shingles: DataFrame, *, max_df: int | None = 256
) -> DataFrame:
    """(doc1, doc2, n_common, n1, n2) for every document pair sharing at
    least one surviving shingle — the shared inverted-index core of
    :func:`jaccard_pairs` and :func:`containment_pairs` (see the former's
    docstring for the max_df rationale and scale notes)."""
    # materialize the shingle index ONCE: four consumers branch off it (the
    # df count, the anti-join, and both self-join legs), and without the
    # checkpoint each branch re-runs the upstream explode+hash+distinct —
    # measured as the dominant cost of this operator at sf0.1.  At corpus
    # scale this is the "write the inverted index before joining it" step.
    shingles = shingles.localCheckpoint()
    if max_df is not None:
        hot = (
            shingles.groupBy("sh_hash")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("sh_hash")
        )
        shingles = shingles.join(
            F.broadcast(hot), "sh_hash", "left_anti"
        ).localCheckpoint()
    counts = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    common = (
        a.join(b, (F.col("a.sh_hash") == F.col("b.sh_hash")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc1"), F.col("n_sh").alias("n1"))
    cb = counts.select(F.col("doc_id").alias("doc2"), F.col("n_sh").alias("n2"))
    return common.join(F.broadcast(ca), "doc1").join(F.broadcast(cb), "doc2")


def containment_pairs(
    shingles: DataFrame, *, min_containment: float = 0.8, max_df: int | None = 256
) -> DataFrame:
    """Sub-document duplication by asymmetric shingle containment:
    ``C(A,B) = |A∩B| / min(|A|,|B|)`` — the Broder containment coefficient
    ("On the resemblance and containment of documents", SEQUENCES 1997 —
    public method).  A short document pasted inside a much longer one has
    tiny Jaccard (the union is dominated by the long side) but containment
    ≈ 1; this is the screen that catches quote-farms and wrapper pages a
    Jaccard/MinHash pass structurally misses.

    Reference analog: the tile fan-in dedup keeps the MOST-contained
    extraction when tiles overlap (``tasks/text_extraction/tile.py``
    fan-in); this is the corpus-level generalization.

    Same inverted-index shape as :func:`jaccard_pairs` (shingles meet only
    on equal hashes, df-capped) — no new shuffle beyond the shared core.
    Emits the Jaccard alongside so downstream policy can distinguish
    "near-identical" from "one-contains-the-other"."""
    out = (
        overlap_pair_counts(shingles, max_df=max_df)
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.least(F.col("n1"), F.col("n2")), 9),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 9
            ),
        )
        .where(F.col("containment") >= min_containment)
    )
    return out.select(
        "doc1", "doc2", "n_common", "n1", "n2", "containment", "jaccard"
    )


def jaccard_pairs(
    shingles: DataFrame, *, min_jaccard: float = 0.5, max_df: int | None = 256
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard over the shingle inverted index.

    |A∩B| via the self-equi-join on sh_hash (docs meet only where they share
    a shingle); |A|,|B| via a grouped count joined back (broadcast — the
    per-doc count table is tiny relative to the pair stream).

    ``max_df`` caps the document frequency of a shingle before the self-join:
    a shingle shared by d documents yields d^2/2 join rows, so one viral
    boilerplate trigram (df=10^6 at corpus scale) would otherwise produce
    10^12 rows in a single hot bucket.  Shingles with df > max_df carry
    almost no similarity signal (they're corpus boilerplate) and are dropped
    from BOTH the intersection and the per-doc sizes — the standard
    MinHashLSH-era document-frequency cut.  The hot-shingle set is tiny by
    construction, so the prune is a broadcast anti-join, and the df count
    itself is a map-side-combinable aggregate.
    """
    out = (
        overlap_pair_counts(shingles, max_df=max_df)
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 9
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    return out.select("doc1", "doc2", "n_common", "n1", "n2", "jaccard")


def minhash_params(k: int = 16, seed: int = 42) -> list[tuple[int, int, int]]:
    """Deterministic (perm_id, a, b) for k universal-hash permutations."""
    rng = random.Random(seed)
    return [(i, rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31)) for i in range(k)]


def minhash_signatures(
    shingles: DataFrame, *, k: int = 16, seed: int = 42
) -> DataFrame:
    """(doc_id, perm, minhash) — k-permutation minhash signature per doc.

    h_i(s) = (a_i * (s % 2^31) + b_i) % (2^31 - 1): fits int64, portable.

    All k permutations are evaluated as k min-aggregates in ONE groupBy pass
    over the shingle stream (no k-fold row blowup — at 10^12 shingles a
    crossJoin with the perm table would multiply shuffle volume by k); the
    wide row is then unpivoted to the (doc_id, perm, minhash) long form.
    """
    s_small = F.col("sh_hash") % F.lit(2**31)
    mins = [
        F.min((F.lit(a) * s_small + F.lit(b)) % F.lit(MERSENNE31)).alias(f"_m{i}")
        for i, a, b in minhash_params(k, seed)
    ]
    wide = shingles.groupBy("doc_id").agg(*mins)
    stack_expr = ", ".join(f"{i}, _m{i}" for i in range(k))
    return wide.select(
        "doc_id",
        F.expr(f"stack({k}, {stack_expr}) as (perm, minhash)"),
    ).select("doc_id", F.col("perm").cast("int"), "minhash")


def minhash_bands(
    shingles: DataFrame, *, k: int = 16, band_size: int = 4, seed: int = 42
) -> DataFrame:
    """(doc_id, band, band_sig) in ONE aggregation pass — the fused fast path.

    The long-form path (minhash_signatures → lsh_candidate_pairs) unpivots to
    k rows/doc and re-aggregates per band with a collect_list — a second full
    shuffle of the signature stream.  Here the band signatures are computed
    INLINE on the wide row (the concatenated 'perm:minhash' string is
    identical to the long path's sorted aggregate, so band_sig values are
    bit-equal), then unpivoted to (band, band_sig) — a pure map, no extra
    shuffle.  One groupBy over shingles total.
    """
    s_small = F.col("sh_hash") % F.lit(2**31)
    mins = [
        F.min((F.lit(a) * s_small + F.lit(b)) % F.lit(MERSENNE31)).alias(f"_m{i}")
        for i, a, b in minhash_params(k, seed)
    ]
    wide = shingles.groupBy("doc_id").agg(*mins)
    n_bands = k // band_size
    band_cols = []
    for bnd in range(n_bands):
        parts = [
            F.concat(F.lit(f"{i}:"), F.col(f"_m{i}").cast("string"))
            for i in range(bnd * band_size, (bnd + 1) * band_size)
        ]
        band_cols.append(md5_i64(F.concat_ws(",", *parts)).alias(f"_b{bnd}"))
    banded = wide.select("doc_id", *band_cols)
    stack_expr = ", ".join(f"{bnd}, _b{bnd}" for bnd in range(n_bands))
    return banded.select(
        "doc_id",
        F.expr(f"stack({n_bands}, {stack_expr}) as (band, band_sig)"),
    ).select("doc_id", F.col("band").cast("int"), "band_sig")


def lsh_pairs_from_bands(bands: DataFrame) -> DataFrame:
    """Candidate pairs agreeing on >= 1 band: equi join on (band, band_sig)."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, *, band_size: int = 4
) -> DataFrame:
    """Candidate pairs agreeing on ALL rows of >= 1 LSH band.

    Band signature = md5 hash of the concatenated minhash values; candidates
    join bucket-locally (equi join on (band, band_sig)) — never a cartesian.
    Emits (doc1, doc2, n_bands) with the number of agreeing bands.
    """
    bands = (
        signatures.withColumn("band", F.expr(f"perm div {band_size}"))
        .groupBy("doc_id", "band")
        .agg(
            md5_i64(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("perm", "minhash"))),
                        lambda x: F.concat(
                            x["perm"].cast("string"), F.lit(":"), x["minhash"].cast("string")
                        ),
                    ),
                    ",",
                )
            ).alias("band_sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands"))
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit simhash per document over (non-distinct) word hashes.

    bit b of the signature is 1 iff sum over words of (±1 by word-hash bit b)
    is > 0.  Single-pass: the 16 per-bit sums are 16 conditional aggregates
    in ONE groupBy over the word-hash stream — no 16x bit-position explode
    (which would multiply shuffle volume by 16 at corpus scale), same
    refactor as minhash_signatures.  All integer arithmetic, portable.
    """
    words = words_col(F.col("text"))
    exploded = docs.select("doc_id", F.explode(words).alias("w")).select(
        "doc_id", md5_i64(F.col("w")).alias("h")
    )
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_s{b}")
        for b in range(16)
    ]
    per_doc = exploded.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for b in range(16):
        term = F.when(F.col(f"_s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return per_doc.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_pairs(sim: DataFrame, *, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by banded simhash (two 8-bit bands) + hamming cut.

    Recall note: a pair differing in BOTH bands is missed — that's the LSH
    trade; exact hamming is verified on the candidates that do collide.

    Scale design: the band-collision predicate is a disjunction
    (``hi=hi OR lo=lo``), which as a single join has no equi conjunct and
    Spark would plan it as a BroadcastNestedLoopJoin — cartesian at corpus
    scale.  Instead each band is its own hash-partitioned equi self-join,
    and the legs are made DISJOINT by construction: the lo leg additionally
    requires ``hi != hi``, so a pair colliding on both bands appears only in
    the hi leg and the union needs NO pair-level dropDuplicates — that dedup
    was a full shuffle of the candidate stream (the operator's largest, cut
    here).  Plan-asserted in
    tests/test_plans.py::test_simhash_pairs_is_not_nested_loop.
    """
    banded = sim.select(
        "doc_id",
        "simhash",
        F.shiftright(F.col("simhash"), 8).alias("hi"),
        F.col("simhash").bitwiseAND(F.lit(255)).alias("lo"),
    )

    def _leg(band_col: str, extra=None) -> DataFrame:
        a = banded.alias("a")
        b = banded.alias("b")
        cond = (F.col(f"a.{band_col}") == F.col(f"b.{band_col}")) & (
            F.col("a.doc_id") < F.col("b.doc_id")
        )
        if extra is not None:
            cond = cond & extra
        return a.join(b, cond).select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.simhash").alias("sh1"),
            F.col("b.simhash").alias("sh2"),
        )

    cand = _leg("hi").unionByName(
        _leg("lo", extra=F.col("a.hi") != F.col("b.hi"))
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.expr("sh1 ^ sh2")).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "sh1", "sh2", "hamming")
    )


def winnow_fingerprints(
    docs: DataFrame, *, k: int = 4, w: int = 5
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS local-fingerprinting
    algorithm, Schleimer-Wilkerson-Aiken 2003): hash every k-word gram,
    slide a w-gram window, and keep each window's minimum hash (ties ->
    rightmost position).  The selected (position, hash) set is the
    guarantee-bearing sketch: any match of length >= w+k-1 words between
    two documents shares at least one selected fingerprint, at ~2/(w+1)
    the density of the full gram set.

    Determinism across engines: the window argmin is ONE string min over a
    fixed-width encoding '<hash:19 digits><(10^10-1-pos):10 digits>' —
    lexicographic order == (hash asc, pos desc), so the rightmost-tie rule
    needs no second pass and DuckDB reproduces it verbatim.

    Plan: one explode (linear in corpus words), one w-row running min
    window PARTITIONED BY doc (bounded by document length, never corpus
    size), one distinct.  No joins, no corpus-wide sort.

    Reference analog: the tile-overlap duplicate suppression of W4
    (``tasks/text_extraction`` tile merge) needs exactly this
    position-anchored sketch when overlaps are fuzzy; also the standard
    plagiarism/provenance index of a training-data pipeline.
    """
    words = words_col(F.col("text"))
    grams = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (k - 1)),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    par = 2 * docs.sparkSession.sparkContext.defaultParallelism
    inst = (
        docs.repartition(par, "doc_id")
        .select("doc_id", F.posexplode(grams).alias("pos0", "gram"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            md5_i64(F.col("gram")).alias("sh_hash"),
        )
    )
    enc = F.concat(
        F.format_string("%019d", F.col("sh_hash")),
        F.format_string("%010d", F.lit(9_999_999_999) - F.col("pos")),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    n_grams = Window.partitionBy("doc_id")
    sel = (
        inst.withColumn("_enc", enc)
        .withColumn("_winmin", F.min("_enc").over(win))
        .withColumn("_n", F.count(F.lit(1)).over(n_grams))
        # only FULL windows select (starts 1 .. G-w+1); short docs with
        # fewer than w grams keep their single global min (start 1 only)
        .where(F.col("pos") <= F.greatest(F.col("_n") - F.lit(w - 1), F.lit(1)))
        .select(
            "doc_id",
            (F.lit(9_999_999_999)
             - F.substring("_winmin", 20, 10).cast("long")).alias("pos"),
            F.substring("_winmin", 1, 19).cast("long").alias("sh_hash"),
        )
        .distinct()
    )
    return sel
