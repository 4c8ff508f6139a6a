"""Token-stream packing: concat-and-chunk sequences into training windows.

The training-data op every LLM pretraining pipeline runs after dedup and
filtering: concatenate each stream's token sequences in event order and cut
the stream into fixed-capacity context windows ("packing"), tracking where
every sequence lands so attention masks / document boundaries can be
reconstructed.  (Reference lineage is the tiling fan-out of
``tasks/point_extraction/tiling.py:82-114`` — partition a large payload into
fixed windows with positional bookkeeping — applied to the token axis.)

Spark-first: packing here is the standard concat-and-chunk scheme (windows
are filled by stream position, sequences may straddle a boundary), which is
EXACTLY one window cumsum per stream — no fold, no UDF, one hash Exchange on
the stream key.  The greedy no-straddle variant is a sequential fold with no
closed form; concat-and-chunk is what large-scale pipelines actually run
because it wastes zero tokens to padding and stays embarrassingly parallel.

Per row the operator emits:
- ``start_off``  exclusive running token offset within the stream,
- ``chunk_id``   window index of the sequence's FIRST token,
- ``chunk_off``  position of that token inside its window,
- ``end_chunk``  window index of the LAST token,
- ``straddles``  true when the sequence crosses a window boundary.

All integer arithmetic — bit-exact in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_chunks(
    seq: DataFrame,
    *,
    capacity: int,
    keys: Sequence[str] = ("doc_id", "source"),
    order: Sequence[str] = ("event_epoch", "seq_no"),
) -> DataFrame:
    """Assign every sequence its packed-window coordinates (see module doc).

    ``capacity`` is the context-window length in tokens.  Ordering must be a
    total order per stream (the default (event_epoch, seq_no) is one for the
    engine's ``sequences`` table).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    keys = list(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("n_tok").cast("long")).over(w)
    start = (cum - F.col("n_tok")).alias("start_off")
    return seq.select(
        *keys,
        *order,
        "n_tok",
        start,
    ).select(
        *keys,
        *order,
        "n_tok",
        "start_off",
        # integer division (DIV, not /): float division loses exactness for
        # stream offsets past 2^53 — real at 10^12-token streams
        F.expr(f"start_off DIV {capacity}").alias("chunk_id"),
        F.expr(f"start_off % {capacity}").alias("chunk_off"),
        F.expr(f"(start_off + n_tok - 1) DIV {capacity}").alias("end_chunk"),
    ).withColumn("straddles", F.col("end_chunk") > F.col("chunk_id"))


def mask_tokens(
    seq: DataFrame,
    *,
    tokens_col: str = "tokens",
    rate_pct: int = 15,
    mask_id: int = -1,
    salt: str = "mlm",
) -> DataFrame:
    """Deterministic MLM-style token masking (the BERT 15% rule, Devlin et
    al. 2018 — public method): position ``i`` of a sequence is replaced by
    ``mask_id`` iff a portable md5 hash of ``(salt, doc_id, seq_no, i)``
    lands under ``rate_pct`` — so the corruption is reproducible across
    engines, reruns and repartitions (a random mask is none of those), and
    an epoch-style re-mask is just a salt change.

    Pure JVM higher-order-function work: one ``transform`` over the token
    array per row, no shuffle, no Python.  Reference analog: the mask-token
    handling of the vendored tokenizer
    (``tasks/segmentation/layoutlmft/models/layoutlmv3/
    tokenization_layoutlmv3.py`` mask_token) — recast as a corpus-scale
    deterministic transform.

    Output adds ``masked_tokens`` (array) and ``n_masked``.
    """
    from uncharted_ta1_spark.functions.portable import md5_i64

    def _mask(x, i):
        h = md5_i64(
            F.concat_ws(
                "|",
                F.lit(salt),
                F.col("doc_id"),
                F.col("seq_no").cast("string"),
                i.cast("string"),
            )
        )
        return F.when(h % 100 < rate_pct, F.lit(mask_id)).otherwise(x)

    out = seq.withColumn(
        "masked_tokens", F.transform(F.col(tokens_col), _mask)
    )
    return out.withColumn(
        "n_masked",
        F.size(
            F.filter(F.col("masked_tokens"), lambda x: x == F.lit(mask_id))
        ).cast("long"),
    )


def span_corruption(
    seq: DataFrame,
    *,
    tokens_col: str = "tokens",
    rate_pct: int = 15,
    sentinel_base: int = 100,
    salt: str = "t5",
) -> DataFrame:
    """Deterministic T5-style span corruption (Raffel et al., "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text Transformer",
    JMLR 2020 — public method): positions are masked by the same portable
    per-position hash rule as :func:`mask_tokens`, then CONSECUTIVE masked
    positions collapse into one span.  The corrupted input replaces each
    span with a single sentinel id ``-(sentinel_base + span_idx)`` and the
    target emits ``sentinel, original tokens...`` per span plus a closing
    sentinel — the exact seq2seq denoising pair layout.

    Reference analog: the mask-token handling of the vendored tokenizer
    (``tasks/segmentation/layoutlmft/models/layoutlmv3/
    tokenization_layoutlmv3.py``), generalized from single-token MLM to
    span denoising.

    Determinism/portability: every decision is a pure function of
    ``(salt, doc_id, seq_no, position)`` via the md5 kernel, so the pair
    set is bit-reproducible across engines, reruns and repartitions.

    Scale shape: pure JVM array HOFs over each row — zero shuffle, zero
    Python, map-side only.  The span-index prefix count is O(len^2) in
    boolean ops per row, bounded by the corpus max sequence length (a
    constant), so per-row work is O(1) at any corpus scale.

    Output adds ``corrupted_tokens``, ``target_tokens`` (arrays — callers
    csv-serialize at contract surfaces), ``n_spans``, ``n_masked``.
    """

    from uncharted_ta1_spark.functions.portable import md5_i64

    def _h(i: Column) -> Column:
        return md5_i64(
            F.concat_ws(
                "|",
                F.lit(salt),
                F.col("doc_id"),
                F.col("seq_no").cast("string"),
                i.cast("string"),
            )
        )

    def _flag(i: Column) -> Column:
        return _h(i) % 100 < rate_pct

    # start-of-span: masked here, not masked at i-1 (recompute the i-1 hash
    # instead of self-referencing the flags array: 2 md5/position, branch-free)
    def _start(i: Column) -> Column:
        return _flag(i) & ((i == 0) | ~_flag(i - 1))

    tok = F.col(tokens_col)
    flags = F.transform(tok, lambda x, i: _flag(i))
    starts = F.transform(tok, lambda x, i: _start(i))
    out = (
        seq.withColumn("_flags", flags)
        .withColumn("_starts", starts)
        # 1-based span index at each position = #starts in positions 0..i
        .withColumn(
            "_spanidx",
            F.transform(
                F.col("_starts"),
                lambda x, i: F.size(
                    F.filter(
                        F.slice(F.col("_starts"), F.lit(1), i + 1),
                        lambda s: s,
                    )
                ),
            ),
        )
    )
    sent = lambda k: -(F.lit(sentinel_base) + k)  # noqa: E731
    corrupted = F.filter(
        F.transform(
            tok,
            lambda x, i: F.when(~F.element_at(F.col("_flags"), i + 1), x)
            .when(
                F.element_at(F.col("_starts"), i + 1),
                sent(F.element_at(F.col("_spanidx"), i + 1)),
            )
            .otherwise(F.lit(None).cast("int")),
        ),
        lambda x: x.isNotNull(),
    )
    n_spans = F.element_at(
        F.concat(F.array(F.lit(0)), F.col("_spanidx")), -1
    )
    target = F.concat(
        F.flatten(
            F.transform(
                tok,
                lambda x, i: F.when(
                    ~F.element_at(F.col("_flags"), i + 1),
                    F.array().cast("array<int>"),
                )
                .when(
                    F.element_at(F.col("_starts"), i + 1),
                    F.array(
                        sent(F.element_at(F.col("_spanidx"), i + 1)), x
                    ),
                )
                .otherwise(F.array(x)),
            )
        ),
        F.array(sent(n_spans + 1)),
    )
    return (
        out.withColumn("corrupted_tokens", corrupted)
        .withColumn("target_tokens", target)
        .withColumn("n_spans", n_spans.cast("long"))
        .withColumn(
            "n_masked",
            F.size(F.filter(F.col("_flags"), lambda s: s)).cast("long"),
        )
        .drop("_flags", "_starts", "_spanidx")
    )


def pair_pack(
    seq: DataFrame,
    *,
    key: str = "source",
    weight: str = "n_tok",
    cap: int = 64,
    order_tiebreak: Sequence[str] = ("doc_id", "seq_no"),
) -> DataFrame:
    """Padding-minimizing PAIR packing: within each stream, rank sequences
    by length descending and pair rank r with rank (n+1-r) — the classic
    largest-with-smallest two-pointer heuristic for capacity-``cap`` bins
    (the rank-pairing form of best-fit-decreasing; public bin-packing
    folklore, cf. Graphcore's histogram packing for BERT, Kosec et al.
    2021).  Pairs whose combined length exceeds ``cap`` stay singletons
    (each member becomes its own pack); sequences longer than ``cap``
    are flagged.

    Unlike ``pack_chunks`` (concat-and-chunk: zero padding, straddling
    allowed) this preserves sequence boundaries — the padded-batch
    regime — and reports the padding it costs.

    Plan (scale contract): the per-stream length rank is NOT a per-stream
    global sort — with a handful of streams that window funnels the whole
    corpus through that many tasks (the vocab_index/value_deciles
    scale-killer class).  Ranks come from ``binning.bucketed_rank`` (GK
    range buckets + broadcast offsets, bit-identical to the naive
    window, max task ~ stream/100); the pack census is one combinable
    groupBy.  Exact integers end to end.
    """
    from uncharted_ta1_spark.operators.binning import bucketed_rank

    ranked = bucketed_rank(
        seq.select(
            key, F.col(weight).cast("long").alias("w"), *order_tiebreak
        ),
        keys=[key],
        col="w",
        order_tiebreak=order_tiebreak,
        out_rank="r",
        out_n="n",
    ).select(key, "w", "r", "n")
    paired = ranked.select(
        key,
        "w",
        "r",
        "n",
        F.least(F.col("r"), F.col("n") + 1 - F.col("r")).alias("pair_id"),
    )
    packs = paired.groupBy(key, "pair_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("w").cast("long").alias("tok_sum"),
        F.max("w").cast("long").alias("max_w"),
    )
    # a pair that does not fit under cap splits into singleton packs:
    # emit it as TWO packs of its members (n_packs accounting only —
    # membership is derivable from the rank rule, so no row fan-out)
    return packs.select(
        key,
        F.col("pair_id").cast("long").alias("pair_id"),
        "n_members",
        "tok_sum",
        "max_w",
        (F.col("max_w") > cap).alias("oversize"),
        F.when(
            (F.col("n_members") == 2) & (F.col("tok_sum") <= cap), 1
        )
        .otherwise(F.col("n_members"))
        .cast("long")
        .alias("n_packs"),
        F.when(
            (F.col("n_members") == 2) & (F.col("tok_sum") <= cap),
            F.lit(cap) - F.col("tok_sum"),
        )
        .otherwise(F.col("n_members") * cap - F.col("tok_sum"))
        .cast("long")
        .alias("padding_toks"),
    )


def pair_pack_summary(packed: DataFrame, *, key: str = "source",
                      cap: int = 64) -> DataFrame:
    """Per-stream packing census: packs, padding, efficiency (9 dp)."""
    agg = packed.groupBy(key).agg(
        F.sum("n_members").cast("long").alias("n_seqs"),
        F.sum("tok_sum").cast("long").alias("n_toks"),
        F.sum("n_packs").cast("long").alias("n_packs"),
        F.sum("padding_toks").cast("long").alias("padding_toks"),
        F.sum(F.when(F.col("oversize"), 1).otherwise(0))
        .cast("long")
        .alias("n_oversize"),
    )
    return agg.select(
        key,
        "n_seqs",
        "n_toks",
        "n_packs",
        "padding_toks",
        "n_oversize",
        F.round(
            F.col("n_toks").cast("double")
            / (F.col("n_packs") * F.lit(cap)).cast("double"),
            9,
        ).alias("pack_efficiency"),
    )
