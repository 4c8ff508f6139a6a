"""Corpus-level BLEU-2 between each sequence and a deterministically
corrupted candidate — the standard MT/generation evaluation metric
(Papineni et al., "BLEU: a Method for Automatic Evaluation of Machine
Translation", ACL 2002 — public method) made engine-portable: the
candidate is the reference with positions dropped by the repo's md5
position-hash rule (the word-dropout augmentation), so the whole
pipeline — pairing, clipping, brevity penalty — is a pure function of
the corpus and reproducible bit-for-bit anywhere.

Reference analog: the reference scores extraction quality against ground
truth with set-overlap F1 (``pipelines/metadata_extraction/
run_pipeline.py`` scoring utilities); BLEU is the order-sensitive n-gram
generalization a text-generation data pipeline needs.

Scale design (100 TB):

* Clipped n-gram matches are computed PER ROW with JVM array HOFs
  (``aggregate``/``filter``/``zip_with``) — O(L²) in the bounded sequence
  length, zero shuffle, zero Python.
* The only corpus-sized reduction is ONE combinable groupBy summing six
  BIGINT registers per source (matches/totals per order + both length
  sums) — corpus BLEU is by definition a ratio of corpus sums, so the
  registers are mergeable by addition and the final math runs on the
  #sources-row table.
* Floats derive from exact BIGINTs through a fixed IEEE tree mirrored
  textually in the DuckDB oracle; 6-dp rounding absorbs libm ulp noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DROP_RATE_PCT = 15
DROP_SALT = "drop"


def _clipped(cand: str, ref: str) -> str:
    """SQL fragment: sum over distinct grams of min(count in cand, ref)."""
    return (
        f"aggregate(array_distinct({cand}), 0L, (acc, g) -> acc + "
        f"least(size(filter({cand}, x -> x = g)), "
        f"size(filter({ref}, x -> x = g))))"
    )


def _bigrams(col: str) -> str:
    """SQL fragment: '_'-joined adjacent token pairs of an int array."""
    return (
        f"zip_with(slice({col}, 1, greatest(size({col}) - 1, 0)), "
        f"slice({col}, 2, greatest(size({col}) - 1, 0)), "
        f"(a, b) -> concat(cast(a as string), '_', cast(b as string)))"
    )


def bleu_dropout_eval(
    seq: DataFrame,
    *,
    tokens_col: str = "tokens",
    rate_pct: int = DROP_RATE_PCT,
    salt: str = DROP_SALT,
) -> DataFrame:
    """Per-source corpus BLEU-2 of the word-dropout candidate vs the
    original sequence.

    Returns one row per source with the six exact registers
    (``m1/t1/m2/t2`` clipped-match and total n-gram counts,
    ``len_ref/len_cand`` sums), ``n_seq``, the 9-dp modified precisions
    and the 6-dp ``bleu2`` (brevity penalty × geometric mean of p1, p2).
    Sources where any register is zero emit NULL bleu2, never a domain
    error.
    """
    from uncharted_ta1_spark.functions.portable import md5_i64

    def _keep(i: Column) -> Column:
        return (
            md5_i64(
                F.concat_ws(
                    "|",
                    F.lit(salt),
                    F.col("doc_id"),
                    F.col("seq_no").cast("string"),
                    i.cast("string"),
                )
            )
            % 100
            >= rate_pct
        )

    ref = F.col(tokens_col)
    cand = F.filter(ref, lambda x, i: _keep(i))
    rows = (
        seq.withColumn("_cand", cand)
        .withColumn("_m1", F.expr(_clipped("_cand", tokens_col)))
        .withColumn("_bg_c", F.expr(_bigrams("_cand")))
        .withColumn("_bg_r", F.expr(_bigrams(tokens_col)))
        .withColumn("_m2", F.expr(_clipped("_bg_c", "_bg_r")))
    )
    regs = rows.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_seq"),
        F.sum("_m1").cast("long").alias("m1"),
        F.sum(F.size("_cand")).cast("long").alias("t1"),
        F.sum("_m2").cast("long").alias("m2"),
        F.sum(F.size("_bg_c")).cast("long").alias("t2"),
        F.sum(F.size(ref)).cast("long").alias("len_ref"),
        F.sum(F.size("_cand")).cast("long").alias("len_cand"),
    )
    return regs.select(
        "source",
        "n_seq",
        "m1",
        "t1",
        "m2",
        "t2",
        "len_ref",
        "len_cand",
        F.expr(_P_EXPR.format(m="m1", t="t1")).alias("p1"),
        F.expr(_P_EXPR.format(m="m2", t="t2")).alias("p2"),
        F.expr(_BLEU2_EXPR).alias("bleu2"),
    )


# fixed IEEE fragments, textually shared with the oracle (dual-dialect
# invariant): identical operation order in Spark SQL and DuckDB.
_P_EXPR = "round(CAST({m} AS DOUBLE) / CAST(NULLIF({t}, 0) AS DOUBLE), 9)"
_BP = (
    "(CASE WHEN len_cand >= len_ref THEN 1.0 "
    "ELSE EXP(1.0 - CAST(len_ref AS DOUBLE) / CAST(NULLIF(len_cand, 0) AS DOUBLE)) END)"
)
_BLEU2_EXPR = (
    f"round({_BP} * EXP("
    "0.5 * LN(CAST(NULLIF(m1, 0) AS DOUBLE) / CAST(NULLIF(t1, 0) AS DOUBLE))"
    " + 0.5 * LN(CAST(NULLIF(m2, 0) AS DOUBLE) / CAST(NULLIF(t2, 0) AS DOUBLE))"
    "), 6)"
)


def bleu_oracle_select(*, rate_pct: int = DROP_RATE_PCT,
                       salt: str = DROP_SALT) -> str:
    """DuckDB twin over a ``sequences`` CTE — list_* reconstruction of the
    same dropout/clip/register pipeline, final math from the SAME IEEE
    fragments as the Spark plan."""
    keep = (
        f"(('0x' || substr(md5('{salt}' || '|' || doc_id || '|' || "
        "CAST(seq_no AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 15))"
        f"::BIGINT) % 100 >= {rate_pct}"
    )
    return f"""
, bleu_rows AS (
  SELECT source, tokens,
         list_filter(list_transform(range(len(tokens)), i ->
           CASE WHEN {keep} THEN tokens[i + 1] END), x -> x IS NOT NULL) AS cand
  FROM sequences
),
bleu_grams AS (
  SELECT source, tokens, cand,
         list_transform(range(greatest(len(cand) - 1, 0)),
           i -> CAST(cand[i + 1] AS VARCHAR) || '_' || CAST(cand[i + 2] AS VARCHAR)) AS bg_c,
         list_transform(range(greatest(len(tokens) - 1, 0)),
           i -> CAST(tokens[i + 1] AS VARCHAR) || '_' || CAST(tokens[i + 2] AS VARCHAR)) AS bg_r
  FROM bleu_rows
),
bleu_m AS (
  SELECT source,
         coalesce(list_sum(list_transform(list_distinct(cand), g ->
           least(len(list_filter(cand, x -> x = g)),
                 len(list_filter(tokens, x -> x = g))))), 0) AS m1,
         len(cand) AS t1,
         coalesce(list_sum(list_transform(list_distinct(bg_c), g ->
           least(len(list_filter(bg_c, x -> x = g)),
                 len(list_filter(bg_r, x -> x = g))))), 0) AS m2,
         len(bg_c) AS t2,
         len(tokens) AS lr, len(cand) AS lc
  FROM bleu_grams
),
bleu_regs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_seq,
         CAST(sum(m1) AS BIGINT) AS m1, CAST(sum(t1) AS BIGINT) AS t1,
         CAST(sum(m2) AS BIGINT) AS m2, CAST(sum(t2) AS BIGINT) AS t2,
         CAST(sum(lr) AS BIGINT) AS len_ref, CAST(sum(lc) AS BIGINT) AS len_cand
  FROM bleu_m GROUP BY source
)
SELECT source, n_seq, m1, t1, m2, t2, len_ref, len_cand,
  {_P_EXPR.format(m='m1', t='t1')} + 0.0 AS p1,
  {_P_EXPR.format(m='m2', t='t2')} + 0.0 AS p2,
  {_BLEU2_EXPR} + 0.0 AS bleu2
FROM bleu_regs
"""
