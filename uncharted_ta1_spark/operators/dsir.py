"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023 — public method): score every raw document by the log-likelihood
ratio of a hashed-n-gram bag-of-features model fit on a small target
domain vs the raw corpus, then keep the target-like documents.  This is
the standard "make my 100 TB crawl look like my 10 GB domain corpus"
selection step of an LLM data pipeline.

Reference analog: the adaptive relevance text filter that shrinks the
candidate text fed to the metadata extractor until it fits the budget
(``tasks/metadata_extraction/metadata_extraction.py:509-530``) — a
target-relevance document scorer; here the scorer is the published
importance-resampling estimator over hashed bigram features.

Math (add-1 smoothed multinomials over B hash buckets):

    p_t[b] = (c_t[b]+1)/(T+B)      target bucket distribution
    p_r[b] = (c_r[b]+1)/(R+B)      raw-corpus bucket distribution
    log w(x) = sum_b k_x[b] * (ln p_t[b] - ln p_r[b])
             = sum_b k_x[b] * ln((c_t[b]+1)/(c_r[b]+1))
               + n_x * ln((R+B)/(T+B))

All counts are exact BIGINTs in both engines; the only order-dependent
float sum (sum_b k*lam) is rounded at 6 dp per the repo's cross-engine
float rules, and ln arguments are strictly positive so no NaN/Inf paths
exist.

Scale design (100 TB corpus):

* Features hash into B=256 buckets MAP-SIDE (md5 of the bigram, modulo
  B) — the per-(doc, bucket) count groupBy is map-side combinable and is
  the ONE corpus-sized shuffle, keyed by doc_id (the natural key).
* Both model tables (target and raw bucket counts) are reaggregations of
  the per-doc table — never a second pass over the text — and are
  CONSTANT-SIZE (<= B rows each): they broadcast, along with the two
  scalar totals.  Unlike a vocabulary-keyed LM join there is no
  vocabulary-sized shuffle anywhere.
* The selection flag is a pure threshold (log w > 0, i.e. the document
  is likelier under the target model) — no global sort, no top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import md5_i64, words_col

DSIR_BUCKETS = 256
DSIR_SALT = "dsir"


def dsir_weights(
    docs: DataFrame,
    *,
    target_lang: str = "en",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR log importance weight vs the ``target_lang``
    slice, over hashed bigram features.

    Returns (doc_id, lang, n_feat, logw, selected) for every document
    with at least one bigram; ``selected`` = log w > 0.
    """
    words = words_col(F.col("text"))
    d = docs.select("doc_id", "lang", words.alias("w"))
    n = F.greatest(F.size("w"), F.lit(1))
    pairs = F.zip_with(
        F.slice(F.col("w"), 1, n - 1),
        F.slice(F.col("w"), 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    doc_b = (
        d.select("doc_id", "lang", F.explode(pairs).alias("bg"))
        .withColumn("bucket", (md5_i64(F.col("bg"), salt=DSIR_SALT) % n_buckets).cast("int"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    raw = doc_b.groupBy("bucket").agg(F.sum("k").cast("long").alias("c_r"))
    tgt = (
        doc_b.where(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.sum("k").cast("long").alias("c_t"))
    )
    # model table: <= n_buckets rows; buckets unseen in the target get c_t=0
    model = raw.join(tgt, "bucket", "left").select(
        "bucket",
        "c_r",
        F.coalesce("c_t", F.lit(0)).cast("long").alias("c_t"),
    )
    totals = model.agg(
        F.sum("c_r").cast("long").alias("r_tot"),
        F.sum("c_t").cast("long").alias("t_tot"),
    )
    lam = F.log(
        (F.col("c_t") + F.lit(1)).cast("double")
        / (F.col("c_r") + F.lit(1)).cast("double")
    )
    scored = doc_b.join(F.broadcast(model.withColumn("lam", lam)), "bucket")
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.sum("k").cast("long").alias("n_feat"),
        F.sum(F.col("k").cast("double") * F.col("lam")).alias("_klam"),
    )
    shift = F.log(
        (F.col("r_tot") + F.lit(n_buckets)).cast("double")
        / (F.col("t_tot") + F.lit(n_buckets)).cast("double")
    )
    out = per_doc.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        "lang",
        "n_feat",
        (
            F.round(F.col("_klam") + F.col("n_feat").cast("double") * shift, 6)
            + F.lit(0.0)
        ).alias("logw"),
    )
    return out.withColumn("selected", F.col("logw") > F.lit(0.0))
