"""In-engine multinomial Naive Bayes text classifier — trained, applied
and evaluated entirely as relational algebra (public method: the
add-1-smoothed multinomial NB of every IR textbook, Manning et al. IIR
ch. 13).  The engine's "train a model without leaving the warehouse"
demonstration: fit on the TRAIN split, score the held-out TEST split,
emit the confusion matrix — the split discipline (one shared hash
split) makes the evaluation leak-free by construction.

Reference analog: the reference trains/serves per-class extractors and
scores them against held-out ground truth in its eval harness
(``eval/18month_eval/points_extraction_calc_metrics.py``); NB is that
fit/score loop as two groupBys and a join.

Math:  score(doc, k) = ln P(k) + sum_w k_w * ln((c_kw + 1)/(c_k + V))
     = ln(n_k / n_train) + sum_{w in doc, c_kw>0} k_w * ln(c_kw + 1)
       - len(doc) * ln(c_k + V)
(the absent-word term ln(0+1) = 0 vanishes, so an INNER join on the
word suffices — no dense doc x vocab fan-out).

Scale design (100 TB): training is two combinable groupBys on
vocabulary-sized keys; scoring joins doc words against the (lang, word)
model on the word key (vocabulary-keyed equi join) and reduces per
(doc, lang); the argmax ranks 5 rows per doc.  Scores are rounded at
6 dp before the argmax (absorbing the order-dependent float-sum ulp)
with a lexicographic language tie-break — deterministic cross-engine.
Output is pure integer counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.functions.portable import words_col


def nb_confusion(
    docs: DataFrame,
    *,
    split_col: Column,
    label: str = "lang",
) -> DataFrame:
    """Confusion matrix (true_label, pred_label, n_docs) of add-1 NB
    trained on split='train' rows and evaluated on split='test' rows."""
    d = docs.select(
        "doc_id",
        F.col(label).alias("y"),
        split_col.alias("_split"),
        F.explode(words_col(F.col("text"))).alias("word"),
    )
    train = d.where(F.col("_split") == "train")
    test = d.where(F.col("_split") == "test")

    ckw = train.groupBy("y", "word").agg(
        F.count(F.lit(1)).cast("long").alias("ckw")
    )
    ck = ckw.groupBy("y").agg(F.sum("ckw").cast("long").alias("ck"))
    v = ckw.select("word").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    nd = (
        train.select("doc_id", "y")
        .distinct()
        .groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_k"))
    )
    n_train = nd.agg(F.sum("n_docs_k").cast("long").alias("n_train"))
    model = (
        ck.join(nd, "y")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(n_train))
    )

    doc_w = test.groupBy("doc_id", "y", "word").agg(
        F.count(F.lit(1)).cast("long").alias("kw")
    )
    doc_len = doc_w.groupBy("doc_id").agg(
        F.sum("kw").cast("long").alias("len")
    )
    # matched-word evidence per (doc, candidate lang)
    ev = (
        doc_w.join(
            ckw.select(F.col("y").alias("k"), "word", "ckw"), "word"
        )
        .groupBy("doc_id", "k")
        .agg(
            F.sum(
                F.col("kw").cast("double")
                * F.log((F.col("ckw") + F.lit(1)).cast("double"))
            ).alias("_ev")
        )
    )
    # assemble score for EVERY (test doc, lang) — langs with zero matched
    # words still score via the length/prior terms (left join, 0 evidence)
    cand = doc_len.crossJoin(
        F.broadcast(model.select(F.col("y").alias("k"), "ck", "n_docs_k", "v", "n_train"))
    )
    scored = cand.join(ev, ["doc_id", "k"], "left").select(
        "doc_id",
        "k",
        F.round(
            F.coalesce(F.col("_ev"), F.lit(0.0))
            - F.col("len").cast("double")
            * F.log((F.col("ck") + F.col("v")).cast("double"))
            + F.log(
                F.col("n_docs_k").cast("double")
                / F.col("n_train").cast("double")
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("k").asc()
    )
    pred = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", F.col("k").alias("pred_label"))
    )
    truth = test.select("doc_id", "y").distinct()
    return (
        truth.join(pred, "doc_id")
        .groupBy(F.col("y").alias("true_label"), "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
