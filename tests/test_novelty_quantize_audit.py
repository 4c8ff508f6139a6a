"""Round-6 additions: shingle novelty point-in-time semantics, int8
quantization invariants, and the Benford digit audit."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.audit import (
    benford_digit_audit,
    benford_expected,
)
from uncharted_ta1_spark.operators.novelty import shingle_novelty
from uncharted_ta1_spark.operators.quantize import quantize_embeddings


def _seq(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                doc_id=d,
                source=s,
                seq_no=n,
                event_epoch=e,
                tokens=t,
                n_tok=len(t),
            )
            for d, s, n, e, t in rows
        ]
    )


def test_novelty_first_owner_wins(spark):
    # B repeats A's only shingle one epoch later: A fully novel, B zero.
    seq = _seq(
        spark,
        [
            ("doc_a", "src0", 0, 100, [1, 2, 3]),
            ("doc_b", "src0", 0, 200, [1, 2, 3]),
        ],
    )
    out = {r.doc_id: r for r in shingle_novelty(seq, n=3).collect()}
    assert (out["doc_a"].n_novel, out["doc_a"].n_shingles) == (1, 1)
    assert (out["doc_b"].n_novel, out["doc_b"].n_shingles) == (0, 1)
    assert out["doc_b"].novelty == 0.0
    assert out["doc_a"].novelty == 1.0


def test_novelty_epoch_tie_breaks_by_doc_then_source(spark):
    # identical epochs: lexicographically smaller (doc_id, source) owns
    seq = _seq(
        spark,
        [
            ("doc_b", "src0", 0, 100, [7, 8, 9]),
            ("doc_a", "src0", 0, 100, [7, 8, 9]),
            ("doc_a", "alt_0", 0, 100, [7, 8, 9]),
        ],
    )
    out = {
        (r.doc_id, r.source): r.n_novel
        for r in shingle_novelty(seq, n=3).collect()
    }
    assert out[("doc_a", "alt_0")] == 1  # 'alt_0' < 'src0'
    assert out[("doc_a", "src0")] == 0
    assert out[("doc_b", "src0")] == 0


def test_novelty_within_sequence_duplicates_count_once(spark):
    # the trigram (5,5,5) appears twice inside one sequence
    seq = _seq(spark, [("doc_a", "src0", 0, 100, [5, 5, 5, 5])])
    [r] = shingle_novelty(seq, n=3).collect()
    assert (r.n_shingles, r.n_novel, r.novelty) == (1, 1, 1.0)


def test_novelty_short_sequences_dropped(spark):
    seq = _seq(spark, [("doc_a", "src0", 0, 100, [1, 2])])
    assert shingle_novelty(seq, n=3).count() == 0


def _emb(spark, vecs):
    return spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(x) for x in v], label=0)
            for i, v in enumerate(vecs)
        ]
    )


def test_quantize_codes_span_range(spark):
    emb = _emb(spark, [[0.0, 10.0], [1.0, 20.0], [0.5, 15.0]])
    out = {r.vec_id: r for r in quantize_embeddings(_reorder(emb)).collect()}
    # min maps to 0, max saturates at 255
    assert out[0].codes_csv.split(",")[0] == "0"
    assert out[1].codes_csv.split(",")[0] == "255"
    assert out[1].n_saturated == 2  # max on both dims
    # midpoint reconstruction error bounded by half a quantization step
    span0, span1 = 1.0, 10.0
    for r in out.values():
        assert r.max_err <= max(span0, span1) / 256.0 / 2.0 + 1e-12


def _reorder(emb):
    return emb.select("vec_id", "embedding", "label")


def test_quantize_constant_dimension_is_zero_code(spark):
    emb = _emb(spark, [[3.0, 1.0], [3.0, 2.0]])
    out = quantize_embeddings(_reorder(emb)).collect()
    assert all(r.codes_csv.split(",")[0] == "0" for r in out)


def test_quantize_roundtrip_monotone(spark):
    # codes are monotone in the input value along each dimension
    emb = _emb(spark, [[float(i), 0.0] for i in range(10)])
    out = sorted(
        quantize_embeddings(_reorder(emb)).collect(), key=lambda r: r.vec_id
    )
    codes = [int(r.codes_csv.split(",")[0]) for r in out]
    assert codes == sorted(codes) and codes[0] == 0 and codes[-1] == 255


def test_benford_on_benford_distributed_sample(spark):
    # synthesize amounts whose first digits FOLLOW Benford: chi2 terms tiny
    rows, n = [], 10_000
    acc = 0
    for d in range(1, 10):
        cnt = round(benford_expected(d) * n)
        rows += [float(d) * 100.0 + 0.37] * cnt
        acc += cnt
    df = spark.createDataFrame([Row(amt=a) for a in rows])
    out = benford_digit_audit(df, amount_col="amt").collect()
    assert {r.digit for r in out} == set(range(1, 10))
    assert sum(r.n_obs for r in out) == acc
    assert all(r.chisq_term < 1.0 for r in out)
    assert all(
        abs(r.p_benford - benford_expected(r.digit)) < 1e-9 for r in out
    )


def test_benford_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [Row(amt=-5.0), Row(amt=0.0), Row(amt=123.0)]
    )
    out = benford_digit_audit(df, amount_col="amt").collect()
    assert len(out) == 1 and out[0].digit == 1 and out[0].n_obs == 1
    assert out[0].p_obs == 1.0


def test_benford_skewed_sample_flags_large_chisq(spark):
    # all amounts start with digit 9 — the anti-Benford signature
    df = spark.createDataFrame([Row(amt=9000.0 + i) for i in range(100)])
    [r] = benford_digit_audit(df, amount_col="amt").collect()
    assert r.digit == 9 and r.chisq_term > 100.0
    assert r.p_obs == 1.0 and abs(r.p_benford - math.log10(10 / 9)) < 1e-9
