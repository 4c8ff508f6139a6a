"""Corpus BLEU-2 under deterministic word dropout vs a pure-python model."""

from __future__ import annotations

import hashlib
import math
from collections import Counter


def _md5_i64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _keep(doc_id: str, seq_no: int, i: int) -> bool:
    return _md5_i64(f"drop|{doc_id}|{seq_no}|{i}") % 100 >= 15


def _clipped(cand, ref):
    cc, rc = Counter(cand), Counter(ref)
    return sum(min(n, rc[g]) for g, n in cc.items())


def _bigrams(xs):
    return [f"{a}_{b}" for a, b in zip(xs, xs[1:])]


def test_bleu_dropout_matches_python_model(spark):
    from uncharted_ta1_spark.operators.bleu import bleu_dropout_eval

    rows = [
        (f"d{k}", s, "src%d" % (k % 2), list(range(128, 128 + 8 + 3 * k)))
        for k in range(8)
        for s in range(2)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "seq_no", "source", "tokens"])
    out = bleu_dropout_eval(df).toPandas().set_index("source")

    regs = {}
    for doc_id, seq_no, src, ref in rows:
        cand = [t for i, t in enumerate(ref) if _keep(doc_id, seq_no, i)]
        r = regs.setdefault(src, Counter())
        r["n_seq"] += 1
        r["m1"] += _clipped(cand, ref)
        r["t1"] += len(cand)
        r["m2"] += _clipped(_bigrams(cand), _bigrams(ref))
        r["t2"] += max(len(cand) - 1, 0)
        r["len_ref"] += len(ref)
        r["len_cand"] += len(cand)

    for src, r in regs.items():
        got = out.loc[src]
        for k in ("n_seq", "m1", "t1", "m2", "t2", "len_ref", "len_cand"):
            assert got[k] == r[k], (src, k, got[k], r[k])
        p1, p2 = r["m1"] / r["t1"], r["m2"] / r["t2"]
        bp = 1.0 if r["len_cand"] >= r["len_ref"] else math.exp(
            1.0 - r["len_ref"] / r["len_cand"]
        )
        exp_bleu = bp * math.exp(0.5 * math.log(p1) + 0.5 * math.log(p2))
        assert abs(got.bleu2 - exp_bleu) < 1e-6
        # dropout shortens the candidate, so BP < 1 and BLEU < precision GM
        assert r["len_cand"] < r["len_ref"] and got.bleu2 < math.sqrt(p1 * p2)


def test_bleu_dropout_degenerate_register_null(spark):
    """A source whose every candidate is empty (or has no bigrams) yields
    NULL bleu2, never a log-domain error."""
    from uncharted_ta1_spark.operators.bleu import bleu_dropout_eval

    # single-token sequences: candidates have no bigrams -> t2 = 0
    doc = next(f"z{k}" for k in range(300) if not _keep(f"z{k}", 0, 0))
    df = spark.createDataFrame(
        [(doc, 0, "solo", [200])], ["doc_id", "seq_no", "source", "tokens"]
    )
    r = bleu_dropout_eval(df).toPandas().iloc[0]
    assert r.t1 == 0 and r.t2 == 0
    assert r.bleu2 is None or r.bleu2 != r.bleu2
