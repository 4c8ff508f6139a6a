"""Hand-computed span corruption (T5 denoising pairs) + temperature mixing."""

from __future__ import annotations

import hashlib
import math


def _md5_i64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _flag(doc_id: str, seq_no: int, i: int, rate: int = 15, salt: str = "t5") -> bool:
    return _md5_i64(f"{salt}|{doc_id}|{seq_no}|{i}") % 100 < rate


def _expected_pair(doc_id, seq_no, tokens, base=100):
    """Pure-python reimplementation of the T5 span rule for cross-checking."""
    flags = [_flag(doc_id, seq_no, i) for i in range(len(tokens))]
    corrupted, target, span = [], [], 0
    for i, t in enumerate(tokens):
        if not flags[i]:
            corrupted.append(t)
        elif i == 0 or not flags[i - 1]:
            span += 1
            corrupted.append(-(base + span))
            target += [-(base + span), t]
        else:
            target.append(t)
    target.append(-(base + span + 1))
    n_masked = sum(flags)
    return corrupted, target, span, n_masked


def test_span_corruption_matches_python_model(spark):
    from uncharted_ta1_spark.operators.packing import span_corruption

    rows = [
        ("d%d" % d, s, list(range(128 + 10 * d, 128 + 10 * d + 40)))
        for d in range(6)
        for s in range(3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "seq_no", "tokens"])
    out = span_corruption(df).toPandas().set_index(["doc_id", "seq_no"])
    assert len(out) == len(rows)
    saw_multi_token_span = False
    for doc_id, seq_no, tokens in rows:
        exp_c, exp_t, exp_spans, exp_masked = _expected_pair(doc_id, seq_no, tokens)
        r = out.loc[(doc_id, seq_no)]
        assert list(r.corrupted_tokens) == exp_c, (doc_id, seq_no)
        assert list(r.target_tokens) == exp_t, (doc_id, seq_no)
        assert r.n_spans == exp_spans and r.n_masked == exp_masked
        # structural invariants of the denoising pair
        assert len(r.corrupted_tokens) + len(r.target_tokens) == (
            len(tokens) + 2 * exp_spans + 1
        )
        if exp_masked > exp_spans:
            saw_multi_token_span = True
    # the fixture is big enough that consecutive masks occur somewhere
    assert saw_multi_token_span


def test_span_corruption_no_masks_edge(spark):
    """A sequence whose every position hashes unmasked yields input=original,
    target=[closing sentinel], 0 spans."""
    from uncharted_ta1_spark.operators.packing import span_corruption

    # find a (doc, seq) with 8 consecutive unmasked positions
    doc, seq = next(
        (f"e{k}", 0)
        for k in range(500)
        if not any(_flag(f"e{k}", 0, i) for i in range(8))
    )
    df = spark.createDataFrame([(doc, seq, list(range(200, 208)))],
                               ["doc_id", "seq_no", "tokens"])
    r = span_corruption(df).toPandas().iloc[0]
    assert list(r.corrupted_tokens) == list(range(200, 208))
    assert list(r.target_tokens) == [-101]
    assert r.n_spans == 0 and r.n_masked == 0


def test_temperature_mix_exact_math(spark):
    from uncharted_ta1_spark.operators.mixing import temperature_mix

    rows = (
        [("s_big", 100) for _ in range(50)]
        + [("s_mid", 40) for _ in range(10)]
        + [("s_tail", 10) for _ in range(2)]
    )
    df = spark.createDataFrame(rows, ["source", "n_tok"])
    out = temperature_mix(df).toPandas().set_index("source")

    mass = {"s_big": 5000, "s_mid": 400, "s_tail": 20}
    w = {s: math.floor(math.exp(0.3 * math.log(m)) * 1e6) for s, m in mass.items()}
    tw, tm = sum(w.values()), sum(mass.values())
    for s in mass:
        r = out.loc[s]
        assert r.token_mass == mass[s]
        assert r.expected_draws == (1_000_000 * w[s]) // tw
        assert abs(r.mix_weight - w[s] / tw) < 1e-9
        assert abs(r.raw_share - mass[s] / tm) < 1e-9
    # temperature flattens: tail's mix share strictly exceeds its raw share,
    # head's is strictly below
    assert out.loc["s_tail"].mix_weight > out.loc["s_tail"].raw_share
    assert out.loc["s_big"].mix_weight < out.loc["s_big"].raw_share
    # quotas never exceed the budget
    assert out.expected_draws.sum() <= 1_000_000


def test_quota_allocation_exact_budget(spark):
    from uncharted_ta1_spark.operators.mixing import quota_allocation

    rows = [("s%d" % k, 1) for k in range(7) for _ in range(k + 3)]
    df = spark.createDataFrame(rows, ["source", "n_tok"])
    out = quota_allocation(df, budget=100).toPandas()
    # Hamilton invariants: quotas sum EXACTLY to the budget, each quota is
    # floor or floor+1, and the +1s go to the largest remainders
    assert out.quota.sum() == 100
    assert ((out.quota - out.floor_quota).isin((0, 1))).all()
    bumped = out[out.quota == out.floor_quota + 1]
    if len(bumped) and len(bumped) < len(out):
        assert bumped.remainder.min() >= out[out.quota == out.floor_quota].remainder.max()
    # proportionality: W=42 (sum of masses 3..9) -> floor(100*m/42)
    for r in out.itertuples():
        m = int(r.source[1:]) + 3
        assert r.floor_quota == (100 * m) // 42 and r.remainder == (100 * m) % 42
