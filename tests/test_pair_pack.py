"""Rank pair-packing vs a pure-python model."""

from __future__ import annotations


def _python_pairs(rows, cap=16):
    by_src = {}
    for src, doc, seq, w in rows:
        by_src.setdefault(src, []).append((w, doc, seq))
    packs = {}
    for src, items in by_src.items():
        items.sort(key=lambda t: (-t[0], t[1], t[2]))
        n = len(items)
        for idx, (w, doc, seq) in enumerate(items, 1):
            pid = min(idx, n + 1 - idx)
            st = packs.setdefault((src, pid), [0, 0, 0])
            st[0] += 1
            st[1] += w
            st[2] = max(st[2], w)
    out = {}
    for key, (m, s, mx) in packs.items():
        fits = m == 2 and s <= cap
        out[key] = (
            m,
            s,
            mx,
            mx > cap,
            1 if fits else m,
            cap - s if fits else m * cap - s,
        )
    return out


def test_pair_pack_matches_python(spark):
    from uncharted_ta1_spark.operators.packing import pair_pack, pair_pack_summary

    rows = [
        # src a: lengths 10,9,5,4,3 -> pairs (10,3)=13 fits, (9,4)=13 fits,
        # singleton 5
        ("a", "d1", 0, 10),
        ("a", "d1", 1, 9),
        ("a", "d2", 0, 5),
        ("a", "d2", 1, 4),
        ("a", "d3", 0, 3),
        # src b: (15, 14) = 29 > 16 -> two singleton packs
        ("b", "d1", 0, 15),
        ("b", "d2", 0, 14),
        # src c: one oversize sequence
        ("c", "d1", 0, 20),
        # tie on length: tiebreak by doc then seq
        ("d", "d2", 0, 8),
        ("d", "d1", 0, 8),
        ("d", "d1", 1, 8),
    ]
    seq = spark.createDataFrame(
        rows, "source string, doc_id string, seq_no int, n_tok int"
    )
    packed = pair_pack(seq, cap=16)
    got = {
        (r.source, r.pair_id): (
            r.n_members,
            r.tok_sum,
            r.max_w,
            bool(r.oversize),
            r.n_packs,
            r.padding_toks,
        )
        for r in packed.collect()
    }
    exp = _python_pairs(rows, cap=16)
    assert got == exp
    # summary invariants
    summ = {r.source: r for r in pair_pack_summary(packed, cap=16).collect()}
    assert summ["a"].n_packs == 3 and summ["a"].padding_toks == 3 * 16 - 31
    assert summ["b"].n_packs == 2 and summ["b"].padding_toks == 32 - 29
    assert summ["c"].n_oversize == 1
    assert summ["d"].n_packs == 2  # pair (8,8)=16 fits + singleton 8
    for r in summ.values():
        if not r.n_oversize:
            assert 0 < r.pack_efficiency <= 1
            assert r.padding_toks == r.n_packs * 16 - r.n_toks
