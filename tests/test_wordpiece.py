"""Greedy WordPiece segmentation vs a pure-python maximal-munch model."""

from __future__ import annotations

from collections import Counter


def _python_wordpiece(texts, max_piece=4, min_df=3):
    words_stream = [w for t in texts for w in t.split() if w]
    occ = Counter(words_stream)
    words = sorted(occ)
    df = Counter()
    for w in words:
        subs = {
            w[p : p + k]
            for p in range(len(w))
            for k in range(1, max_piece + 1)
            if p + k <= len(w)
        }
        for s in subs:
            df[s] += 1
    vocab = {s for s in df if len(s) == 1 or df[s] >= min_df}
    out = {}
    for w in words:
        pos, pieces = 0, []
        while pos < len(w):
            k = max(
                kk
                for kk in range(1, max_piece + 1)
                if pos + kk <= len(w) and w[pos : pos + kk] in vocab
            )
            pieces.append(w[pos : pos + k])
            pos += k
        out[w] = (occ[w], pieces)
    return out


def test_wordpiece_matches_python_model(spark):
    from uncharted_ta1_spark.operators.wordpiece import wordpiece_encode

    texts = [
        "windy window winter wind",
        "winter wind window sing ring",
        "winding sing song ring rings",
        "a ab abc window",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = wordpiece_encode(docs).toPandas().set_index("word")
    exp = _python_wordpiece(texts)
    assert set(got.index) == set(exp)
    for w, (n_occ, pieces) in exp.items():
        r = got.loc[w]
        assert r.n_occurrences == n_occ, w
        assert r.pieces_csv == " ".join(pieces), (w, r.pieces_csv, pieces)
        assert r.n_pieces == len(pieces) and r.n_chars == len(w)
        assert r.fertility == round(len(pieces) / len(w), 9)
    # the fixture must actually exercise a multi-char piece (df('win')>=3)
    assert any(len(p) > 1 for _, ps in exp.values() for p in ps)


def test_wordpiece_segmentation_is_exact_cover(spark):
    """Concatenating the pieces reproduces every word exactly (greedy
    cover property — no gaps, no overlaps) on the real corpus tier."""
    from uncharted_ta1_spark.operators.wordpiece import wordpiece_encode

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = wordpiece_encode(docs).toPandas()
    assert len(out) > 0
    for r in out.itertuples():
        assert r.pieces_csv.replace(" ", "") == r.word
