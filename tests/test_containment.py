"""Asymmetric containment pairs: the sub-document case Jaccard misses."""

from __future__ import annotations


def _mk_docs(spark):
    # short = 12 words; long = short pasted inside ~90 words of filler.
    short = " ".join(f"w{i}" for i in range(12))
    filler_a = " ".join(f"fa{i}" for i in range(45))
    filler_b = " ".join(f"fb{i}" for i in range(45))
    long_doc = f"{filler_a} {short} {filler_b}"
    other = " ".join(f"z{i}" for i in range(40))
    return spark.createDataFrame(
        [("short", short), ("long", long_doc), ("other", other)],
        ["doc_id", "text"],
    )


def test_containment_catches_subdocument_jaccard_misses(spark):
    from uncharted_ta1_spark.operators.dedup import (
        containment_pairs,
        doc_shingles,
        jaccard_pairs,
    )

    sh = doc_shingles(_mk_docs(spark), n=3)
    cont = containment_pairs(sh, min_containment=0.8).toPandas()
    jacc = jaccard_pairs(sh, min_jaccard=0.5).toPandas()

    assert len(jacc) == 0  # the union is filler-dominated: Jaccard blind
    assert len(cont) == 1
    r = cont.iloc[0]
    assert {r.doc1, r.doc2} == {"long", "short"}
    # all 10 of the short doc's shingles appear in the long doc
    assert r.containment == 1.0 and r.n_common == 10
    assert r.jaccard < 0.12


def test_containment_exact_math(spark):
    """Hand-counted shingle sets: C = |A∩B| / min(|A|,|B|)."""
    from uncharted_ta1_spark.operators.dedup import containment_pairs, doc_shingles

    # A: a b c d e -> 3 shingles; B: a b c d x -> 3 shingles; common: 2
    docs = spark.createDataFrame(
        [("A", "a b c d e"), ("B", "a b c d x")], ["doc_id", "text"]
    )
    out = containment_pairs(
        doc_shingles(docs, n=3), min_containment=0.5
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.n_common, r.n1, r.n2) == (2, 3, 3)
    assert r.containment == round(2 / 3, 9)
    assert r.jaccard == 0.5
