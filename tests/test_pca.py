"""PCA over embeddings: exact Gram statistics + driver-side eigen finish.

The Gram is value-hashed on the oracle gate (embedding_covariance); these
tests cover the eigen/projection half that has no SQL twin: covariance
reconstruction from the exact sums, variance ordering of the projected
coordinates, sign-fix determinism, and agreement with a plain single-node
numpy PCA.
"""

from __future__ import annotations

import numpy as np
import pytest

from uncharted_ta1_spark.operators.pca import (
    embedding_gram,
    pca_components,
    pca_project,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype="float64")


def test_gram_matches_numpy_exactly(spark, emb, emb_np):
    q = np.floor(emb_np * 1e6).astype("int64")
    got = {(r.j, r.k): int(r.v) for r in embedding_gram(emb).collect()}
    assert got[(-1, -1)] == len(q)
    for j in (0, 7, 63):
        assert got[(j, -1)] == int(q[:, j].sum())
    g = q.T @ q
    for j, k in ((0, 0), (0, 63), (12, 40), (63, 63)):
        assert got[(j, k)] == int(g[j, k])


def test_components_match_numpy_pca(spark, emb, emb_np):
    rows = [r.asDict() for r in embedding_gram(emb).collect()]
    comps, evals = pca_components(rows, n_components=4)
    # reference: plain numpy PCA over the quantized matrix
    q = np.floor(emb_np * 1e6) / 1e6
    c = q - q.mean(axis=0)
    cov = (c.T @ c) / len(q)
    ref_evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    assert np.allclose(evals, ref_evals, rtol=1e-9, atol=1e-12)
    # components are unit-norm eigenvectors of that covariance
    for i in range(4):
        v = comps[i]
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        assert np.allclose(cov @ v, evals[i] * v, atol=1e-9)
        # sign fix: the largest-|coordinate| entry is positive
        assert v[int(np.argmax(np.abs(v)))] > 0


def test_projection_variance_ordering_and_determinism(spark, emb):
    out1 = pca_project(emb, n_components=4).orderBy("vec_id").collect()
    out2 = pca_project(emb, n_components=4).orderBy("vec_id").collect()
    assert out1 == out2  # run-stable (sign fix + exact Gram)
    m = np.array([[r.pc1, r.pc2, r.pc3, r.pc4] for r in out1])
    var = m.var(axis=0)
    assert var[0] >= var[1] >= var[2] >= var[3] > 0
