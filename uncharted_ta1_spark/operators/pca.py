"""Distributed PCA over an embedding column.

The 100-TB shape: the corpus-sized work is ONE narrow pass that reduces to
a constant-size Gram matrix — per Arrow batch, numpy computes the exact
int64 partial Gram of micro-quantized components (vectorized, no per-row
Python), emitting dim x dim partial rows; a single combinable groupBy sums
them into DECIMAL(38,0) (overflow-safe at any corpus size).  The
eigendecomposition then runs on the DRIVER over the dim x dim matrix — a
bounded contract surface (4,161 rows at dim=64), the same driver-finish
pattern as the contracted dedup cluster graph (components.py).  The
projection back over the corpus is a broadcast of dim x k floats into pure
column math — zero shuffle.

Determinism: the Gram sums are exact integers (bit-identical on any engine
— the DuckDB oracle reproduces them from the same micro quantization);
eigenvectors are sign-fixed (the largest-|coordinate| entry is made
positive, first index on ties) so the projection is run-stable.  The eigen
step itself is numpy LAPACK float math — verified by property tests
(variance ordering, covariance reconstruction), not value-hashed.

Reference analog: the reference ships raw model embeddings straight to its
stores (``pipelines/metadata_extraction`` embedding use); PCA is the
standard corpus-level compaction/analysis step such a store grows, and the
fit-on-aggregates-then-broadcast shape mirrors the reference's
fit-then-project georeferencing loop (georeference.py:130-144) at the
corpus grain.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_SCHEMA = "j int, k int, v long"


def embedding_gram(
    emb: DataFrame,
    *,
    col: str = "embedding",
    in_dim: int = 64,
    scale: float = 1e6,
) -> DataFrame:
    """Exact sufficient statistics for covariance/PCA: micro-quantized
    component cross products.

    Returns (j, k, v) DECIMAL(38,0) rows:
      * j >= 0, k >= 0 — sum over rows of q_j * q_k (full square matrix);
      * j >= 0, k = -1 — sum of q_j (the component sums);
      * j = -1, k = -1 — the row count.

    Per-batch partials are int64 (safe: |q| <= scale * max|e|, a batch is
    <= ~10^4 rows); the global sum is DECIMAL(38,0) so no corpus size can
    overflow it.
    """
    import pandas as pd

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            m = np.floor(
                np.stack(pdf[col].to_numpy()).astype("float64") * scale
            ).astype("int64")
            g = m.T @ m
            s = m.sum(axis=0, dtype="int64")
            jj, kk = np.meshgrid(
                np.arange(in_dim, dtype="int32"),
                np.arange(in_dim, dtype="int32"),
                indexing="ij",
            )
            out = pd.DataFrame(
                {
                    "j": np.concatenate(
                        [jj.ravel(), np.arange(in_dim, dtype="int32"),
                         np.array([-1], dtype="int32")]
                    ),
                    "k": np.concatenate(
                        [kk.ravel(),
                         np.full(in_dim, -1, dtype="int32"),
                         np.array([-1], dtype="int32")]
                    ),
                    "v": np.concatenate(
                        [g.ravel(), s,
                         np.array([len(pdf)], dtype="int64")]
                    ),
                }
            )
            yield out

    partials = emb.select(col).mapInPandas(gram, GRAM_SCHEMA)
    return partials.groupBy("j", "k").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("v")
    )


def pca_components(
    gram_rows: list,
    *,
    in_dim: int = 64,
    n_components: int = 4,
    scale: float = 1e6,
):
    """Driver-side finish: covariance from the exact integer sums, then a
    sign-fixed eigendecomposition.  Returns (components [k x dim], evals)."""
    import numpy as np

    g = np.zeros((in_dim, in_dim))
    s = np.zeros(in_dim)
    n = 0.0
    for r in gram_rows:
        j, k, v = int(r["j"]), int(r["k"]), float(r["v"])
        if j == -1:
            n = v
        elif k == -1:
            s[j] = v
        else:
            g[j, k] = v
    cov = (g - np.outer(s, s) / n) / n / (scale * scale)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        amax = int(np.argmax(np.abs(comps[i])))
        if comps[i, amax] < 0:
            comps[i] = -comps[i]
    return comps, evals[order]


def pca_project(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    col: str = "embedding",
    in_dim: int = 64,
    n_components: int = 4,
) -> DataFrame:
    """Fit PCA on the corpus (exact distributed Gram -> driver eigen) and
    project every vector onto the top components — broadcast column math,
    zero shuffle on the projection pass."""
    rows = embedding_gram(emb, col=col, in_dim=in_dim).collect()
    comps, _ = pca_components(
        rows, in_dim=in_dim, n_components=n_components
    )
    # One double array + one aggregate() fold per component (same plan-size
    # fix as similarity.random_project: the expanded form was a 64-node
    # nested-Add tree per component, mostly Catalyst/codegen compile cost).
    # The fold adds the same doubles in the same j-ascending order with a
    # 0.0 initial term (0.0 + x == x exactly for every double except that
    # -0.0 collapses to 0.0 — and the final `+ 0.0` already collapses
    # signed zero), so outputs are bit-identical.
    e = F.col(col)
    evals = emb.select(
        id_col,
        F.array(
            *[F.element_at(e, j + 1).cast("double") for j in range(in_dim)]
        ).alias("_e"),
    )
    outs = []
    for i in range(n_components):
        weights = F.array(
            *[F.lit(float(comps[i, j])) for j in range(in_dim)]
        )
        acc = F.aggregate(
            F.zip_with(F.col("_e"), weights, lambda x, wgt: x * wgt),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        outs.append((F.round(acc, 6) + F.lit(0.0)).alias(f"pc{i + 1}"))
    return evals.select(id_col, *outs)
