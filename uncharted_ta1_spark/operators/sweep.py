"""Template-sweep argmax kernel (W8): rotate -> xcorr -> argmax, batched.

Reference analog: ``tasks/point_extraction/point_orientation_extractor.py:
100-330`` — for every extracted point symbol, sweep N template rotations
(``range(0, rotate_max, rotate_interval)``), compute the normalized
cross-correlation of the rotated template against the point's image patch
(``point_extractor_utils.py:226-268`` ``template_matching``, TM_CCOEFF_NORMED
= Pearson correlation), and keep the argmax angle + score.  It is the
reference's single heaviest compute stage.

Spark-first recast (sandbox has no cv2, and the POINT of the operator is the
sweep-argmax dataflow, not JPEG decoding):

- the "patch" is a deterministic length-``P`` integer signal cyclically
  gathered from the row's ``tokens`` array (every row has n_tok >= 1, so the
  gather is total);
- "rotation by angle j" is a cyclic shift of a fixed integer template — the
  exact discrete analog of rotating a template image;
- the score is Pearson correlation computed from EXACT int64 sufficient
  statistics (sx, sxx per patch; sxy per shift via one int64 matmul), pushed
  through the same fixed IEEE tree the DuckDB oracle uses, so scores — and
  therefore the argmax and its tie-breaks (smallest shift wins) — are
  bit-identical across engines.

Scale design: the kernel is per-row, so it runs as ``mapInPandas`` — ZERO
shuffles, no group-key Exchange at all (cheaper than the applyInPandas
pattern of groupfit.py).  Per Arrow batch the whole sweep is ONE
``(rows x P) @ (P x N_SHIFTS)`` integer matmul + vectorized argmax: per-row
Python never runs, matching SURVEY §2.11's zero-per-row-Python rule.  At
100 TB this is embarrassingly parallel and scales linearly with input splits.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

P = 8  # patch length (positions 0..7)
N_SHIFTS = 8  # sweep size ("rotation" count)

SWEEP_SCHEMA = (
    "doc_id string, source string, seq_no int, n_tok int, "
    "best_shift int, best_score double"
)


def template_base(k: int) -> int:
    """Deterministic integer template value at position k (shared with the
    oracle's SQL formula)."""
    return (k * 37 + 11) % 100


def sweep_argmax(seq: DataFrame) -> DataFrame:
    """Per sequence row: the best cyclic-shift alignment of the fixed
    template against the row's token patch, by Pearson cross-correlation.

    Rows whose patch has zero variance (all gathered tokens equal) have no
    defined correlation: best_shift/best_score are NULL (the reference
    equivalently skips degenerate thumbnails).
    """
    import numpy as np
    import pandas as pd

    # shift j, position k -> base[(k + j) % P]; matmul operand (P x N_SHIFTS)
    base = np.array([template_base(k) for k in range(P)], dtype="int64")
    shifts = np.stack(
        [np.roll(base, -j) for j in range(N_SHIFTS)]
    )  # t[j, k] = base[(k + j) % P]
    t_mat = shifts.T.copy()  # (P, N_SHIFTS)
    sy = int(base.sum())  # cyclic shifts preserve sum: shift-invariant
    syy = int((base * base).sum())
    dt = P * syy - sy * sy
    assert dt > 0, "template must have nonzero variance"
    sqrt_dt = np.sqrt(np.float64(dt))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n = pdf["n_tok"].to_numpy("int64")
            # ragged cyclic gather, fully vectorized: concat + offset index
            flat = np.concatenate(
                [np.asarray(t, dtype="int64") for t in pdf["tokens"]]
            )
            offs = np.concatenate(([0], np.cumsum(n)[:-1]))
            idx = np.arange(P, dtype="int64")[None, :] % n[:, None]
            patch = flat[offs[:, None] + idx]  # (rows, P) int64

            sx = patch.sum(axis=1)
            sxx = (patch * patch).sum(axis=1)
            dp = P * sxx - sx * sx
            sxy = patch @ t_mat  # (rows, N_SHIFTS) exact int64
            num = P * sxy - sx[:, None] * sy
            with np.errstate(divide="ignore", invalid="ignore"):
                corr = num.astype("float64") / (
                    np.sqrt(dp.astype("float64"))[:, None] * sqrt_dt
                )
            ok = dp > 0
            # argmax returns the FIRST maximum -> smallest shift wins ties,
            # matching the oracle's ORDER BY corr DESC, shift ASC
            best = corr.argmax(axis=1)
            out = pdf[["doc_id", "source", "seq_no", "n_tok"]].copy()
            shift = pd.array(np.where(ok, best, 0), dtype="Int32")
            shift[~ok] = pd.NA
            out["best_shift"] = shift
            out["best_score"] = np.where(ok, corr[np.arange(len(pdf)), best], np.nan)
            yield out

    return seq.select("doc_id", "source", "seq_no", "event_epoch", "n_tok", "tokens") \
        .mapInPandas(kernel, SWEEP_SCHEMA)
