"""Per-dimension affine int8 quantization of embedding vectors — the
feature-store compression step that turns a float32 ANN corpus into
byte codes (4x smaller, SIMD-scannable).

Reference analog: the reference quantizes float rasters to uint8 before
storage and model hand-off (``tasks/segmentation/segmenter_utils.py:110``
``np.zeros((h, w), dtype=np.uint8)`` mask materialization;
``tasks/segmentation/detectron_segmenter.py:241`` ``mask.astype("uint8")``)
— the identical affine range-compression, generalized from pixel rasters to
embedding dimensions with per-dimension calibrated ranges (the public
scalar-quantization recipe every vector store ships).

Scale design (100 TB):

* the calibration pass is ONE combinable groupBy over (dimension) — 64
  output rows regardless of corpus size (min/max are algebraic);
* the 64-row calibration table collapses to a single broadcast row of
  two arrays (lo[], hi[]), so the encode pass is a map-only stage:
  per-vector array HOFs (``transform`` with index), zero shuffle, zero
  Python;
* codes are exact integers (``floor`` — engine-identical, unlike
  ``round``'s tie modes); the reconstruction error is a max over
  bit-identical IEEE element trees, so it crosses engines raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Scalar-quantize ``vec_col`` to ``levels`` codes per dimension.

    Code: ``q = min(levels-1, floor((x - lo_d) * levels / (hi_d - lo_d)))``
    with (lo_d, hi_d) the corpus min/max of dimension d (q = 0 when the
    dimension is constant).  Returns every input column except the vector,
    plus ``codes_csv`` (comma-joined int codes in dimension order),
    ``max_err`` (max |x - dequant(q)| with midpoint reconstruction
    ``lo + (q+0.5)*span/levels``) and ``n_saturated`` (codes at the top
    level — the clipping diagnostic).
    """
    if levels < 2:
        raise ValueError(f"levels must be >= 2, got {levels}")
    dims = (
        emb.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
    )
    calib = dims.agg(
        F.sort_array(F.collect_list(F.struct("pos", "lo", "hi"))).alias("_c")
    ).select(
        F.expr("transform(_c, s -> s.lo)").alias("_lo"),
        F.expr("transform(_c, s -> s.hi)").alias("_hi"),
    )
    lv = float(levels)
    top = levels - 1
    code_expr = (
        f"transform({vec_col}, (x, i) -> CASE WHEN _hi[i] > _lo[i] "
        f"THEN least({top}, cast(floor((cast(x as double) - _lo[i]) * {lv}e0 "
        f"/ (_hi[i] - _lo[i])) as int)) ELSE 0 END)"
    )
    err_expr = (
        f"transform(sequence(0, size({vec_col}) - 1), i -> "
        f"abs(cast({vec_col}[i] as double) - (_lo[i] + "
        f"(cast(_codes[i] as double) + 0.5e0) * (_hi[i] - _lo[i]) / {lv}e0)))"
    )
    keep = [c for c in emb.columns if c != vec_col]
    return (
        emb.join(F.broadcast(calib))
        .withColumn("_codes", F.expr(code_expr))
        .select(
            *keep,
            F.concat_ws(
                ",", F.expr("transform(_codes, c -> cast(c as string))")
            ).alias("codes_csv"),
            F.array_max(F.expr(err_expr)).alias("max_err"),
            F.aggregate(
                F.expr(f"filter(_codes, c -> c = {top})"),
                F.lit(0).cast("long"),
                lambda acc, _: acc + 1,
            ).alias("n_saturated"),
        )
    )
