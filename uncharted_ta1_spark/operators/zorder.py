"""Z-order (Morton) multi-dimensional clustering + pruning evidence.

The scan-layout question at 100 TB: a table range-partitioned on ONE key
prunes predicates on that key only; interleaving the bits of two keys
(Morton / Z-order, the Delta ``OPTIMIZE ZORDER BY`` / Iceberg sort-order
analog) gives every file a tight min/max envelope in BOTH dimensions, so a
2-D box predicate skips most files.  This module computes the Morton value
portably (identical integer algebra in Spark SQL and DuckDB), simulates
both layouts' per-file min/max manifests, and counts the files a box
predicate would actually scan — the measurable pruning win.

Reference analog: the tiler's 2-D spatial locality
(``tasks/point_extraction/tiling.py:46-228`` — tiles are consumed in
row-major order but queried by 2-D region); Z-order is the storage layout
that preserves that locality in a single sort key.

Scale shape: quantization + interleave are pure per-row integer math
(whole-stage codegen); the per-bucket min/max "manifest" is one combinable
groupBy over <= n_buckets rows; the scan decision is driver-side over the
manifest only — exactly how Iceberg plans a scan without touching data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 8  # 8 bits per dimension -> 16-bit Morton values


def morton_sql(xq: str, yq: str, *, div: str) -> str:
    """Shared-text Morton interleave of two pre-quantized N_BITS ints.

    ``div`` is the integer-division operator: ``DIV`` (Spark) or ``//``
    (DuckDB).  Both engines' ``%`` agree on non-negative operands (all
    inputs here are quantized to [0, 2^N_BITS)).
    """
    terms = []
    for i in range(N_BITS):
        terms.append(f"((({xq}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({yq}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def quantize_sql(v: str, vmin: str, vmax: str, *, div: str) -> str:
    """Order-preserving quantization of ``v`` in [vmin, vmax] to N_BITS."""
    return (
        f"((({v}) - ({vmin})) * {1 << N_BITS})"
        f" {div} (({vmax}) - ({vmin}) + 1)"
    )


def layout_scan_counts(
    pts: DataFrame,
    *,
    bucket_col: str,
    x: str = "x",
    y: str = "y",
    box: tuple[str, str, str, str] = ("xlo", "xhi", "ylo", "yhi"),
    layout: str = "zorder",
) -> DataFrame:
    """Per-layout pruning summary from a simulated per-file manifest.

    ``pts`` must carry the raw dims, a bucket (file) id column, and the
    box bounds (constant columns).  Buckets whose raw [min, max] envelope
    intersects the box in BOTH dims are "scanned"; rows inside the box are
    counted exactly.  Returns ONE row: (layout, n_buckets_total,
    n_buckets_scanned, n_rows_scanned, n_rows_in_box).
    """
    xlo, xhi, ylo, yhi = box
    in_box = (
        (F.col(x) >= F.col(xlo))
        & (F.col(x) <= F.col(xhi))
        & (F.col(y) >= F.col(ylo))
        & (F.col(y) <= F.col(yhi))
    )
    manifest = pts.groupBy(bucket_col).agg(
        F.min(x).alias("_minx"),
        F.max(x).alias("_maxx"),
        F.min(y).alias("_miny"),
        F.max(y).alias("_maxy"),
        F.count(F.lit(1)).cast("long").alias("_rows"),
        F.sum(F.when(in_box, 1).otherwise(0)).cast("long").alias("_hits"),
        # box bounds are constant columns; min() keeps the agg deterministic
        F.min(F.col(xlo)).alias("_xlo"),
        F.min(F.col(xhi)).alias("_xhi"),
        F.min(F.col(ylo)).alias("_ylo"),
        F.min(F.col(yhi)).alias("_yhi"),
    )
    scanned = (
        (F.col("_minx") <= F.col("_xhi"))
        & (F.col("_maxx") >= F.col("_xlo"))
        & (F.col("_miny") <= F.col("_yhi"))
        & (F.col("_maxy") >= F.col("_ylo"))
    )
    return manifest.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_total"),
        F.sum(F.when(scanned, 1).otherwise(0))
        .cast("long")
        .alias("n_buckets_scanned"),
        F.sum(F.when(scanned, F.col("_rows")).otherwise(0))
        .cast("long")
        .alias("n_rows_scanned"),
        F.sum("_hits").cast("long").alias("n_rows_in_box"),
    ).select(
        F.lit(layout).alias("layout"),
        "n_buckets_total",
        "n_buckets_scanned",
        "n_rows_scanned",
        "n_rows_in_box",
    )
