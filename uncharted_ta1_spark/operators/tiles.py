"""Partition → fan-out → merge over token sequences (the tiling analog).

Reference analogs (SURVEY.md §2.9):
  * P1/P2 ``Tiler._create_tiles`` — fixed-size tiles WITH overlap, offsets
    kept as metadata (``tasks/point_extraction/tiling.py:46-228``; text
    variant ``text_extractor.py:279-382``).
  * P3 ``Untiler._merge_tiles`` — fan-in with offset-corrected positions and
    overlap dedup (``tiling.py:231-358``), W4's last/first-wins rule keyed
    by decimated position (``tiling.py:289-352``).

Here a "document" is a token array; a tile is a fixed-size slice with
overlap.  The fan-out is an explode (rows stay co-partitioned with their
doc), per-tile work is embarrassingly parallel, and the merge reassembles
per-position values with first-tile-wins dedup — reconstructing exactly the
original reduction (verified: reconstructed sum == direct token sum).

At 100TB the explode multiplies rows, not bytes-per-row; Spark pipelines
explode → per-tile work → partial agg inside one stage (no shuffle until
the per-doc merge, which reuses the doc_id hash partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_tokens(
    seq: DataFrame, *, tile_size: int = 8, overlap: int = 2
) -> DataFrame:
    """Fan-out: one row per (sequence row, tile).  1-based tile_start, tiles
    cover [tile_start, tile_start+tile_size); stride = tile_size - overlap."""
    stride = tile_size - overlap
    n_tiles = F.when(
        F.size("tokens") <= tile_size, F.lit(1)
    ).otherwise(
        (F.ceil((F.size("tokens") - F.lit(tile_size)) / F.lit(stride)) + 1).cast("int")
    )
    tiled = seq.withColumn("n_tiles", n_tiles).select(
        "doc_id",
        "source",
        "seq_no",
        "n_tok",
        "tokens",
        "n_tiles",
        F.explode(F.sequence(F.lit(0), F.col("n_tiles") - 1)).alias("tile_id"),
    )
    return tiled.select(
        "doc_id",
        "source",
        "seq_no",
        "n_tok",
        "n_tiles",
        "tile_id",
        (F.col("tile_id") * stride + 1).alias("tile_start"),
        F.slice(F.col("tokens"), F.col("tile_id") * stride + 1, tile_size).alias("tile_tokens"),
    )


def merge_tiles(tiled: DataFrame) -> DataFrame:
    """Fan-in: per-position overlap dedup (FIRST tile covering a position
    wins, i.e. min tile_id — W4's deterministic rule), then per-row
    reduction over the deduped positions."""
    pos = (
        tiled.select(
            "doc_id", "source", "seq_no", "n_tok", "n_tiles", "tile_id",
            "tile_start",
            F.posexplode(F.col("tile_tokens")).alias("off", "token"),
        )
        .withColumn("pos", F.col("tile_start") + F.col("off"))
    )
    deduped = (
        pos.groupBy("doc_id", "source", "seq_no", "n_tok", "n_tiles", "pos")
        .agg(F.min_by(F.col("token"), F.col("tile_id")).alias("token"))
    )
    return deduped.groupBy("doc_id", "source", "seq_no", "n_tok", "n_tiles").agg(
        F.count(F.lit(1)).cast("int").alias("n_pos"),
        F.sum(F.col("token").cast("long")).alias("reconstructed_sum"),
    )
