"""Token-stream packing: concat-and-chunk sequences into training windows.

The training-data op every LLM pretraining pipeline runs after dedup and
filtering: concatenate each stream's token sequences in event order and cut
the stream into fixed-capacity context windows ("packing"), tracking where
every sequence lands so attention masks / document boundaries can be
reconstructed.  (Reference lineage is the tiling fan-out of
``tasks/point_extraction/tiling.py:82-114`` — partition a large payload into
fixed windows with positional bookkeeping — applied to the token axis.)

Spark-first: packing here is the standard concat-and-chunk scheme (windows
are filled by stream position, sequences may straddle a boundary), which is
EXACTLY one window cumsum per stream — no fold, no UDF, one hash Exchange on
the stream key.  The greedy no-straddle variant is a sequential fold with no
closed form; concat-and-chunk is what large-scale pipelines actually run
because it wastes zero tokens to padding and stays embarrassingly parallel.

Per row the operator emits:
- ``start_off``  exclusive running token offset within the stream,
- ``chunk_id``   window index of the sequence's FIRST token,
- ``chunk_off``  position of that token inside its window,
- ``end_chunk``  window index of the LAST token,
- ``straddles``  true when the sequence crosses a window boundary.

All integer arithmetic — bit-exact in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_chunks(
    seq: DataFrame,
    *,
    capacity: int,
    keys: Sequence[str] = ("doc_id", "source"),
    order: Sequence[str] = ("event_epoch", "seq_no"),
) -> DataFrame:
    """Assign every sequence its packed-window coordinates (see module doc).

    ``capacity`` is the context-window length in tokens.  Ordering must be a
    total order per stream (the default (event_epoch, seq_no) is one for the
    engine's ``sequences`` table).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    keys = list(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("n_tok").cast("long")).over(w)
    start = (cum - F.col("n_tok")).alias("start_off")
    return seq.select(
        *keys,
        *order,
        "n_tok",
        start,
    ).select(
        *keys,
        *order,
        "n_tok",
        "start_off",
        # integer division (DIV, not /): float division loses exactness for
        # stream offsets past 2^53 — real at 10^12-token streams
        F.expr(f"start_off DIV {capacity}").alias("chunk_id"),
        F.expr(f"start_off % {capacity}").alias("chunk_off"),
        F.expr(f"(start_off + n_tok - 1) DIV {capacity}").alias("end_chunk"),
    ).withColumn("straddles", F.col("end_chunk") > F.col("chunk_id"))
