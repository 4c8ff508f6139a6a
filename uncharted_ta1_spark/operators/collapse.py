"""Ordered group-collapse operators: string-agg and line-block regrouping.

Reference analogs:
  * string-agg collapse — the segment↔text join collapses all OCR blocks of
    one segment into a single delimited string in reading order
    (``tasks/segmentation/text_with_segments.py:86-95``); SURVEY.md §2.3 J5.
  * line-block regroup — OCR output is regrouped from words into lines /
    blocks of bounded width
    (``tasks/text_extraction/ocr/google_vision_ocr.py:140-191``); C10.

Both are single-shuffle groupBy aggregations.  Ordering inside the collapsed
string is made deterministic by sorting the collected (order_key, value)
structs — Spark's ``collect_list`` order is NOT deterministic across retries
and AQE re-plans, so the sort is mandatory, not cosmetic (the DuckDB twin is
``string_agg(... ORDER BY ...)``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def string_agg_collapse(
    df: DataFrame,
    *,
    keys: Sequence[str],
    value: Column,
    order: Column,
    sep: str = ";",
    out_col: str = "agg_text",
) -> DataFrame:
    """Per key group: values joined by ``sep`` in ascending ``order``.

    ``order`` must be unique within a group (it is the total order of the
    output string).  One hash shuffle; the collect+sort runs inside the
    aggregate, so group size bounds memory per key — the same bound any
    string_agg has.
    """
    sorted_structs = F.array_sort(
        F.collect_list(F.struct(order.alias("_o"), value.alias("_v")))
    )
    return df.groupBy(*keys).agg(
        F.array_join(
            F.transform(sorted_structs, lambda s: s["_v"]), sep
        ).alias(out_col),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )


def line_blocks(
    docs: DataFrame,
    *,
    width: int = 80,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Regroup each document's words into fixed-width line blocks.

    Deterministic rule (the columnar analog of the reference's OCR
    text_to_blocks line regrouping): lay the words out as one space-joined
    line; a word belongs to block ``floor((end_offset - 1) / width)`` where
    ``end_offset`` is the position of its last character.  Emits one row per
    (doc, block): the block text, word count and char count.

    Plan: one explode (posexplode of words), one window cumsum over word
    position, one groupBy — all whole-stage-codegen'd except the final
    collapse aggregate.
    """
    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    exploded = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "w")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # running length INCLUDING this word (words + single spaces between)
    cum = exploded.withColumn(
        "cum_len", (F.sum(F.length("w") + F.lit(1)).over(w) - F.lit(1)).cast("long")
    )
    blocked = cum.withColumn(
        "block", F.floor((F.col("cum_len") - F.lit(1)) / F.lit(width)).cast("int")
    )
    return string_agg_collapse(
        blocked,
        keys=[id_col, "block"],
        value=F.col("w"),
        order=F.col("pos"),
        sep=" ",
        out_col="block_text",
    ).select(
        id_col,
        "block",
        "block_text",
        F.col("n_parts").alias("n_words"),
        F.length("block_text").cast("int").alias("n_chars"),
    )
