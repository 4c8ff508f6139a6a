"""Vectorized pandas/Arrow UDF surface — zero per-row Python (north rule).

Everything the SQL engine can't express natively runs through Arrow-batched
pandas UDFs: the interpreter sees whole columnar batches (numpy/pandas), never
individual rows.  Reference analog: every heavyweight Task (YOLO batch-20
inference ``tasks/point_extraction/point_extractor.py:151-235``, Detectron
``tasks/segmentation/detectron_segmenter.py:54-120``, OCR resize
``text_extractor.py:153-250``) is a batched model UDF with lazy per-worker
init — here modeled by ``multimodal_features``' deterministic fake decoder.

The SQL-expressible ops also have pandas twins (``token_stats_pandas``) so
tests can assert UDF == builtin results — the contract that lets an operator
migrate between the JVM path and the Arrow path without semantic drift.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# pandas_udf twin of a builtin path: per-row token-array statistics
# ---------------------------------------------------------------------------


def _token_sum_fn(tokens: pd.Series) -> pd.Series:
    # whole Arrow batch at once: Series of numpy arrays → vectorized map
    return tokens.map(lambda a: int(a.sum()) if len(a) else 0)


def token_stats_pandas(seq: DataFrame) -> DataFrame:
    """token_sum via an Arrow-batched pandas UDF (tested == F.aggregate).

    The UDF object is built lazily — pandas_udf return-type parsing needs an
    active SparkSession, and this module must import driver-side without one.
    """
    udf = F.pandas_udf(_token_sum_fn, LongType())
    return seq.withColumn("token_sum", udf(F.col("tokens")))


def token_stats_builtin(seq: DataFrame) -> DataFrame:
    """Same statistic via the JVM higher-order function (the default path)."""
    return seq.withColumn(
        "token_sum",
        F.aggregate(
            F.col("tokens"), F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ),
    )


# ---------------------------------------------------------------------------
# multimodal columns: opaque binary payload + typed metadata via mapInPandas
# ---------------------------------------------------------------------------

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("sha256_hex", StringType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder (image/audio libs aren't in this container;
    a real deployment swaps the body for PIL/librosa — the Spark-side
    plumbing, schema, and Arrow batch shape are identical)."""
    for pdf in batches:
        payload = pdf["payload"]
        byte_len = payload.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len,
                "sha256_hex": payload.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "fake_width": byte_len % 640,
                "fake_height": (byte_len // 640) + 1,
            }
        )


# ---------------------------------------------------------------------------
# C12: per-pixel LUT transform + color stats over binary payloads
# ---------------------------------------------------------------------------

# Foreground byte range + background whitening, mirroring the reference's
# image_pre_processing (tasks/point_extraction/point_extractor_utils.py:
# 194-224): pixels outside the foreground colour range get +WHITE_SHIFT
# clipped to 255.  Here the "pixels" are payload bytes; lowercase letters
# act as foreground ink.
FG_LO = 97
FG_HI = 122
WHITE_SHIFT = 100

# gamma-correction LUT (gamma = 1/2.2), precomputed EXACTLY once in Python —
# the oracle embeds the same 256 integers, so no pow() runs at query time
GAMMA_LUT = tuple(
    int((255.0 * ((v / 255.0) ** (1.0 / 2.2)) + 0.5) // 1) for v in range(256)
)

PIXEL_LUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_px", LongType()),
        StructField("n_foreground", LongType()),
        StructField("lut_sum", LongType()),
        StructField("lut_min", LongType()),
        StructField("lut_max", LongType()),
        StructField("h0", LongType()),
        StructField("h1", LongType()),
        StructField("h2", LongType()),
        StructField("h3", LongType()),
    ]
)


def _pixel_lut_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized per-blob kernel: whiten background bytes, apply the gamma
    LUT, reduce to per-doc stats + a 4-bin histogram.  All integer
    arithmetic; per-doc reductions via np.add.reduceat over the
    concatenated byte stream — per-row Python never runs.

    Zero-length payloads are handled explicitly (all-zero stats): reduceat
    misbehaves on empty segments — an offset equal to len(flat) raises, and a
    zero-length segment returns the NEXT element — so empty rows are masked
    out of the segmented reduction and filled with zeros.  The kernel
    operates on raw BYTES (the blob contract); callers whose oracle models
    text codepoints must restrict to ASCII payloads where the two coincide
    (see q_pixel_lut_stats)."""
    import numpy as np

    lut = np.asarray(GAMMA_LUT, dtype="int64")
    stat_cols = ("n_foreground", "lut_sum", "lut_min", "lut_max",
                 "h0", "h1", "h2", "h3")
    for pdf in batches:
        if not len(pdf):
            continue
        raw = [np.frombuffer(bytes(p), dtype="uint8") for p in pdf["payload"]]
        n = np.array([len(r) for r in raw], dtype="int64")
        out = pd.DataFrame(
            {"doc_id": pdf["doc_id"].to_numpy("int64"), "n_px": n}
        )
        cols = {k: np.zeros(len(pdf), dtype="int64") for k in stat_cols}
        nz = n > 0
        if nz.any():
            flat = np.concatenate([r for r in raw if len(r)]).astype("int64")
            nzn = n[nz]
            offs = np.concatenate(([0], np.cumsum(nzn)[:-1]))
            fg = (flat >= FG_LO) & (flat <= FG_HI)
            whitened = np.where(fg, flat, np.minimum(flat + WHITE_SHIFT, 255))
            vals = lut[whitened]
            bins = vals >> 6  # 4 histogram buckets of 64 intensity levels
            cols["n_foreground"][nz] = np.add.reduceat(fg.astype("int64"), offs)
            cols["lut_sum"][nz] = np.add.reduceat(vals, offs)
            cols["lut_min"][nz] = np.minimum.reduceat(vals, offs)
            cols["lut_max"][nz] = np.maximum.reduceat(vals, offs)
            for b in range(4):
                cols[f"h{b}"][nz] = np.add.reduceat(
                    (bins == b).astype("int64"), offs
                )
        for k in stat_cols:
            out[k] = cols[k]
        yield out


def pixel_lut_stats(docs: DataFrame) -> DataFrame:
    """C12 made real: foreground-mask whitening + gamma LUT + per-channel
    stats over an opaque binary column, Arrow-batched, shuffle-free.
    A real deployment swaps the byte stream for decoded pixel planes; the
    kernel shape (LUT gather + reduceat segmented stats) is identical."""
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload")
    )
    return with_payload.mapInPandas(_pixel_lut_batches, PIXEL_LUT_SCHEMA)


FRAME_STRIDE = 64
FRAME_LEN = 48
MAX_FRAMES = 8

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_hash", LongType()),
    ]
)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic frame sampler over opaque binary payloads: every
    FRAME_STRIDE bytes, take a FRAME_LEN-byte window (<= MAX_FRAMES frames),
    emit its length + 60-bit md5.  The video-frame-sampling analog: a real
    deployment replaces the body with a codec keyframe grab; the fan-out
    shape (1 blob row -> N frame rows, no shuffle) is identical."""
    for pdf in batches:
        doc_ids, frame_nos, frame_lens, frame_hashes = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            i = 0
            while i * FRAME_STRIDE < len(data) and i < MAX_FRAMES:
                frame = data[i * FRAME_STRIDE : i * FRAME_STRIDE + FRAME_LEN]
                doc_ids.append(doc_id)
                frame_nos.append(i)
                frame_lens.append(len(frame))
                frame_hashes.append(int(hashlib.md5(frame).hexdigest()[:15], 16))
                i += 1
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_no": pd.Series(frame_nos, dtype="int64"),
                "frame_len": pd.Series(frame_lens, dtype="int64"),
                "frame_hash": pd.Series(frame_hashes, dtype="int64"),
            }
        )


def frame_sample(docs: DataFrame) -> DataFrame:
    """Sample fixed-stride frames from each document's binary payload via
    Arrow-batched mapInPandas (the frame-sample half of the multimodal
    column story; decode stub like multimodal_features)."""
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload")
    )
    return with_payload.mapInPandas(_frame_batches, FRAME_SCHEMA)


def multimodal_features(docs: DataFrame) -> DataFrame:
    """Treat text bytes as an opaque binary column and 'decode' it in an
    Arrow-batched mapInPandas stage.

    At 100TB the payload column stays in parquet/Iceberg as BinaryType; the
    decode stage is embarrassingly parallel (no shuffle), bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload")
    )
    return with_payload.mapInPandas(_decode_batches, MULTIMODAL_SCHEMA)
