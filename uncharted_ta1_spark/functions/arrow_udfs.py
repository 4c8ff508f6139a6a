"""Vectorized pandas/Arrow UDF surface — zero per-row Python (north rule).

Everything the SQL engine can't express natively runs through Arrow-batched
pandas UDFs: the interpreter sees whole columnar batches (numpy/pandas), never
individual rows.  Reference analog: every heavyweight Task (YOLO batch-20
inference ``tasks/point_extraction/point_extractor.py:151-235``, Detectron
``tasks/segmentation/detectron_segmenter.py:54-120``, OCR resize
``text_extractor.py:153-250``) is a batched model UDF with lazy per-worker
init.  The image decode stage is REAL here: a pure-numpy BMP/PPM codec
(``decode_image_features``) parses genuine container bytes; only the
learned-model inference itself stays out of scope in this sandbox.

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
    """Byte-metadata pass over opaque blobs: length, content hash, derived
    dims — the cheap first stage of a multimodal pipeline (the REAL pixel
    decode lives in :func:`decode_image_features` below)."""
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


# ---------------------------------------------------------------------------
# REAL image codec: BMP (24bpp, bottom-up, row-padded) + PPM (P6) in pure
# numpy/struct — no PIL.  Reference analog: every CV Task decodes raster
# images before inference (tasks/segmentation/detectron_segmenter.py:54-120,
# tasks/point_extraction/point_extractor.py:151-235 load PIL images); this
# is the decode stage made real for the two classic uncompressed containers.
# The parser handles the details that make decode nontrivial — BMP stores
# rows bottom-up and pads each row to a 4-byte boundary; PPM has an ASCII
# token header — so an encoder/parser disagreement (off-by-one padding,
# row-order flip) breaks the closed-form oracle instead of hiding.
# ---------------------------------------------------------------------------

import struct

IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_px", LongType()),
        StructField("pix_sum", LongType()),
        StructField("pix_min", LongType()),
        StructField("pix_max", LongType()),
        StructField("lut_sum", LongType()),
    ]
)


def _synth_gray(doc_id: int, n: int):
    """Deterministic grayscale plane in raster (top-down) order — the
    closed form the DuckDB oracle recomputes independently."""
    import numpy as np

    return ((doc_id * 31 + np.arange(n, dtype="int64") * 7) % 256).astype("uint8")


def _encode_bmp(vals, w: int, h: int) -> bytes:
    """24bpp BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, gray triplets,
    rows bottom-up, each row padded to a 4-byte boundary."""
    import numpy as np

    stride = ((w * 3 + 3) // 4) * 4
    img = np.zeros((h, stride), dtype="uint8")
    plane = vals.reshape(h, w)
    for ch in range(3):  # B, G, R all = gray value
        img[:, ch : w * 3 : 3] = plane
    img = img[::-1]  # bottom-up storage
    data = img.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + info + data


def _encode_ppm(vals, w: int, h: int) -> bytes:
    """P6 PPM: ASCII header + top-down RGB triplets (no padding)."""
    import numpy as np

    rgb = np.repeat(vals, 3)
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def _parse_bmp(data: bytes):
    import numpy as np

    magic, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP")
    _hsz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    stride = ((w * 3 + 3) // 4) * 4
    raw = np.frombuffer(data, dtype="uint8", count=h * stride, offset=offset)
    rows = raw.reshape(h, stride)[::-1]  # back to top-down
    return w, h, rows[:, 0 : w * 3 : 3].reshape(-1).astype("int64")


def _parse_ppm(data: bytes):
    import numpy as np

    # ASCII header: magic, width, height, maxval, then ONE whitespace byte
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while data[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, _maxval = tokens
    raw = np.frombuffer(data, dtype="uint8", count=w * h * 3, offset=pos)
    return w, h, raw[0::3].astype("int64")


def _image_blob_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encoder stage: deterministic gray plane per doc, containerized as a
    real BMP (even doc_id) or PPM (odd) blob."""
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 8 + d % 9, 4 + d % 5
            vals = _synth_gray(d, w * h)
            payloads.append(
                _encode_bmp(vals, w, h) if d % 2 == 0 else _encode_ppm(vals, w, h)
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


def _image_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The REAL decoder: sniff the container magic, parse header + pixel
    plane with numpy, reduce to stats + a gamma-LUT sum (the
    pixel_lut_stats machinery applied to decoded pixels, not raw bytes)."""
    import numpy as np

    lut = np.asarray(GAMMA_LUT, dtype="int64")
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "fmt", "width", "height", "n_px",
                                "pix_sum", "pix_min", "pix_max", "lut_sum")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            if data[:2] == b"BM":
                fmt = "bmp"
                w, h, vals = _parse_bmp(data)
            else:
                fmt = "ppm"
                w, h, vals = _parse_ppm(data)
            rows["doc_id"].append(int(doc_id))
            rows["fmt"].append(fmt)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_px"].append(len(vals))
            rows["pix_sum"].append(int(vals.sum()))
            rows["pix_min"].append(int(vals.min()))
            rows["pix_max"].append(int(vals.max()))
            rows["lut_sum"].append(int(lut[vals].sum()))
        out = pd.DataFrame(rows)
        for k in ("doc_id", "width", "height", "n_px",
                  "pix_sum", "pix_min", "pix_max", "lut_sum"):
            out[k] = out[k].astype("int64")
        yield out


def synth_image_blobs(docs: DataFrame) -> DataFrame:
    """doc_id -> real BMP/PPM binary blob (the binary-column ingest side)."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return docs.select("doc_id").mapInPandas(_image_blob_batches, schema)


def decode_image_features(blobs: DataFrame) -> DataFrame:
    """Real container decode + pixel stats over a BinaryType column, Arrow
    batched, shuffle-free — the CV-Task decode stage with an actual body."""
    return blobs.mapInPandas(_image_decode_batches, IMAGE_SCHEMA)
