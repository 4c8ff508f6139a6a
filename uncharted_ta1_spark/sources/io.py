"""Source/sink helpers — the engine's IO matrix (SURVEY.md §2.1).

Reference analog: the reference's io module iterates documents from a
directory or S3 prefix, skips non-parseable entries, and writes JSON /
bytes results (``tasks/common/io.py`` + its test matrix
``tasks/common/test/test_io.py:59-289``).  In Spark these are thin,
declarative wrappers over the builtin datasources — the value is the
pinned schemas (schema-on-read, never inference, so a 100TB scan cannot
silently re-infer types from a corrupt sample) and the PERMISSIVE
corrupt-record quarantine split.

S3 is a URI-scheme swap (``s3a://``) on every path here; the sandbox has no
network, so tests exercise local paths only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROBE_SCHEMA = "probe_id string, doc_id string, source string, ts_epoch long"
SEQUENCE_SCHEMA = (
    "doc_id string, source string, seq_no int, event_epoch long, tokens array<int>"
)
CORRUPT_COL = "_corrupt"


def read_probes_csv(spark: SparkSession, path: str) -> DataFrame:
    """S7: the query-point CSV source — fixed schema, never inferred."""
    return (
        spark.read.schema(PROBE_SCHEMA).option("header", True).csv(path)
    )


def write_probes_csv(df: DataFrame, path: str) -> None:
    """S8 (CSV writer half)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_sequences_json(spark: SparkSession, path: str) -> DataFrame:
    """S2 source half: JSON lines with the pinned sequences schema."""
    return spark.read.schema(SEQUENCE_SCHEMA).json(path)


def write_sequences_json(df: DataFrame, path: str) -> None:
    """S2 sink half."""
    df.write.mode("overwrite").json(path)


def read_binary_blobs(spark: SparkSession, path: str) -> DataFrame:
    """S3: opaque blob source (image/audio/bytes analog) — (path, length,
    content binary); decode happens downstream in Arrow-batched UDFs."""
    return spark.read.format("binaryFile").load(path)


class QuarantinedRead:
    """Result of :func:`read_json_with_quarantine`.

    Unpacks like the historical 2-tuple (``good, bad = read_...``) and
    additionally exposes ``unpersist()`` to release the cached scan — in a
    long-running pipeline the cache would otherwise pin executor memory for
    the whole session once both splits are consumed.
    """

    def __init__(self, good: DataFrame, bad: DataFrame, raw: DataFrame):
        self.good = good
        self.bad = bad
        self._raw = raw

    def __iter__(self):
        return iter((self.good, self.bad))

    def unpersist(self, blocking: bool = False) -> None:
        self._raw.unpersist(blocking)


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: str
) -> QuarantinedRead:
    """S1 corrupt-skip: PERMISSIVE read returning (good, quarantined).

    Non-parseable records land in the quarantine frame instead of failing
    the job — the ``_verify_is_image`` skip analog.  The scan is cached
    because Spark disallows filtering a raw scan on only its corrupt column;
    call ``.unpersist()`` on the returned object when both splits have been
    consumed.
    """
    df = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    return QuarantinedRead(good, bad, df)


def write_partitioned_parquet(df: DataFrame, path: str, *cols: str) -> None:
    """Partitioned parquet sink — readers prune on the partition columns
    (asserted by tests/test_sources.py::test_partitioned_write_prunes)."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


class PullThroughBlobCache:
    """Executor-local keyed pull-through blob cache (S4/S5).

    Reference analog: the reference's image cache fetches each blob from S3
    once per worker and serves repeats from local disk
    (``tasks/common/image_cache.py:17-69``).  Intended use: construct INSIDE
    a ``mapInPandas`` closure (one instance per worker process) with a
    ``fetch(key) -> bytes`` callable for the remote read; repeated keys in
    later batches hit the local file.

    Concurrency-safe for multiple workers sharing one cache dir: writes go
    to a per-pid tmp file and ``os.replace`` into place, so readers never
    see partial blobs and double-fetch races resolve to one surviving copy.
    """

    def __init__(self, cache_dir: str, fetch):
        import os

        self.cache_dir = cache_dir
        self.fetch = fetch
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, key: str) -> str:
        import hashlib
        import os

        return os.path.join(
            self.cache_dir, hashlib.sha256(key.encode()).hexdigest()
        )

    def get(self, key: str) -> bytes:
        import os

        p = self._path(key)
        if os.path.exists(p):
            with open(p, "rb") as f:
                return f.read()
        blob = self.fetch(key)
        tmp = f"{p}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, p)  # atomic; concurrent fetchers converge
        return blob
