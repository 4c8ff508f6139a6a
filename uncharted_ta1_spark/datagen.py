"""Deterministic derivation of the engine's base tables from the driver parquet.

The engine's input model (per BASELINE.json ``input_hint``) is a table of
pre-tokenized training sequences::

    sequences(doc_id string, tokens array<int>, n_tok int, source string,
              event_time timestamp)   -- keyed (doc_id, source, event_time)

plus an as-of probe table (FIXTURES.md §2).  No such parquet ships with the
test data, so both are *derived deterministically* from the driver-provided
tables (``documents``, ``orders``) with transforms expressible identically in
Spark SQL and DuckDB SQL.  That gives every query a real DuckDB oracle: the
oracle re-derives the same rows from the same parquet, so the driver's
row/schema/value-hash comparison checks the full operator path end-to-end.

The two dialects are kept in lockstep by tests/test_portable_kernel.py which
asserts row-for-row equality (including exact token-array equality) of every
fragment below at sf0.001 and sf0.01.

Reference lineage: the ``sequences`` shape mirrors ``DocTextExtraction``
(reference tasks/text_extraction/entities.py:21-26 — one document = ordered
token list with per-element payload, produced by a versioned source) and the
probe shape mirrors the query-point CSV
(reference pipelines/geo_referencing/pipeline_input_utils.py:37-48).

Determinism: everything is a pure function of the driver parquet (seed=42)
— no wall clock, no RNG at derivation time.  The hot-key skew required by
FIXTURES.md §1 (~1% of doc_ids hold a large share of rows) comes from the
``doc_id % 50 = 0 → 12 replicas`` rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BASE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EPOCH0 = 1704067200  # 2024-01-01T00:00:00Z — matches the events table origin
TOKEN_MOD = 50257  # GPT-2-ish vocab size per FIXTURES.md §1

# ---------------------------------------------------------------------------
# sequences: two source branches per document.
#   branch 0: the document's own `source` (srcNN), 1..4 rows (12 for hot docs)
#   branch 1: a synthetic `alt_K` source, 1..2 rows
# event_epoch is strictly increasing per (doc, branch); across branches of one
# doc collisions are possible and resolved by deterministic tie-breaks.
# Token values: (len(word)*31 + codepoint(word[0])) % 50257 — portable across
# Spark and DuckDB (verified by tests), exact-int equality end-to-end.
# ---------------------------------------------------------------------------

SEQUENCES_SPARK = """
sequences AS (
  SELECT doc_id, doc_num, source, seq_no, event_epoch, tokens,
         CAST(size(tokens) AS INT) AS n_tok
  FROM (
    SELECT
      'doc_' || CAST(doc_num AS STRING) AS doc_id,
      doc_num, source, CAST(seq_no AS INT) AS seq_no,
      CAST(1704067200 + (doc_num % 1440) * 60 + seq_no * 600
           + pmod(doc_num * 31 + seq_no * 17, 300) + branch * 450 AS BIGINT) AS event_epoch,
      transform(
        slice(words, 1,
              CAST(1 + pmod(doc_num * 7 + seq_no * 13 + branch * 5,
                            greatest(least(size(words), 64), 1)) AS INT)),
        w -> CAST(pmod(length(w) * 31 + ascii(w), 50257) AS INT)) AS tokens
    FROM (
      SELECT doc_num, source, words, branch,
             explode(sequence(0, reps - 1)) AS seq_no
      FROM (
        SELECT doc_id AS doc_num, source,
               filter(split(text, ' '), w -> length(w) > 0) AS words,
               CASE WHEN doc_id % 50 = 0 THEN 12 ELSE CAST(1 + doc_id % 4 AS INT) END AS reps,
               0 AS branch
        FROM documents
        UNION ALL
        SELECT doc_id AS doc_num, 'alt_' || CAST(doc_id % 3 AS STRING) AS source,
               filter(split(text, ' '), w -> length(w) > 0) AS words,
               CAST(1 + doc_id % 2 AS INT) AS reps, 1 AS branch
        FROM documents
      )
    )
  )
)
"""

SEQUENCES_DUCK = """
sequences AS (
  SELECT doc_id, doc_num, source, seq_no, event_epoch, tokens,
         CAST(len(tokens) AS INT) AS n_tok
  FROM (
    SELECT
      'doc_' || CAST(doc_num AS VARCHAR) AS doc_id,
      doc_num, source, CAST(seq_no AS INT) AS seq_no,
      CAST(1704067200 + (doc_num % 1440) * 60 + seq_no * 600
           + (doc_num * 31 + seq_no * 17) % 300 + branch * 450 AS BIGINT) AS event_epoch,
      list_transform(
        list_slice(words, 1,
                   1 + (doc_num * 7 + seq_no * 13 + branch * 5)
                       % greatest(least(len(words), 64), 1)),
        w -> CAST((length(w) * 31 + ascii(w)) % 50257 AS INT)) AS tokens
    FROM (
      SELECT doc_num, source, words, branch,
             unnest(range(reps)) AS seq_no
      FROM (
        SELECT doc_id AS doc_num, source,
               list_filter(string_split(text, ' '), w -> length(w) > 0) AS words,
               CASE WHEN doc_id % 50 = 0 THEN 12 ELSE CAST(1 + doc_id % 4 AS INT) END AS reps,
               0 AS branch
        FROM documents
        UNION ALL
        SELECT doc_id AS doc_num, 'alt_' || CAST(doc_id % 3 AS VARCHAR) AS source,
               list_filter(string_split(text, ' '), w -> length(w) > 0) AS words,
               CAST(1 + doc_id % 2 AS INT) AS reps, 1 AS branch
        FROM documents
      )
    )
  )
)
"""

# ---------------------------------------------------------------------------
# probes: one probe per order row.
#   ~9% of probes target doc_ids beyond the document table (fallback path);
#   1/4 probe an `alt_*` source, the rest probe `srcN` for N in 0..24 so some
#   per-source probes miss (more fallback);
#   1/10 probes land EXACTLY on the doc's first branch-0 event_epoch (tie case:
#   state at ts == probe ts must match — inclusive as-of semantics).
# ---------------------------------------------------------------------------

PROBES_SPARK = """
probes AS (
  SELECT
    'p_' || CAST(o_orderkey AS STRING) AS probe_id,
    'doc_' || CAST(doc_num_p AS STRING) AS doc_id,
    doc_num_p,
    CASE WHEN pmod(o_orderkey, 10) = 0 THEN coalesce(doc_src, 'src0')
         WHEN pmod(o_orderkey, 5) = 1 THEN 'alt_' || CAST(pmod(doc_num_p, 3) AS STRING)
         WHEN pmod(o_orderkey, 5) = 2 THEN 'src' || CAST(pmod(o_orderkey, 25) AS STRING)
         ELSE coalesce(doc_src, 'src0') END AS source,
    CASE WHEN pmod(o_orderkey, 10) = 0
         THEN CAST(1704067200 + (doc_num_p % 1440) * 60 + pmod(doc_num_p * 31, 300) AS BIGINT)
         ELSE CAST(1704067200 + pmod(o_orderkey * 97 + o_custkey * 11, 100000) - 5000 AS BIGINT)
    END AS ts_epoch
  FROM (
    SELECT o.o_orderkey, o.o_custkey, o.doc_num_p, d.source AS doc_src
    FROM (
      SELECT o_orderkey, o_custkey,
             pmod(o_orderkey * 13 + 7,
                  (SELECT max(doc_id) + 1 + (max(doc_id) + 1) DIV 10 FROM documents)) AS doc_num_p
      FROM orders
    ) o
    LEFT JOIN documents d ON d.doc_id = o.doc_num_p
  )
)
"""

PROBES_DUCK = """
probes AS (
  SELECT
    'p_' || CAST(o_orderkey AS VARCHAR) AS probe_id,
    'doc_' || CAST(doc_num_p AS VARCHAR) AS doc_id,
    doc_num_p,
    CASE WHEN o_orderkey % 10 = 0 THEN coalesce(doc_src, 'src0')
         WHEN o_orderkey % 5 = 1 THEN 'alt_' || CAST(doc_num_p % 3 AS VARCHAR)
         WHEN o_orderkey % 5 = 2 THEN 'src' || CAST(o_orderkey % 25 AS VARCHAR)
         ELSE coalesce(doc_src, 'src0') END AS source,
    CASE WHEN o_orderkey % 10 = 0
         THEN CAST(1704067200 + (doc_num_p % 1440) * 60 + (doc_num_p * 31) % 300 AS BIGINT)
         ELSE CAST(1704067200 + (o_orderkey * 97 + o_custkey * 11) % 100000 - 5000 AS BIGINT)
    END AS ts_epoch
  FROM (
    SELECT o.o_orderkey, o.o_custkey, o.doc_num_p, d.source AS doc_src
    FROM (
      SELECT o_orderkey, o_custkey,
             (o_orderkey * 13 + 7)
               % (SELECT max(doc_id) + 1 + (max(doc_id) + 1) // 10 FROM documents) AS doc_num_p
      FROM orders
    ) o
    LEFT JOIN documents d ON d.doc_id = o.doc_num_p
  )
)
"""

# events with a portable integer event-time (microseconds since epoch).
EVENTS_SPARK = """
events_epoch AS (
  SELECT event_id, unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us,
         user_id, event_type, value
  FROM events
)
"""

EVENTS_DUCK = """
events_epoch AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         user_id, event_type, value
  FROM events
)
"""


def register_base_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver parquet table as a temp view (idempotent).

    Also pins the session timezone to UTC: the caller may hand us a session
    built elsewhere (the grading driver does), and the epoch math in
    ``events_epoch`` (unix_micros over an NTZ cast) must agree with the
    DuckDB oracle's naive-timestamp arithmetic.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # memoized per (session, sf_dir): every read.parquet pays a ~100ms
    # footer/schema resolution, so re-registering 10 views cost ~1s on EVERY
    # query call (measured — it was the largest fixed cost in the streaming
    # subtotal).  Temp views persist on the session; only re-register when
    # the sf_dir actually changes.  (The tz pin above stays unconditional —
    # the grading driver may reset session confs between calls.)
    # validate the memo cheaply: if any base view was dropped/replaced
    # mid-session (driver housekeeping), fall through and re-register
    # instead of failing later with TABLE_OR_VIEW_NOT_FOUND.
    if getattr(spark, "_sparkgraft_tables_dir", None) == sf_dir and (
        spark.catalog.tableExists(BASE_TABLES[0])
    ):
        return
    for name in BASE_TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    spark._sparkgraft_tables_dir = sf_dir


def duck_with(*fragments: str) -> str:
    """Compose DuckDB CTE fragments into a WITH prefix."""
    return "WITH " + ", ".join(f.strip() for f in fragments)


def spark_with(*fragments: str) -> str:
    return "WITH " + ", ".join(f.strip() for f in fragments)


def sequences_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's base `sequences` table as a DataFrame."""
    register_base_tables(spark, sf_dir)
    return spark.sql(spark_with(SEQUENCES_SPARK) + " SELECT * FROM sequences")


def probes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_base_tables(spark, sf_dir)
    return spark.sql(spark_with(PROBES_SPARK) + " SELECT * FROM probes")


def events_epoch_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_base_tables(spark, sf_dir)
    return spark.sql(spark_with(EVENTS_SPARK) + " SELECT * FROM events_epoch")
