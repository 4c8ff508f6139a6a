"""BPE pair-merge statistics over the token stream — tokenizer-design
companion to the vocabulary/Zipf profile.

Reference analog: the reference treats tokenization as a fixed upstream
model (``tasks/text_extraction`` produces token sequences); a training-data
engine also needs the statistics that DESIGN a tokenizer: k rounds of
"count all adjacent token pairs, merge the most frequent into a new symbol,
recount" (Sennrich et al.'s byte-pair encoding, computed here as corpus
statistics rather than a trained artifact).

Spark-first shape: each round is (a) one map-side-combinable pair count
(lead() window + groupBy — the shuffle reduces to distinct-pair cardinality),
(b) a 1-row top-pair broadcast, and (c) a relational merge pass.  The merge
is left-to-right non-overlapping, which is only order-dependent inside runs
of a repeated token (pair (a,a) in "a a a a" merges at even run offsets) —
so it is expressible with windows: run-id via gap-cumsum, run offset parity
via row_number, no per-row Python and no iterative fold.

The per-stage SQL texts below are SHARED verbatim between engines (the
bit-exact convention): the DuckDB oracle assembles them into one CTE chain,
while the Spark runner executes the same texts stage-by-stage and
MATERIALIZES each round's stream/top (localCheckpoint + temp view).  The
materialization matters: Spark inlines CTEs, and stream{r} feeds both the
pair count and the merge pass, so a single-text plan re-evaluates every
earlier round's work 2x per reference — exponential in k (measured 13.2s
for k=3 at sf0.01 vs ~4s materialized).  DuckDB materializes multiply-
referenced CTEs itself, so the assembled oracle stays linear.

At 10^12 tokens each round costs a window sort per sequence partition plus
one pair-count shuffle; merged-token ids are allocated from ``merge_base``
upward so later rounds count pairs over the updated symbol stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_UID = "doc_id, source, seq_no"
_W = f"PARTITION BY {_UID} ORDER BY pos"


def lead_sql(r: int) -> str:
    """e{r}: the stream with next-token + run-start flag columns."""
    return f"""
SELECT {_UID}, pos, tok,
       lead(tok) OVER ({_W}) AS nxt,
       CASE WHEN lag(tok) OVER ({_W}) IS NULL
                 OR lag(tok) OVER ({_W}) <> tok
            THEN 1 ELSE 0 END AS rf
FROM stream{r}"""


def top_sql(r: int) -> str:
    """top{r}: the most frequent adjacent pair of round r (deterministic
    tie-break cnt desc, a asc, b asc)."""
    return f"""
SELECT a, b, cnt FROM (
  SELECT tok AS a, nxt AS b, CAST(count(*) AS BIGINT) AS cnt
  FROM e{r} WHERE nxt IS NOT NULL GROUP BY tok, nxt
) p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1"""


def next_stream_sql(r: int, merge_base: int) -> str:
    """stream{r+1}: left-to-right merge of round r's top pair into symbol
    merge_base+r.  Overlap exists only inside runs of a repeated token, so
    run-offset parity (row_number over the gap-cumsum run id) picks the
    merging positions; consumed successors are dropped and positions
    renumbered."""
    return f"""
SELECT {_UID},
       row_number() OVER ({_W}) AS pos,
       CASE WHEN mrg = 1 THEN {merge_base + r} ELSE tok END AS tok
FROM (
  SELECT *, lag(mrg) OVER ({_W}) AS pmrg
  FROM (
    SELECT h.doc_id, h.source, h.seq_no, h.pos, h.tok,
           CASE WHEN h.tok = t.a AND h.nxt = t.b
                     AND (t.a <> t.b OR h.run_off % 2 = 0)
                THEN 1 ELSE 0 END AS mrg
    FROM (
      SELECT *, row_number() OVER (PARTITION BY {_UID}, rid ORDER BY pos) - 1
               AS run_off
      FROM (
        SELECT *, sum(rf) OVER ({_W}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        FROM e{r}
      ) g{r}
    ) h CROSS JOIN top{r} t
  ) m{r}
) n{r}
WHERE pmrg IS NULL OR pmrg = 0"""


def merges_select_sql(k: int, merge_base: int) -> str:
    """Final merge table over the materialized top{0..k-1}."""
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, a AS tok_a, b AS tok_b,"
        f" cnt AS pair_count, CAST({merge_base + r} AS BIGINT) AS merged_id"
        f" FROM top{r}"
        for r in range(k)
    )
    return f"SELECT * FROM ({rows}) bpe_out"


def bpe_merges_sql(k: int, *, merge_base: int) -> str:
    """The whole chain as ONE SQL text (the DuckDB oracle form).  Prepend a
    ``stream0`` CTE with columns ({_UID}, pos, tok) in the target dialect."""
    blocks = []
    for r in range(k):
        blocks.append(f"e{r} AS ({lead_sql(r)})")
        blocks.append(f"top{r} AS ({top_sql(r)})")
        if r + 1 < k:
            blocks.append(f"stream{r + 1} AS ({next_stream_sql(r, merge_base)})")
    return ", " + ", ".join(blocks) + " " + merges_select_sql(k, merge_base)


def run_bpe_merges(
    spark: SparkSession, stream0: DataFrame, k: int, *, merge_base: int
) -> DataFrame:
    """Execute the same per-stage texts round-by-round, materializing each
    round's stream{r} (and the 1-row top{r}) so no round is ever computed
    twice (see module docstring).  e{r} stays a LAZY view: its two readers
    (pair count, merge pass) each re-run one window over the already-
    materialized stream — cheaper than a third checkpoint per round, and
    the blowup this runner exists to avoid was in re-evaluating the
    *chain*, not one cached scan."""
    stream0.localCheckpoint().createOrReplaceTempView("stream0")
    for r in range(k):
        spark.sql(lead_sql(r)).createOrReplaceTempView(f"e{r}")
        spark.sql(top_sql(r)).localCheckpoint().createOrReplaceTempView(f"top{r}")
        if r + 1 < k:
            spark.sql(
                next_stream_sql(r, merge_base)
            ).localCheckpoint().createOrReplaceTempView(f"stream{r + 1}")
    return spark.sql(merges_select_sql(k, merge_base))


# ---------------------------------------------------------------------------
# The APPLY half: encode the corpus under the learned merge table
# (the signal->transform closure, like dedup's corpus_deduped: the engine
# doesn't just SCORE the tokenizer design, it re-tokenizes with it)
# ---------------------------------------------------------------------------


def encode_summary_sql(k: int) -> str:
    """Per-sequence encoding manifest over the final stream: token count
    before/after k merges plus exact positional checksums (sum(tok),
    sum(pos*tok)) that pin the full encoded content without shipping the
    exploded stream through the compare."""
    return f"""
SELECT a.doc_id, a.source, a.seq_no, b.n_tok_before,
       a.n_tok_after, a.tok_sum, a.pos_tok_sum
FROM (
  SELECT {_UID},
         CAST(count(*) AS BIGINT) AS n_tok_after,
         CAST(sum(tok) AS BIGINT) AS tok_sum,
         CAST(sum(pos * tok) AS BIGINT) AS pos_tok_sum
  FROM stream{k} GROUP BY {_UID}
) a JOIN (
  SELECT {_UID}, CAST(count(*) AS BIGINT) AS n_tok_before
  FROM stream0 GROUP BY {_UID}
) b ON a.doc_id = b.doc_id AND a.source = b.source AND a.seq_no = b.seq_no"""


def bpe_encode_sql(k: int, *, merge_base: int) -> str:
    """The whole learn+encode chain as ONE SQL text (the DuckDB oracle
    form) — unlike :func:`bpe_merges_sql` it also materializes the LAST
    round's merged stream, which is the encoded corpus."""
    blocks = []
    for r in range(k):
        blocks.append(f"e{r} AS ({lead_sql(r)})")
        blocks.append(f"top{r} AS ({top_sql(r)})")
        blocks.append(f"stream{r + 1} AS ({next_stream_sql(r, merge_base)})")
    return ", " + ", ".join(blocks) + " " + encode_summary_sql(k)


def run_bpe_encode(
    spark: SparkSession, stream0: DataFrame, k: int, *, merge_base: int
) -> DataFrame:
    """Stage-by-stage execution of the same texts (materialized per round,
    the anti-CTE-inlining runner of :func:`run_bpe_merges`), returning the
    per-sequence encoding manifest over the FINAL stream."""
    stream0.localCheckpoint().createOrReplaceTempView("stream0")
    for r in range(k):
        spark.sql(lead_sql(r)).createOrReplaceTempView(f"e{r}")
        spark.sql(top_sql(r)).localCheckpoint().createOrReplaceTempView(f"top{r}")
        spark.sql(
            next_stream_sql(r, merge_base)
        ).localCheckpoint().createOrReplaceTempView(f"stream{r + 1}")
    return spark.sql(encode_summary_sql(k))
