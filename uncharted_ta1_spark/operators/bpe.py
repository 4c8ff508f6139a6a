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
via row_number, no per-row Python and no iterative fold.  k rounds = k
chained CTE blocks over the same pattern; the whole chain is ONE SQL text
shared verbatim by Spark and the DuckDB oracle (the shared-text bit-exact
convention), parameterized only by the dialect-specific token explode.

At 10^12 tokens each round costs a window sort per sequence partition plus
one pair-count shuffle; merged-token ids are allocated from ``merge_base``
upward so later rounds count pairs over the updated symbol stream.
"""

from __future__ import annotations

_UID = "doc_id, source, seq_no"
_W = f"PARTITION BY {_UID} ORDER BY pos"


def bpe_round_sql(r: int, merge_base: int) -> str:
    """CTE block for merge round ``r``: pair counts over stream{r}, the top
    pair, merge flags (run-parity rule for a==b overlaps), and the renumbered
    stream{r+1} with the pair collapsed to symbol merge_base+r."""
    return f"""
e{r} AS (
  SELECT {_UID}, pos, tok,
         lead(tok) OVER ({_W}) AS nxt,
         CASE WHEN lag(tok) OVER ({_W}) IS NULL
                   OR lag(tok) OVER ({_W}) <> tok
              THEN 1 ELSE 0 END AS rf
  FROM stream{r}
), p{r} AS (
  SELECT tok AS a, nxt AS b, CAST(count(*) AS BIGINT) AS cnt
  FROM e{r} WHERE nxt IS NOT NULL GROUP BY tok, nxt
), top{r} AS (
  SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
), g{r} AS (
  SELECT *, sum(rf) OVER ({_W}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
  FROM e{r}
), h{r} AS (
  SELECT *, row_number() OVER (PARTITION BY {_UID}, rid ORDER BY pos) - 1
           AS run_off
  FROM g{r}
), m{r} AS (
  SELECT h.doc_id, h.source, h.seq_no, h.pos, h.tok, h.nxt, h.run_off,
         CASE WHEN h.tok = t.a AND h.nxt = t.b
                   AND (t.a <> t.b OR h.run_off % 2 = 0)
              THEN 1 ELSE 0 END AS mrg
  FROM h{r} h CROSS JOIN top{r} t
), n{r} AS (
  SELECT *, lag(mrg) OVER ({_W}) AS pmrg
  FROM m{r}
), stream{r + 1} AS (
  SELECT {_UID},
         row_number() OVER ({_W}) AS pos,
         CASE WHEN mrg = 1 THEN {merge_base + r} ELSE tok END AS tok
  FROM n{r}
  WHERE pmrg IS NULL OR pmrg = 0
)"""


def bpe_merges_sql(k: int, *, merge_base: int) -> str:
    """The k-round chain + final merge table.  Prepend a ``stream0`` CTE
    with columns ({_UID}, pos, tok) in the target dialect."""
    blocks = ", ".join(bpe_round_sql(r, merge_base) for r in range(k))
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, a AS tok_a, b AS tok_b,"
        f" cnt AS pair_count, CAST({merge_base + r} AS BIGINT) AS merged_id"
        f" FROM top{r}"
        for r in range(k)
    )
    return f", {blocks} SELECT * FROM ({rows}) bpe_out"
