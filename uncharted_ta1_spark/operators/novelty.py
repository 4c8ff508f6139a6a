"""Point-in-time shingle novelty: the leakage-aware "how much of this
sequence is genuinely new" curation signal.

Reference analog: the reference computes each artifact exactly once at its
FIRST appearance and reuses it afterwards (``tasks/common/image_cache.py:17-38``
first-write-wins cache keyed by content), and ranks duplicate extraction
results so only the first occurrence counts
(``tasks/geo_referencing/point_geocoder.py:88-97``).  Generalized to the
training-data signal: for every sequence, the fraction of its token n-grams
whose first corpus occurrence (in strict event-time order) is this sequence.
A sequence full of already-seen shingles is boilerplate/duplication; a
high-novelty sequence carries new content.  Unlike a whole-corpus distinct
count, the attribution is POINT-IN-TIME — ownership is decided by the same
total event order the as-of join serves, so the score a sequence gets today
never changes when later data arrives (zero temporal leakage, the north
rule's invariant).

Scale design (100 TB):

* shingling is a linear ``explode`` (no pairwise work);
* per-sequence distinctness is ONE hash shuffle on (sequence, shingle);
* first-occurrence ownership is a combinable ``groupBy(shingle).min(key)``
  — hot shingles (stopword runs) collapse map-side, so the skew a popular
  n-gram would cause is absorbed by partial aggregation, never a window;
* the ownership join is an equi-join on shingle (fan-out = instances, not
  pairs), and the final per-sequence rollup is a combinable groupBy.
  No window functions, no driver state, no iteration.

The event order key is a fixed-width sortable string (epoch zero-padded to
12, seq_no to 6) built with the IDENTICAL expression in the DuckDB oracle,
so ``min`` agrees bytewise across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_novelty(seq: DataFrame, *, n: int = 3) -> DataFrame:
    """Per-sequence n-gram novelty in strict event-time order.

    Input: the ``sequences`` table (doc_id, source, seq_no, event_epoch,
    tokens, n_tok).  Output one row per sequence with ``n_tok >= n``:
    (doc_id, source, seq_no, event_epoch, n_shingles, n_novel, novelty)
    where ``novelty = n_novel / n_shingles`` (raw IEEE division — both
    engines compute the identical single-op tree, so no rounding is
    needed or wanted).
    """
    if n < 1:
        raise ValueError(f"shingle size must be >= 1, got {n}")
    key = F.concat_ws(
        "|",
        F.lpad(F.col("event_epoch").cast("string"), 12, "0"),
        F.col("doc_id"),
        F.col("source"),
        F.lpad(F.col("seq_no").cast("string"), 6, "0"),
    )
    shingle = F.explode(
        F.expr(
            f"transform(sequence(1, size(tokens) - {n - 1}), "
            f"i -> concat_ws(',', transform(slice(tokens, i, {n}), "
            f"t -> cast(t as string))))"
        )
    )
    inst = (
        seq.where(F.col("n_tok") >= n)
        .select(
            "doc_id",
            "source",
            "seq_no",
            "event_epoch",
            key.alias("_k"),
            shingle.alias("shingle"),
        )
        .dropDuplicates(["_k", "shingle"])
    )
    owners = inst.groupBy("shingle").agg(F.min("_k").alias("_first_k"))
    return (
        inst.join(owners, "shingle")
        .groupBy("doc_id", "source", "seq_no", "event_epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("_k") == F.col("_first_k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn("novelty", F.col("n_novel") / F.col("n_shingles"))
    )
