"""End-to-end corpus curation: fuse the quality / repetition / dedup
signals into a keep-or-drop decision with a reason code.

The integration step of an LLM training-data pipeline (C4/Gopher-style
rule cascade): every signal is computed by its own scale-safe operator,
then fused with equi joins on ``doc_id`` — on a cluster all four signal
aggregations shuffle on the same key, so AQE coalesces them into
co-partitioned joins with no extra repartition.

Reference analog: the chained gate predicates of the pipeline driver
(``pipelines/metadata_extraction/metadata_extraction_pipeline.py:56-110``
— text_filter stage then filtered-text metadata extraction — plus the
``_should_run`` guards), generalized from per-map gating to corpus
curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.dedup import shingle_repetition, span_duplication
from uncharted_ta1_spark.operators.textstats import text_quality, word_entropy

# Rule thresholds (deliberately mid-distribution at the test SFs so both
# keep and drop classes are populated; see COVERAGE.md row)
MIN_WORDS = 20
MIN_STOPWORD_RATIO = 0.01
MIN_ENTROPY = 2.5
MAX_REP_FRAC = 0.05
MAX_DUP_SPAN_FRAC = 0.5


def curate_corpus(docs: DataFrame) -> DataFrame:
    """Per-doc curation decision: first failing rule wins (fixed
    precedence: too_short → low_stopword → low_entropy → repetitive →
    duplicated → keep).

    Missing signals (a doc too short to have shingles) coalesce to the
    passing value — absence of evidence never drops a document.
    """
    tq = text_quality(docs).select("doc_id", "n_words", "stopword_ratio")
    we = word_entropy(docs).select("doc_id", "entropy_nats")
    rep = shingle_repetition(docs).select("doc_id", "rep_frac")
    sp = span_duplication(docs).select("doc_id", "dup_span_frac")
    j = (
        tq.join(we, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(sp, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "stopword_ratio",
            "entropy_nats",
            F.coalesce(F.col("rep_frac"), F.lit(0.0)).alias("rep_frac"),
            F.coalesce(F.col("dup_span_frac"), F.lit(0.0)).alias("dup_span_frac"),
        )
    )
    reason = (
        F.when(F.col("n_words") < MIN_WORDS, F.lit("too_short"))
        .when(F.col("stopword_ratio") < MIN_STOPWORD_RATIO, F.lit("low_stopword"))
        .when(F.col("entropy_nats") < MIN_ENTROPY, F.lit("low_entropy"))
        .when(F.col("rep_frac") > MAX_REP_FRAC, F.lit("repetitive"))
        .when(F.col("dup_span_frac") > MAX_DUP_SPAN_FRAC, F.lit("duplicated"))
        .otherwise(F.lit("keep"))
    )
    return j.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason") == "keep"
    )
