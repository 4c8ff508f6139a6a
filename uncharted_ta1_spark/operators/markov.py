"""First-order Markov transition matrix over within-session event chains.

Reference analog: the reference's pipelines are explicit task chains whose
per-item control flow branches on what the previous step produced
(``pipelines/*/pipeline.py`` wiring; the geo-referencing flow falls
through extractor -> fallback -> anchor synthesis in order,
``tasks/geo_referencing/georeference.py:83-180``).  The data-side mirror
is the classic behavioral transition matrix: within each activity
session, how often does event type X hand off to event type Y — the
input to Markov-chain attribution, next-action prediction features, and
funnel-leak diagnosis.

Scale shape: gap sessionization and the ``lead`` both run in ONE window
spec (same partition+order -> a single exchange+sort in the plan, the
same fusion :mod:`sessionize` documents), then a combinable groupBy onto
the |types|^2-row transition table; the probability normalization
windows over that droplet-sized summary only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.operators.sessionize import sessionize


def session_transitions(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts: str,
    gap: int,
    state_col: str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-(from_state, to_state) transition counts and row-normalized
    probabilities over consecutive events inside each (keys, session).

    Returns (from_state, to_state, n_trans, n_from, p) where ``p`` is
    n_trans / n_from rounded to 9 dp.
    """
    keys = list(keys)
    sess = sessionize(
        df, keys=keys, ts=ts, gap=gap, order_tiebreak=order_tiebreak
    )
    w = Window.partitionBy(*keys, "session_id").orderBy(
        F.col(ts).asc(), *[F.col(c).asc() for c in order_tiebreak]
    )
    pairs = sess.select(
        F.col(state_col).alias("from_state"),
        F.lead(state_col).over(w).alias("to_state"),
    ).where(F.col("to_state").isNotNull())
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    # |types|^2-row summary: bounded by the state alphabet, not the corpus
    wrow = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n_trans",
        F.sum("n_trans").over(wrow).cast("long").alias("n_from"),
    ).withColumn(
        "p",
        F.round(
            F.col("n_trans").cast("double") / F.col("n_from").cast("double"),
            9,
        ),
    )
