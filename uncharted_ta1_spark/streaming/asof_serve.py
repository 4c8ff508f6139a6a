"""Streaming as-of serving: answer a probe STREAM against accumulated state.

Reference analog: the deployed reference answers georeferencing queries
arriving over a queue against per-map state built earlier
(``cdr/server.py:273-335`` event replay + ``tasks/common/request_client.py``
queue consumption) — the serving half of the fit-then-lookup loop.

Structured Streaming cannot express the as-of running-last window directly
(no ordered window over an unbounded stream), so the operator runs the BATCH
``asof_join`` once per micro-batch inside ``foreachBatch``: each batch of
probes is answered against the full state table, exactly-once per batch via
the checkpointed batch_id.  This is the standard storage-mediated pattern
(ST5): state lives in a table the stream never mutates, so every micro-batch
sees a consistent snapshot and the result is independent of how probes are
batched — asserted by tests/test_streaming.py (stream == batch equality).

Scale: each micro-batch costs ONE shuffle of |state-pruned| + |batch| rows
(the batch as-of plan); for small probe batches the state side is pruned
with a semi join on the batch's keys first, so steady-state serving cost is
O(state rows of probed keys), not O(all state).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.asof import asof_join


def asof_answer_batch(
    state: DataFrame,
    probe_batch: DataFrame,
    *,
    keys: list[str],
    payload_cols: list[str],
    prune_state: bool = True,
) -> DataFrame:
    """Answer one probe batch with the leakage-free as-of lookup.

    ``prune_state``: semi-join the state down to the batch's key set before
    the as-of shuffle — the Bloom/DPP-style reduction that makes small
    serving batches O(probed keys) instead of O(state).
    """
    if prune_state:
        state = state.join(
            probe_batch.select(*keys).distinct(), keys, "left_semi"
        )
    return asof_join(
        state,
        probe_batch,
        keys=keys,
        payload_cols=payload_cols,
        defaults={"tokens": F.array().cast("array<int>"), "n_tok": F.lit(-1)},
    )


def serve_probe_stream(
    probe_stream: DataFrame,
    state: DataFrame,
    *,
    keys: list[str],
    payload_cols: list[str],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
):
    """Start the serving query: each micro-batch of probes is answered
    against `state` and handed to `sink(answers_df, batch_id)`."""

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            asof_answer_batch(
                state, batch_df, keys=keys, payload_cols=payload_cols
            ),
            batch_id,
        )

    return (
        probe_stream.writeStream.foreachBatch(_answer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
