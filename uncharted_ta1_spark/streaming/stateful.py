"""Custom stateful streaming operator via applyInPandasWithState.

Reference analog: the per-worker accumulating request metrics
(``tasks/common/request_client.py:374-458``, ST7) and the stateful chaining
where progress lives across messages (ST5) — here as a per-user running
aggregate whose state survives micro-batches.

This is the escape hatch for operators Structured Streaming can't express
natively (custom session logic, decaying counters, CEP-ish patterns): state
is an explicit per-key tuple, input arrives as Arrow-batched pandas frames
(zero per-row Python), and output is emitted incrementally per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, last_ts timestamp_ntz"
)
STATE_SCHEMA = "n long, s_micro long, last_us long"


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # value_sum accumulates as integer micro-units (floor(value*1e6), exact
    # IEEE, identical in every engine) so the running sum is order-free —
    # a double accumulator's result depends on Arrow-batch order and can
    # diverge from any fixed oracle after rounding.  The final double is one
    # int->double division, bit-identical to the oracle's.
    n, s_micro, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].to_numpy(dtype=np.float64)
        s_micro += int(np.floor(v * 1e6).astype(np.int64).sum())
        last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((n, s_micro, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [s_micro / 1e6],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def stateful_user_counters(events: DataFrame) -> DataFrame:
    """Per-user running (count, value sum, last event time) across the whole
    stream — state accumulates over micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
