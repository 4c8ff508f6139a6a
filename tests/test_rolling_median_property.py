"""Property-based check of rolling_median against pandas' rolling median
on arbitrary generated series (window semantics, interpolation at even
frame sizes, partial leading frames)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from uncharted_ta1_spark.operators.windows import rolling_median

row = st.tuples(st.integers(0, 1), st.integers(0, 500))


@settings(max_examples=10, deadline=None)
@given(st.lists(row, min_size=1, max_size=15))
def test_rolling_median_matches_pandas(spark, rows):
    # ts = list position per key (strictly increasing, total order)
    data = []
    pos: dict = {}
    for k, v in rows:
        pos[k] = pos.get(k, 0) + 1
        data.append((k, pos[k], v))
    df = spark.createDataFrame(data, "k long, ts long, x long")
    got = {
        (r["k"], r["ts"]): r["roll_med_x_w5"]
        for r in rolling_median(
            df, keys=["k"], order=["ts"], col="x", window=5
        ).collect()
    }
    pdf = pd.DataFrame(data, columns=["k", "ts", "x"]).sort_values(["k", "ts"])
    want = (
        pdf.groupby("k")["x"]
        .rolling(5, min_periods=1)
        .median()
        .reset_index(level=0)
    )
    pdf["med"] = want["x"].values
    for _, r in pdf.iterrows():
        assert got[(r["k"], r["ts"])] == r["med"], (r["k"], r["ts"])
