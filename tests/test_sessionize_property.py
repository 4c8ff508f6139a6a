"""Property-based check of gap sessionization: on ARBITRARY
hypothesis-generated event sets, session assignment must equal a
brute-force per-key scan — strictly-greater gap rule, total order via
(ts, event_id) tie-break, 0-based ids."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from uncharted_ta1_spark.operators.sessionize import sessionize

GAP = 10

# (key, ts, event_id) — unique event_id makes the sort total; tiny ts range
# forces equal-ts collisions and exact-gap boundaries
event = st.tuples(st.integers(0, 1), st.integers(0, 40), st.integers(0, 99))


def brute_force(rows):
    out = {}
    by_key: dict = {}
    for k, ts, eid in rows:
        by_key.setdefault(k, []).append((ts, eid))
    for k, evs in by_key.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, eid in evs:
            if prev is not None and ts - prev > GAP:
                sid += 1
            out[(k, ts, eid)] = sid
            prev = ts
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(event, min_size=1, max_size=20, unique_by=lambda e: (e[0], e[2])))
def test_sessionize_matches_brute_force(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_id long")
    got = {
        (r["user_id"], r["ts_us"], r["event_id"]): r["session_id"]
        for r in sessionize(df, keys=["user_id"], ts="ts_us", gap=GAP).collect()
    }
    assert got == brute_force(rows)
