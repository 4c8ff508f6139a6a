#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1) — NOT the graded bench.

Times any subset of queries() with the SAME session config and warmup as
bench.py part 2, optionally repeated, optionally with .explain("formatted")
captured to a file per query.  bench.py itself stays frozen; this file
exists so optimization work can isolate and re-measure single queries
without re-running the whole suite.

Usage:
  python bench_extra.py                      # all queries, 1 pass
  python bench_extra.py q1 q2 ...            # the named queries
  REPS=3 python bench_extra.py q1            # min of 3
  PLANS_DIR=plans/r07 SUFFIX=before python bench_extra.py q1   # + explain
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("REPS", "1"))
PLANS_DIR = os.environ.get("PLANS_DIR")
SUFFIX = os.environ.get("SUFFIX", "plan")


def main() -> int:
    from uncharted_ta1_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="bench-extra",
        extra_conf={
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = entrymod.queries()
    names = sys.argv[1:] or sorted(qs)
    # same warmup as bench.py
    qs["lag_lead_context"](spark, SF_DIR).count()
    qs["token_sum_pandas"](spark, SF_DIR).count()
    if any(n.startswith("streaming_") for n in names):
        for warm_q in ("streaming_sessions", "streaming_dedup",
                       "streaming_attribution", "streaming_counters",
                       "streaming_windowed"):
            qs[warm_q](spark, SF_DIR).count()

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if PLANS_DIR:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(os.path.join(PLANS_DIR, f"{name}_{SUFFIX}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 3))
        out[name] = min(samples)
        print(f"{name}: {out[name]}  {samples if REPS > 1 else ''}",
              file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "queries": out,
                      "total_sec": round(sum(out.values()), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
