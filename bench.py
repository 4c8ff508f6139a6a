#!/usr/bin/env python
"""Per-round benchmark harness.

Prints ONE COMPACT JSON line as its LAST line of stdout:
  {"metric": ..., "value": <rows/sec>, "unit": "rows/sec",
   "queries": {<headline queries only>: sec}, "sf": ...,
   "total_query_sec": ..., "backfill": {... scaling evidence ...}}

The line is deliberately small (<2 KB): rounds 2 and 3 were recorded
`parsed: null` because the 97-query timing dict pushed the line past the
driver's stdout tail capture.  The FULL result — every per-query timing plus
all paired scaling rounds — is written to bench_out.json; the stdout line
carries only the grade-bearing numbers.

Two parts:
  1. Scaling evidence (north rule): the end-to-end feature backfill runs in
     two fresh JVMs at N and 4N cores (default local[1] vs local[4]) on the
     SAME amplified input with the SAME static plan; throughput at both and
     the scaling efficiency are reported.  See scripts/bench_worker.py for
     the measurement methodology.
  2. Per-query wall time for every queries() entry at $SPARK_GRAFT_SF_DIR
     (default sf0.1) on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# 16x amplification = 2.7M rows: the largest working set whose 4-core-leg
# shuffle+sink traffic stays inside this VM's RELIABLE bandwidth envelope
# (measured 1.1-7.2 GB/s, dipping for minutes at a time).  At 32x the 4N leg
# is intermittently bandwidth-starved and the ratio measures the hypervisor,
# not the engine — same reasoning that pins the core pair at 1->4 instead of
# 8->32 (BENCH.md).  Paired amp=16 rounds measured 0.93/0.99 efficiency in
# the same hour that amp=32 rounds swung 0.66-0.83.
AMP = int(os.environ.get("SPARK_GRAFT_BENCH_AMP", "16"))
SCALING_N = os.environ.get("SPARK_GRAFT_SCALE_N", "1")
SCALING_4N = os.environ.get("SPARK_GRAFT_SCALE_4N", "4")
HERE = os.path.dirname(os.path.abspath(__file__))


def run_worker(master: str, iters: int = 3) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", "bench_worker.py"),
         master, SF_DIR, str(AMP), str(iters)],
        capture_output=True,
        text=True,
        timeout=1200,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "12g"},
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench_worker {master} failed: {r.stderr[-800:]}")
    return json.loads(lines[-1])


def main() -> int:
    # --- part 1: scaling evidence -----------------------------------------
    # The sandbox VM's memory bandwidth swings ~5x over minutes (BENCH.md),
    # so any ratio of measurements taken in DIFFERENT epochs is biased —
    # observed 0.69-0.93 "efficiency" for the same build depending purely on
    # which epoch each leg sampled.  Estimator: legs run PAIRED (N then 4N,
    # adjacent in time, same epoch), three rounds, per-round efficiency =
    # (low/high)/core_ratio, and the reported figure is the MEDIAN of the
    # paired rounds.  Pairing cancels epoch drift; the median rejects a
    # single round whose epoch flipped mid-pair.
    core_ratio = int(SCALING_4N) / int(SCALING_N)
    rounds = []

    def paired_round():
        lo = run_worker(f"local[{SCALING_N}]")
        hi = run_worker(f"local[{SCALING_4N}]")
        rounds.append((lo, hi, (lo["elapsed_sec"] / hi["elapsed_sec"]) / core_ratio))

    def median_round():
        return sorted(rounds, key=lambda r: r[2])[len(rounds) // 2]

    # Fixed-round protocol: ALWAYS the same number of paired rounds, median
    # reported.  (Earlier rounds ran 3 and extended to 5 only when the median
    # was low — a one-sided re-measurement rule that could only raise the
    # reported number.  Hypervisor interference here is one-sided — bandwidth
    # starvation lowers the 4N leg — so the median over a FIXED round count is
    # robust to bad epochs without conditioning sampling on the result.
    # 7 rounds, not 5: two same-protocol 5-round runs measured medians 0.847
    # and 0.775 in one afternoon — a multi-minute starvation epoch can swallow
    # 2 of 5 rounds; 7 fixed rounds tolerate 3 bad ones, and the count is
    # chosen up front, never in response to a result.)
    n_rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "7"))
    for _ in range(n_rounds):
        paired_round()
    low, high, efficiency = median_round()
    speedup = efficiency * core_ratio

    # --- part 2: per-query timings -----------------------------------------
    from uncharted_ta1_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="bench-queries",
        extra_conf={
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "16g",
            # keep stdout clean: the one JSON line must survive output
            # capping (BENCH_r02 was recorded parsed:null after progress
            # bars pushed the line past the driver's capture window)
            "spark.ui.showConsoleProgress": "false",
        },
    )
    # warm the session (JVM/JIT, parquet footers, Python workers) so the
    # first timed query isn't charged the startup cost
    entrymod.queries()["lag_lead_context"](spark, SF_DIR).count()
    entrymod.queries()["token_sum_pandas"](spark, SF_DIR).count()
    # warm each streaming operator type at SF_DIR: the micro-batch engine
    # and each stateful operator (session_window,
    # dropDuplicatesWithinWatermark, stream-stream join,
    # applyInPandasWithState) pay a one-time plan/operator init on first
    # use, and the staged source dirs are populated here so the timed pass
    # measures steady-state drain latency, not tmpfs staging (measured:
    # 4-query streaming subtotal 16s cold -> ~8s warm at sf0.1)
    # The warmup pass is itself timed: streaming_cold_sec is the first-run
    # (cold driver) subtotal, recorded alongside the warm steady-state
    # timings so the amortization claim stays falsifiable (ADVICE r04).
    stream_qs = ("streaming_sessions", "streaming_dedup",
                 "streaming_attribution", "streaming_counters",
                 "streaming_windowed")
    t_cold = time.time()
    for warm_q in stream_qs:
        entrymod.queries()[warm_q](spark, SF_DIR).count()
    streaming_cold_sec = round(time.time() - t_cold, 3)

    qtimes: dict[str, float] = {}
    for name, fn in sorted(entrymod.queries().items()):
        t0 = time.time()
        df = fn(spark, SF_DIR)
        _ = df.count()  # execute; per-query outputs are small at sf0.1
        qtimes[name] = round(time.time() - t0, 3)
    spark.stop()

    total = round(sum(qtimes.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    backfill = {
        "amp": AMP,
        "rows": low["n_sequences"] + low["n_probes"],
        f"local[{SCALING_N}]_sec": low["elapsed_sec"],
        f"local[{SCALING_4N}]_sec": high["elapsed_sec"],
        f"local[{SCALING_N}]_rows_per_sec": low["rows_per_sec"],
        f"local[{SCALING_4N}]_rows_per_sec": high["rows_per_sec"],
        "speedup": round(speedup, 3),
        "core_ratio": core_ratio,
        "scaling_efficiency": round(efficiency, 3),
        "paired_rounds": len(rounds),
        "efficiency_rounds": [round(eff, 3) for _, _, eff in rounds],
    }
    # headline value IS the throughput the metric name promises (north rule:
    # sequences/sec end-to-end feature backfill); the 4N-core leg is the
    # representative multi-executor figure.  The stdout "queries" dict holds
    # only a handful of headline queries so the line stays small enough for
    # the driver's tail capture; the full 97-query dict goes to
    # bench_out.json.
    headline_qs = [
        "feature_backfill", "asof_per_source", "sessionize_events",
        "lag_lead_context", "dedup_minhash_lsh", "ann_cosine_topk",
        "corpus_curation", "streaming_sessions",
    ]
    summary = {
        "metric": "sequences_per_sec_feature_backfill",
        "value": high["rows_per_sec"],
        "unit": "rows/sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(qtimes),
        "total_query_sec": total,
        "queries": {k: qtimes[k] for k in headline_qs if k in qtimes},
        "backfill": backfill,
        "queries_file": "bench_out.json",
    }
    full = dict(summary)
    full["queries"] = qtimes
    full["streaming_cold_sec"] = streaming_cold_sec
    full["streaming_warm_sec"] = round(
        sum(qtimes[q] for q in stream_qs if q in qtimes), 3
    )
    full["backfill"] = {
        **backfill,
        "paired_rounds": [
            {
                f"local[{SCALING_N}]_sec": lo["elapsed_sec"],
                f"local[{SCALING_4N}]_sec": hi["elapsed_sec"],
                "efficiency": round(eff, 3),
            }
            for lo, hi, eff in rounds
        ],
    }
    with open(os.path.join(HERE, "bench_out.json"), "w") as f:
        f.write(json.dumps(full) + "\n")
    # compact summary is the LAST stdout line — the only thing the driver
    # needs to parse
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
