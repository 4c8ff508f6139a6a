#!/usr/bin/env python
"""Skew-stress evidence for the as-of/window feature path.

Builds an amplified corpus where ONE hot (doc_id, source) key holds ~10% of
all rows (the viral-document case the north rule's "salted repartitioning
for skewed doc_id hot keys" clause is about), then measures the two
documented mitigations against their naive baselines on the SAME input:

  1. aggregation pair — naive groupBy(doc_id, source) vs the two-phase
     salted aggregate (operators/salting.py).  Salting splits the hot key
     across n_salts reducers; legal because the aggregate is algebraic.
  2. window pair — the full window-feature stack (features.py) over plain
     parquet (Exchange + per-key sort, the hot key serializes one reducer
     AND pays its shuffle) vs the bucketed/sorted layout (plans/layout.py),
     whose scan already satisfies the window's distribution+ordering so the
     plan has ZERO Exchange nodes.  A hot key's window math is inherently
     serial either way — what bucketing removes is the recurring shuffle of
     the other 90% of the corpus around it (and at 10^12 rows, the shuffle
     IS the bottleneck).

AQE is disabled and shuffle partitions fixed (same protocol as
bench_worker.py) so the comparison isolates the plan shape, not runtime
re-planning; local[8] so a serialized hot reducer actually idles cores.
Prints one JSON line; results recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from pyspark.sql import functions as F

from bench_worker import BENCH_CONF, amplified_inputs
from uncharted_ta1_spark.features import sequence_features
from uncharted_ta1_spark.operators.salting import salted_agg
from uncharted_ta1_spark.plans.layout import write_bucketed_sequences
from uncharted_ta1_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMP = int(os.environ.get("SPARK_GRAFT_SKEW_AMP", "8"))
HOT_FRAC_MOD = 10  # 1/10 of rows remapped to the hot key
ITERS = 3


def timed(write_df, sink: str) -> float:
    times = []
    for _ in range(ITERS):
        t0 = time.time()
        write_df.write.mode("overwrite").parquet(sink)
        times.append(time.time() - t0)
    return min(times)


def main() -> int:
    staging_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    staging = tempfile.mkdtemp(prefix="bench_skew_", dir=staging_root)
    spark = get_spark(
        master="local[8]",
        app_name="bench-skew",
        shuffle_partitions=64,
        extra_conf={
            **BENCH_CONF,
            "spark.sql.warehouse.dir": f"{staging}/warehouse",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    try:
        seq, _ = amplified_inputs(spark, SF_DIR, AMP)
        skewed = seq.withColumn(
            "doc_id",
            F.when(
                F.pmod(F.xxhash64("doc_id", "seq_no"), F.lit(HOT_FRAC_MOD)) == 0,
                F.lit("HOT"),
            ).otherwise(F.col("doc_id")),
        ).withColumn(
            "source",
            F.when(F.col("doc_id") == "HOT", F.lit("s0")).otherwise(F.col("source")),
        )
        skewed.write.mode("overwrite").parquet(f"{staging}/seq")
        inp = spark.read.parquet(f"{staging}/seq")
        n_rows = inp.count()
        n_hot = inp.where(F.col("doc_id") == "HOT").count()

        aggs = {
            "sum_n_tok": ("n_tok", "sum"),
            "max_epoch": ("event_epoch", "max"),
            "n": ("*", "count"),
        }
        naive = inp.groupBy("doc_id", "source").agg(
            F.sum("n_tok").alias("sum_n_tok"),
            F.max("event_epoch").alias("max_epoch"),
            F.count(F.lit(1)).alias("n"),
        )
        t_agg_naive = timed(naive, f"{staging}/sink_a")
        salted = salted_agg(
            inp, keys=["doc_id", "source"], salt_from="seq_no", n_salts=16,
            aggs=aggs,
        )
        t_agg_salted = timed(salted, f"{staging}/sink_b")

        t_win_shuffle = timed(sequence_features(inp), f"{staging}/sink_c")
        # untimed ingest: the layout cost is paid once, the backfill reruns
        write_bucketed_sequences(inp, "skew_seq_bucketed", n_buckets=8)
        bucketed = spark.table("skew_seq_bucketed")
        t_win_bucketed = timed(sequence_features(bucketed), f"{staging}/sink_d")

        print(json.dumps({
            "sf_dir": SF_DIR,
            "amp": AMP,
            "rows": n_rows,
            "hot_rows": n_hot,
            "hot_frac": round(n_hot / n_rows, 4),
            "agg_naive_sec": round(t_agg_naive, 3),
            "agg_salted_sec": round(t_agg_salted, 3),
            "agg_speedup": round(t_agg_naive / t_agg_salted, 3),
            "window_shuffle_sec": round(t_win_shuffle, 3),
            "window_bucketed_sec": round(t_win_bucketed, 3),
            "window_speedup": round(t_win_shuffle / t_win_bucketed, 3),
        }))
        return 0
    finally:
        spark.sql("DROP TABLE IF EXISTS skew_seq_bucketed")
        spark.stop()
        shutil.rmtree(staging, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
