#!/usr/bin/env python
"""One scaling-bench measurement in a fresh JVM: run the end-to-end feature
backfill at a given master/parallelism and print one JSON line.

Separate process because a JVM's master can't change after startup — the
scaling-efficiency evidence (N vs 4N cores) needs two JVMs.

Methodology (why these knobs — measured on this sandbox):
  * IDENTICAL static plan at both parallelism levels: AQE is disabled and
    shuffle partitions fixed, so the only variable is the core count.  (With
    AQE on, the two legs run different physical plans and the ratio stops
    measuring the engine's scaling.)
  * Tungsten off-heap memory for sort/shuffle buffers: on-heap buffers made
    full-GC pauses the dominant noise source (2-4x run variance).
  * shuffle/staging on tmpfs: /tmp is one virtio disk; 8+ concurrent
    writers serialize on it.
  * 3 timed iterations, min reported: the sandbox VM's memory bandwidth
    fluctuates ~5x (measured); min is the capability estimate.
  * The input is pre-materialized to parquet (untimed): the engine's
    contract input is an already-tokenized table (BASELINE.json input_hint);
    deriving it from the documents fixture is test scaffolding.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.features import FEATURE_PAYLOAD_LIGHT, feature_backfill
from uncharted_ta1_spark.session import get_spark

BENCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.memory.offHeap.enabled": "true",
    "spark.memory.offHeap.size": "16g",
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
}


def amplified_inputs(spark, sf_dir: str, amp: int):
    """AMP deterministic replicas: doc_id gets a replica suffix so key
    cardinality (and the shuffle) scales with the data volume, preserving
    per-key row counts (and therefore window/session semantics)."""
    seq = datagen.sequences_df(spark, sf_dir).select(
        "doc_id", "source", "seq_no", "event_epoch", "tokens", "n_tok"
    )
    prb = datagen.probes_df(spark, sf_dir).select(
        "probe_id", "doc_id", "source", "ts_epoch"
    )
    if amp > 1:
        rep = F.explode(F.sequence(F.lit(0), F.lit(amp - 1))).alias("rep")
        seq = seq.select("*", rep).withColumn(
            "doc_id", F.concat_ws("#", "doc_id", "rep")
        ).drop("rep")
        prb = prb.select("*", rep).withColumn(
            "doc_id", F.concat_ws("#", "doc_id", "rep")
        ).withColumn("probe_id", F.concat_ws("#", "probe_id", "rep")).drop("rep")
    return seq, prb


def main() -> int:
    master = sys.argv[1]
    sf_dir = sys.argv[2]
    amp = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    conf = dict(BENCH_CONF)
    # Fairness: JVM thread pools size themselves from the HOST's 32 cpus, not
    # from local[N] — ParallelGC on the "1-core" leg would otherwise collect
    # with 20+ threads, making leg N faster than a real 1-core node and
    # understating the measured scaling efficiency.  Cap GC threads at the
    # leg's core count so each leg models its node size.
    m = re.match(r"local\[(\d+)\]", master)
    if m:
        conf["spark.driver.extraJavaOptions"] = (
            f"-XX:+UseParallelGC -XX:ParallelGCThreads={m.group(1)}"
        )
    spark = get_spark(
        master=master,
        app_name=f"bench-{master}",
        shuffle_partitions=64,
        extra_conf=conf,
    )
    try:
        staging_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
        staging = tempfile.mkdtemp(prefix="bench_staging_", dir=staging_root)

        seq_a, prb_a = amplified_inputs(spark, sf_dir, amp)
        seq_a.write.mode("overwrite").parquet(f"{staging}/sequences")
        prb_a.write.mode("overwrite").parquet(f"{staging}/probes")
        seq = spark.read.parquet(f"{staging}/sequences")
        prb = spark.read.parquet(f"{staging}/probes")
        n_seq = seq.count()
        n_prb = prb.count()

        # Timed: the end-to-end feature backfill — scan → window features →
        # as-of shuffle → payload join-back → parquet sink.
        out = feature_backfill(seq, prb, payload=FEATURE_PAYLOAD_LIGHT)
        times = []
        for _ in range(iters):
            t0 = time.time()
            out.write.mode("overwrite").parquet(f"{staging}/sink")
            times.append(time.time() - t0)
        elapsed = min(times)
        n_out = spark.read.parquet(f"{staging}/sink").count()
        shutil.rmtree(staging, ignore_errors=True)
        print(
            json.dumps(
                {
                    "master": master,
                    "amp": amp,
                    "n_sequences": n_seq,
                    "n_probes": n_prb,
                    "n_out": n_out,
                    "elapsed_sec": round(elapsed, 3),
                    "all_times": [round(t, 2) for t in times],
                    "rows_per_sec": round((n_seq + n_prb) / elapsed, 1),
                }
            )
        )
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
