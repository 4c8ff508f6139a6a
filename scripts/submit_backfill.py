#!/usr/bin/env python
"""spark-submit entrypoint for the resumable feature backfill.

Ship the package and run (the cluster analog of the reference's
``pipelines/geo_referencing/run_pipeline.py`` CLI):

    python scripts/make_pyfiles.py                       # builds dist/uncharted_ta1_spark.zip
    spark-submit --py-files dist/uncharted_ta1_spark.zip \\
        scripts/submit_backfill.py \\
        --sf-dir /root/testdata/sf0.1 --out /tmp/backfill_out \\
        --buckets 16 [--start-epoch E] [--end-epoch E] [--gap-sec 750]

Local smoke:  python scripts/submit_backfill.py --sf-dir /root/testdata/sf0.001 --out /tmp/bf

Re-running with the same config resumes from the checkpoint log (committed
buckets are skipped); changing any config value rotates the config hash and
recomputes everything — see uncharted_ta1_spark/plans/backfill.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uncharted_ta1_spark.features import SESSION_GAP_SEC
from uncharted_ta1_spark.plans.backfill import run_backfill
from uncharted_ta1_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--gap-sec", type=int, default=SESSION_GAP_SEC)
    ap.add_argument("--start-epoch", type=int, default=None)
    ap.add_argument("--end-epoch", type=int, default=None)
    ap.add_argument("--master", default=None, help="override; spark-submit usually sets this")
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="feature-backfill")
    try:
        summary = run_backfill(
            spark,
            args.sf_dir,
            args.out,
            n_buckets=args.buckets,
            gap_sec=args.gap_sec,
            start_epoch=args.start_epoch,
            end_epoch=args.end_epoch,
        )
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
