#!/usr/bin/env python
"""Simulate the driver's verify pass against __spark_entry__.py.

Runs, like the driver does:
  1. entry(spark) smoke at sf0.001 → row count + schema
  2. every queries()[name] at the given sf vs oracle_sql()[name] in DuckDB
     (row count + sorted-column value comparison)

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
  With query names given, only those queries run (entry smoke is skipped) —
  the fast loop while iterating on one operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")

import duckdb

import __spark_entry__ as entrymod
from tests.oracle_check import assert_no_nan, compare_frames
from uncharted_ta1_spark.datagen import BASE_TABLES
from uncharted_ta1_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", app_name="driver-sim")

    if not only:
        t0 = time.time()
        df = entrymod.entry(spark)
        n = df.count()
        print(f"[entry] rows={n} schema={[f.name for f in df.schema.fields]} "
              f"({time.time() - t0:.1f}s)")
        assert n > 0

    con = duckdb.connect()
    for name in BASE_TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    queries = entrymod.queries()
    if only:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
            assert_no_nan(sdf, name)
            if name in oracles:
                duck_pdf = con.sql(oracles[name]).df()
                compare_frames(spark_pdf, duck_pdf, name)
                status = f"OK    rows={len(spark_pdf)} (oracle match)"
            else:
                status = f"OK    rows={len(spark_pdf)} (rows-only)"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL  {type(e).__name__}: {str(e)[:400]}"
            failures.append(name)
        print(f"[{name:24s}] {status} ({time.time() - t0:.1f}s)")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} queries match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
