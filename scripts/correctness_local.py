#!/usr/bin/env python
"""Machine-readable local correctness sweep (VERDICT r06 item #5).

Runs every queries() entry against its DuckDB oracle at one or more sf
tiers and writes a JSON artifact with the SAME per-query schema as the
driver's CORRECTNESS_r{N}.json files, so a judge can diff instead of
re-running:

    {"<tier>": {"<query>": {"rows_match": bool, "schema_match": bool,
                            "hash_match": bool, "spark_rows": int,
                            "oracle_rows": int, "err": str|null}, ...}, ...}

``hash_match`` here means the order-insensitive canonical-row comparison of
tests/oracle_check.py passed (the same value-level gate driver_sim applies);
a query without an oracle gets rows-only status (hash_match false,
err "no_oracle") exactly like the driver reports it.

Usage: python scripts/correctness_local.py OUT.json SF_DIR [SF_DIR ...]
"""

from __future__ import annotations

import json
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


def sweep(spark, sf_dir: str) -> dict:
    con = duckdb.connect()
    for name in BASE_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    out: dict = {}
    for name, fn in sorted(queries.items()):
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
            assert_no_nan(sdf, name)
            rec["spark_rows"] = int(len(spark_pdf))
            if name in oracles:
                duck_pdf = con.sql(oracles[name]).df()
                rec["oracle_rows"] = int(len(duck_pdf))
                compare_frames(spark_pdf, duck_pdf, name)
                rec.update(rows_match=True, schema_match=True, hash_match=True)
            else:
                rec["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(
            f"[{sf_dir.rstrip('/').rsplit('/', 1)[-1]}:{name:24s}] "
            f"{'OK' if rec['hash_match'] or rec['err'] == 'no_oracle' else 'FAIL'} "
            f"({time.time() - t0:.1f}s)",
            file=sys.stderr,
            flush=True,
        )
        out[name] = rec
    con.close()
    return out


def main() -> int:
    out_path = sys.argv[1]
    tiers = sys.argv[2:] or ["/root/testdata/sf0.01"]
    spark = get_spark(master="local[8]", app_name="correctness-local")
    result = {}
    for sf_dir in tiers:
        tier = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        result[tier] = sweep(spark, sf_dir)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    bad = {
        t: [q for q, r in qs.items() if not r["hash_match"] and r["err"] != "no_oracle"]
        for t, qs in result.items()
    }
    print(json.dumps({"written": out_path, "failures": bad}))
    return 1 if any(v for v in bad.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
