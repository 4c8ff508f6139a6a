#!/usr/bin/env python
"""Deterministic local scale-up of a driver testdata tier.

The driver ships sf0.001/0.01/0.1 only; the rounding-boundary / edge-value
hazards the oracle gate hunts are data-dependent, so periodically sweeping a
LARGER tier buys breadth the fixed tiers can't (round-4 verdict task #6).
No generator for the base tables exists in this sandbox, so the stress tier
is built by K-fold id-shifted replication of sf0.1:

* fact-table keys shift by `copy * OFFSET` with the SAME offset on every
  referencing column, so joins stay referentially exact;
* the shift constants are primes far from the small moduli the synthetic
  derivations use (event_id % 37, % 29, % 11 ...), so every copy selects a
  DIFFERENT slice of rows into GCPs/probes/quads — fresh edge coverage,
  not 5 identical reruns;
* dimension tables (region/nation) stay fixed — amplifying a dim would
  change join fan-outs instead of scaling them.

Usage: python scripts/make_sf.py [K] [src_dir] [out_dir]
Defaults: K=5, src=/root/testdata/sf0.1, out=/tmp/sparkgraft_sf0.5
"""

from __future__ import annotations

import os
import sys

import duckdb

# per-table: columns that shift by copy*offset (referential groups share
# the offset constant so FKs stay valid)
EVENT_OFF = 10_000_019
USER_OFF = 1_000_003
ORDER_OFF = 1_000_000_007
CUST_OFF = 10_000_019
SUPP_OFF = 100_003
PART_OFF = 1_000_003
DOC_OFF = 1_000_003
VEC_OFF = 100_003

RULES: dict[str, dict[str, int] | None] = {
    "region": None,  # dims: copied once, never amplified
    "nation": None,
    "customer": {"c_custkey": CUST_OFF},
    "supplier": {"s_suppkey": SUPP_OFF},
    "part": {"p_partkey": PART_OFF},
    "orders": {"o_orderkey": ORDER_OFF, "o_custkey": CUST_OFF},
    "lineitem": {
        "l_orderkey": ORDER_OFF,
        "l_partkey": PART_OFF,
        "l_suppkey": SUPP_OFF,
    },
    "events": {"event_id": EVENT_OFF, "user_id": USER_OFF},
    "documents": {"doc_id": DOC_OFF},
    "embeddings": {"vec_id": VEC_OFF},
}


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sparkgraft_sf0.5"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, rule in RULES.items():
        src_p = f"{src}/{table}.parquet"
        out_p = f"{out}/{table}.parquet"
        if rule is None or k == 1:
            con.sql(
                f"COPY (SELECT * FROM '{src_p}') TO '{out_p}' (FORMAT PARQUET)"
            )
        else:
            legs = []
            for c in range(k):
                shifted = ", ".join(
                    f"{col} + {c * off} AS {col}" for col, off in rule.items()
                )
                others = f"* EXCLUDE ({', '.join(rule)})"
                legs.append(f"SELECT {shifted}, {others} FROM '{src_p}'")
            union = " UNION ALL ".join(legs)
            con.sql(f"COPY ({union}) TO '{out_p}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out_p}'").fetchone()[0]
        print(f"{table}: {n} rows")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
