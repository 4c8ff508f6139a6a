"""sf0.5 stress check for dedup_clusters, outside the DuckDB oracle gate.

The driver-tier oracle (recursive-CTE transitive closure) is quadratic in
component size by construction: the stress tier's 5x id-shifted document
copies densify banded-simhash collisions superlinearly (25.3M candidate
pairs at sf0.5 vs 1.0M at sf0.1), so the closure would materialize
|component|^2 rows — the oracle, not the operator, is the quadratic side.
This script verifies the OPERATOR at the stress tier against an exact
union-find over the same edge set (independent derivation, linear memory),
plus the min-label invariant (every component label == min member id).

Usage: python scripts/stress_dedup_clusters.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.components import connected_components
from uncharted_ta1_spark.operators.dedup import simhash16, simhash_pairs
from uncharted_ta1_spark.session import get_spark
from __spark_entry__ import _documents


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf0.5"
    spark = get_spark(
        master="local[16]", app_name="stress_cc", shuffle_partitions=32
    )
    t0 = time.time()
    pairs = simhash_pairs(
        simhash16(_documents(spark, sf_dir)), max_hamming=3
    ).select("doc1", "doc2")
    pairs = pairs.persist()
    n_edges = pairs.count()
    t1 = time.time()
    print(f"edges: {n_edges} ({t1 - t0:.1f}s)")

    cc = connected_components(pairs, src="doc1", dst="doc2")
    got = {r[0]: r[1] for r in cc.select(cc.columns[0], cc.columns[1]).collect()}
    t2 = time.time()
    print(f"spark components: {len(got)} nodes ({t2 - t1:.1f}s)")

    # exact union-find over the identical edge list (path compression +
    # union by size): linear memory, the independent derivation
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for batch in pairs.toLocalIterator(prefetchPartitions=True):
        a, b = find(batch[0]), find(batch[1])
        if a != b:
            if a < b:
                parent[b] = a
            else:
                parent[a] = b
    # canonicalize: min member id per root
    members: dict[int, list[int]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    expect = {}
    for root, ms in members.items():
        lbl = min(ms)
        for m in ms:
            expect[m] = lbl
    t3 = time.time()
    print(f"union-find components ({t3 - t2:.1f}s)")

    assert set(got) == set(expect), (
        f"node sets differ: {len(got)} vs {len(expect)}"
    )
    diff = {k for k in got if got[k] != expect[k]}
    assert not diff, f"{len(diff)} label disagreements, e.g. {list(diff)[:5]}"
    n_comp = len(set(expect.values()))
    print(
        f"PASS dedup_clusters stress: {len(got)} nodes, {n_comp} components, "
        f"labels == exact union-find min-member"
    )
    pairs.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
