"""Cross-derivation: the SCD2 interval-containment lookup must agree row
for row with the as-of join — two independent plans (warehouse dimension
lookup vs sort-merge union) for one point-in-time semantic."""

from __future__ import annotations

from pyspark.sql import functions as F

from __spark_entry__ import q_asof_per_source, q_scd2_pit_lookup
from tests.conftest import SF_SMOKE, SF_CORRECT


def _compare(spark, sf_dir):
    pit = {
        r.probe_id: (r.pit_valid_from, r.pit_n_tok, r.fallback_used)
        for r in q_scd2_pit_lookup(spark, sf_dir).collect()
    }
    asof = {
        r.probe_id: (
            r.asof_event_epoch if r.asof_event_epoch is not None else -1,
            r.asof_n_tok,
            r.fallback_used,
        )
        for r in q_asof_per_source(spark, sf_dir).collect()
    }
    assert set(pit) == set(asof)
    diff = {k: (pit[k], asof[k]) for k in pit if pit[k] != asof[k]}
    assert not diff, f"{len(diff)} disagreements, e.g. {list(diff.items())[:3]}"


def test_pit_equals_asof_smoke(spark):
    _compare(spark, SF_SMOKE)


def test_pit_equals_asof_correctness_tier(spark):
    _compare(spark, SF_CORRECT)


def test_pit_lookup_is_unique_per_probe(spark):
    df = q_scd2_pit_lookup(spark, SF_SMOKE)
    n = df.count()
    nd = df.select("probe_id").distinct().count()
    assert n == nd
