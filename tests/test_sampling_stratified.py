"""Stratified hash sampling: determinism + consistency with flat sampling."""

from __future__ import annotations

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)

SF = "/root/testdata/sf0.001"


def test_stratified_consistent_with_flat(spark):
    """Same hash bucket => a stratum sampled at rate r contains exactly the
    flat r-sample's members of that stratum (membership never reshuffles
    when stratification changes)."""
    ev = datagen.events_epoch_df(spark, SF)
    strat = stratified_hash_sample(
        ev, key_cols=["event_id"], stratum_col="event_type",
        rates={"click": 0.3}, default_rate=0.0, salt="s1",
    )
    flat = hash_sample(ev, key_cols=["event_id"], rate=0.3, salt="s1")
    got = {r.event_id for r in strat.collect()}
    want = {r.event_id for r in flat.where("event_type = 'click'").collect()}
    assert got == want and got


def test_rerun_stable(spark):
    ev = datagen.events_epoch_df(spark, SF)
    kw = dict(key_cols=["event_id"], stratum_col="event_type",
              rates={"view": 0.2, "error": 0.8}, default_rate=0.1, salt="x")
    a = {r.event_id for r in stratified_hash_sample(ev, **kw).collect()}
    b = {r.event_id for r in stratified_hash_sample(ev.repartition(7), **kw).collect()}
    assert a == b
