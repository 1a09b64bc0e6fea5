"""uniqState/uniqMerge lifecycle: partition-invariance of state
merging (the algebraic property that makes rollups-at-rest correct)
and the registered query's boolean contract. Cross-engine checks are
covered by the registered oracle in test_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.aggstate import (
    HLL_LGK,
    daily_uniq_states,
    events_uniq_state_merge,
    merge_uniq_states,
)
from tests.conftest import SF_SMOKE


def test_merge_is_partition_invariant(spark):
    """Max-combined registers do not depend on how the rows were split
    into partials: merging per-day states and merging per-10-minute
    states must finalize to the IDENTICAL estimate per group."""
    ev = load_tables(spark, SF_SMOKE)["events"]
    by_day = merge_uniq_states(daily_uniq_states(ev))
    fine = ev.groupBy(
        "event_type", F.window("ts", "10 minutes").alias("w")
    ).agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("state"))
    by_10min = merge_uniq_states(fine)

    a = {r.event_type: r.merged_users for r in by_day.collect()}
    b = {r.event_type: r.merged_users for r in by_10min.collect()}
    assert a == b
    # and the finer split really had more partials
    na = {r.event_type: r.n_partials for r in by_day.collect()}
    nb = {r.event_type: r.n_partials for r in by_10min.collect()}
    assert all(nb[t] > na[t] for t in na)


def test_registered_contract_holds(spark):
    rows = events_uniq_state_merge(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.merge_within_1pct_of_direct for r in rows)
    assert all(r.within_5pct for r in rows)
