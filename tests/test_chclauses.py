"""WITH FILL / INTERPOLATE and LIMIT BY clause semantics: dense-grid
completeness, gap-row defaults, carry-forward interpolation, and the
per-group limit. Cross-engine exactness is covered by the registered
oracles in test_oracle.py."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.chclauses import (
    events_daily_with_fill,
    events_top3_users_limit_by,
)
from tests.conftest import SF_SMOKE


def test_with_fill_materializes_the_dense_grid(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    n_types = ev.select("event_type").distinct().count()
    lo, hi = ev.agg(
        F.min(F.col("ts").cast("date")), F.max(F.col("ts").cast("date"))
    ).first()
    n_days = (hi - lo).days + 1

    rows = events_daily_with_fill(spark, SF_SMOKE).collect()
    assert len(rows) == n_types * n_days
    assert len({(r.event_type, r.day) for r in rows}) == len(rows)  # no dupes

    filled = [r for r in rows if r.filled == 1]
    assert filled, "threshold must leave real gaps at the smoke SF"
    assert all(r.n_events == 0 and r.rev_cents == 0 for r in filled)
    assert all(r.n_events > 0 for r in rows if r.filled == 0)


def test_interpolate_carries_previous_observation(spark):
    rows = events_daily_with_fill(spark, SF_SMOKE).collect()
    rows.sort(key=lambda r: (r.event_type, r.day))
    for _, grp in itertools.groupby(rows, key=lambda r: r.event_type):
        last = 0
        for r in grp:
            if r.filled == 0:
                last = r.rev_cents
            assert r.carried_cents == last


def test_limit_by_keeps_top3_per_group(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    expected: dict[str, list[tuple[int, int]]] = {}
    for r in counts.collect():
        expected.setdefault(r.event_type, []).append((-r.n, r.user_id))
    for v in expected.values():
        v.sort()

    got = events_top3_users_limit_by(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in got:
        by_type.setdefault(r.event_type, []).append((-r.n_events, r.user_id))
    assert set(by_type) == set(expected)
    for t, kept in by_type.items():
        assert sorted(kept) == expected[t][:3]


def test_sample_bands_partition_the_table(spark):
    """The eight 1/8 OFFSET k/8 bands are disjoint and their union is
    the whole table — the property CH sampled dashboards rely on."""
    from clickhouse_build_spark.functions.dialect import sample_clause

    o = load_tables(spark, SF_SMOKE)["orders"]
    total = o.count()
    band_counts = [
        sample_clause(o, "o_orderkey", 1, 8, k).count() for k in range(8)
    ]
    assert sum(band_counts) == total
    # same band twice = same rows (determinism)
    a = {r.o_orderkey for r in sample_clause(o, "o_orderkey", 1, 8, 3).collect()}
    b = {r.o_orderkey for r in sample_clause(o, "o_orderkey", 1, 8, 3).collect()}
    assert a == b
    # wider band is a superset: 2/8 OFFSET 2/8 contains 1/8 OFFSET 3/8
    wide = {r.o_orderkey for r in sample_clause(o, "o_orderkey", 2, 8, 2).collect()}
    assert a <= wide
