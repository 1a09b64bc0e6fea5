"""Scan fan-out (r17 optimization, consumer-scoped in r18): a parquet
layout with fewer row groups than cores starves the scan stage — every
narrow expression runs on one task. The catalog repartitions such scans
to the session's core count, derived from the footer (scale-adaptive:
>= cores row groups, an oversized table, or SPARK_GRAFT_SCAN_FANOUT=off
leave the plan alone). r18 (VERDICT r17 #1): `events` is OPT-IN — its
default plan is the un-fanned shape (cheap windowed aggregates paid an
exchange they never amortized) and only heavy consumers request the
wide scan via Catalog.wide()/wide_views().
"""

from __future__ import annotations

import contextlib
import io
from collections import Counter

import pytest

from clickhouse_build_spark.catalog import Catalog
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def fresh_catalog(spark):
    return Catalog(spark, SF_SMOKE)


def test_fanout_decision_bounds(spark, fresh_catalog, monkeypatch):
    cat = fresh_catalog
    cores = spark.sparkContext.defaultParallelism
    import clickhouse_build_spark.catalog as cmod

    # single-row-group mid-size blanket table -> fan out to every core
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    assert cat._fanout_partitions("documents") == cores
    # layout already feeds the cores -> structural no-op
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (10**12, cores))
    assert cat._fanout_partitions("documents") == 0
    # broadcast-sized dim -> a 1-task scan is free, skip the exchange
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (10_000, 1))
    assert cat._fanout_partitions("documents") == 0
    # oversized single-row-group table -> exchange no longer trivial
    monkeypatch.setattr(
        cmod, "_parquet_layout", lambda p: (cores * 64 * 1024 * 1024, 1)
    )
    assert cat._fanout_partitions("documents") == 0
    # narrow numeric fact tables never fan out (catalog annotation)
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    assert cat._fanout_partitions("lineitem") == 0
    assert cat._fanout_partitions("orders") == 0
    # events is opt-in (r18): plain load stays un-fanned, wide() fans
    assert cat._fanout_partitions("events") == 0
    assert cat._fanout_partitions("events", opt_in=True) == cores


def test_fanout_env_kill_switch(fresh_catalog, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "off")
    assert fresh_catalog._fanout_partitions("documents") == 0
    assert fresh_catalog._fanout_partitions("events", opt_in=True) == 0


def test_fanout_keeps_pushdown_and_pruning(spark, monkeypatch):
    """The repartition must not cost the scan its pushed filters or its
    pruned ReadSchema — the two §6 properties test_plans.py pins on the
    un-fanned layout."""
    import clickhouse_build_spark.catalog as cmod

    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    cat = Catalog(spark, SF_SMOKE)
    df = cat.wide("events").filter("event_type = 'view'").select("event_id")
    plan = _plan(df)
    assert "RoundRobinPartitioning" in plan
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,view)]" in plan
    assert "ReadSchema: struct<event_id:bigint,event_type:string>" in plan


def test_events_default_plan_unfanned(spark, monkeypatch):
    """Cheap events consumers keep the r16 plan: no exchange above the
    scan unless the consumer opted in (VERDICT r17 #1)."""
    import clickhouse_build_spark.catalog as cmod

    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    cat = Catalog(spark, SF_SMOKE)
    assert "RoundRobinPartitioning" not in _plan(cat.load("events"))
    assert "RoundRobinPartitioning" in _plan(cat.wide("events"))


def test_wide_views_swap_and_restore(spark, monkeypatch):
    """wide_views points the temp view at the fanned frame for the
    duration of the block (eager spark.sql analysis captures it) and
    restores the plain view after."""
    import clickhouse_build_spark.catalog as cmod

    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    cat = Catalog(spark, SF_SMOKE).register_all()
    with cat.wide_views("events"):
        inside = spark.sql("SELECT event_id FROM events")
    after = spark.sql("SELECT event_id FROM events")
    assert "RoundRobinPartitioning" in _plan(inside)
    assert "RoundRobinPartitioning" not in _plan(after)


def test_fanout_row_values_unchanged(spark, monkeypatch):
    import clickhouse_build_spark.catalog as cmod

    base = Catalog(spark, SF_SMOKE).load("events")
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    fanned = Catalog(spark, SF_SMOKE).wide("events")
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # multiset compare (ADVICE r17): a repartition bug that duplicated
    # or dropped one copy of a repeated row must fail, not vanish in a
    # set
    a = Counter(tuple(r) for r in base.collect())
    b = Counter(tuple(r) for r in fanned.collect())
    assert a == b
