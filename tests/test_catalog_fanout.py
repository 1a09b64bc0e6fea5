"""Scan fan-out (r17 optimization): a parquet layout with fewer row
groups than cores starves the scan stage — every narrow expression runs
on one task. The catalog repartitions such scans to the session's core
count, derived from the footer (scale-adaptive: >= cores row groups, an
oversized table, or SPARK_GRAFT_SCAN_FANOUT=off leave the plan alone).
"""

from __future__ import annotations

import contextlib
import io
import os

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

    # single-row-group mid-size table -> fan out to every core
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    assert cat._fanout_partitions("events") == cores
    # layout already feeds the cores -> structural no-op
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (10**12, cores))
    assert cat._fanout_partitions("events") == 0
    # broadcast-sized dim -> a 1-task scan is free, skip the exchange
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (10_000, 1))
    assert cat._fanout_partitions("events") == 0
    # oversized single-row-group table -> exchange no longer trivial
    monkeypatch.setattr(
        cmod, "_parquet_layout", lambda p: (cores * 64 * 1024 * 1024, 1)
    )
    assert cat._fanout_partitions("events") == 0
    # narrow numeric fact tables never fan out (catalog annotation)
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    assert cat._fanout_partitions("lineitem") == 0
    assert cat._fanout_partitions("orders") == 0


def test_fanout_env_kill_switch(fresh_catalog, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_FANOUT", "off")
    assert fresh_catalog._fanout_partitions("events") == 0


def test_fanout_keeps_pushdown_and_pruning(spark, monkeypatch):
    """The repartition must not cost the scan its pushed filters or its
    pruned ReadSchema — the two §6 properties test_plans.py pins on the
    un-fanned layout."""
    import clickhouse_build_spark.catalog as cmod

    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    cat = Catalog(spark, SF_SMOKE)
    df = cat.load("events").filter("event_type = 'view'").select("event_id")
    plan = _plan(df)
    assert "RoundRobinPartitioning" in plan
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,view)]" in plan
    assert "ReadSchema: struct<event_id:bigint,event_type:string>" in plan


def test_fanout_row_values_unchanged(spark, monkeypatch):
    import clickhouse_build_spark.catalog as cmod

    base = Catalog(spark, SF_SMOKE).load("events")
    monkeypatch.setattr(cmod, "_parquet_layout", lambda p: (2_000_000, 1))
    fanned = Catalog(spark, SF_SMOKE).load("events")
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    a = {tuple(r) for r in base.collect()}
    b = {tuple(r) for r in fanned.collect()}
    assert a == b
