"""Replication semantics tests (SURVEY S3-S5, C1-C4; FIXTURES.md §4):
snapshot copies all rows; cdc = snapshot + changes resolving to
latest-version-per-key with deletes honored; cdc_only applies changes
without backfill; merges only rewrite touched buckets.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from clickhouse_build_spark.sources.replication import (
    ReplicationMode,
    Replicator,
    TableMapping,
    latest_per_key,
)

MAPPING = TableMapping("public", "expenses", "expenses")

CHANGE_SCHEMA = (
    "id long, description string, amount double, category string, "
    "version long, _op string"
)


@pytest.fixture()
def source(spark):
    rows = [
        (1, "lunch", 12.50, "Food", 1),
        (2, "taxi", 30.00, "Transport", 1),
        (3, "book", 19.99, "Education", 1),
    ]
    return spark.createDataFrame(
        rows, ["id", "description", "amount", "category", "version"]
    )


def _replicator(spark, tmp_path, n_buckets=8):
    return Replicator(
        spark=spark,
        target_root=str(tmp_path),
        key_cols=["id"],
        version_col="version",
        n_buckets=n_buckets,
    )


def test_snapshot_copies_all_rows(spark, tmp_path, source):
    rep = _replicator(spark, tmp_path)
    path = rep.replicate(source, MAPPING, mode="snapshot")
    got = rep.read(MAPPING)
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]
    assert os.path.isdir(path)
    assert any("ordering key" in a for a in rep.assumptions)


def test_cdc_upsert_and_delete(spark, tmp_path, source):
    rep = _replicator(spark, tmp_path)
    changes = spark.createDataFrame(
        [
            (2, "taxi home", 35.00, "Transport", 2, None),  # update id=2
            (3, None, None, None, 2, "d"),  # delete id=3
            (4, "coffee", 4.50, "Food", 1, None),  # insert id=4
        ],
        CHANGE_SCHEMA,
    )
    rep.replicate(source, MAPPING, mode=ReplicationMode.CDC, changes=changes)
    got = {r["id"]: r for r in rep.read(MAPPING).collect()}
    assert sorted(got) == [1, 2, 4]
    assert got[2]["description"] == "taxi home"
    assert got[2]["version"] == 2
    assert got[4]["amount"] == 4.50


def test_cdc_only_no_backfill(spark, tmp_path):
    rep = _replicator(spark, tmp_path)
    changes = spark.createDataFrame(
        [(10, "x", 1.0, "Other", 1, None)],
        CHANGE_SCHEMA,
    )
    rep.replicate(
        spark.createDataFrame([], "id long"), MAPPING, mode="cdc_only", changes=changes
    )
    assert [r["id"] for r in rep.read(MAPPING).collect()] == [10]


def test_merge_latest_version_wins_with_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 3), (1, "c", 2), (2, "x", 1)],
        ["id", "val", "version"],
    )
    got = {
        r["id"]: r["val"]
        for r in latest_per_key(df, ["id"], "version").collect()
    }
    assert got == {1: "b", 2: "x"}


def test_merge_rewrites_only_touched_buckets(spark, tmp_path, source):
    rep = _replicator(spark, tmp_path, n_buckets=8)
    rep.snapshot(source, MAPPING)
    path = os.path.join(str(tmp_path), "expenses")
    before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    changes = spark.createDataFrame(
        [(1, "lunch v2", 13.00, "Food", 2, None)],
        CHANGE_SCHEMA,
    )
    rep.apply_changes(changes, MAPPING)
    after = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    changed = [d for d in before if after.get(d) != before[d]]
    untouched = [d for d in before if after.get(d) == before[d]]
    assert len(changed) == 1  # only the bucket containing id=1
    assert untouched  # other buckets' files were not rewritten
    got = {r["id"]: r["description"] for r in rep.read(MAPPING).collect()}
    assert got[1] == "lunch v2"
    assert sorted(got) == [1, 2, 3]


def test_engine_refuses_oltp_writes(spark):
    from clickhouse_build_spark.engine import AnalyticalWriteError, Engine

    eng = Engine("/root/testdata/sf0.001", spark=spark)
    with pytest.raises(AnalyticalWriteError):
        eng.insert({"id": 1, "amount": 2.0})


def test_engine_sql_with_params(spark):
    from clickhouse_build_spark.engine import Engine

    eng = Engine("/root/testdata/sf0.001", spark=spark)
    df = eng.sql(
        "SELECT count(*) AS cnt FROM orders WHERE o_orderpriority = :prio",
        params={"prio": "1-URGENT"},
    )
    [row] = df.collect()
    assert row["cnt"] > 0


def test_engine_table_mapping_renames_view(spark):
    from clickhouse_build_spark.engine import Engine

    eng = Engine(
        "/root/testdata/sf0.001",
        spark=spark,
        table_mappings={"orders": "orders_replica"},
    )
    [row] = eng.sql("SELECT count(*) AS cnt FROM orders_replica").collect()
    assert row["cnt"] > 0


def test_engine_to_rows_and_registry(spark):
    """S9/F9: the result sink returns app-shaped dicts with native
    int/float/date types; register/run exposes the query inventory."""
    import datetime as dt

    from clickhouse_build_spark.engine import Engine
    from pyspark.sql import functions as F

    eng = Engine(SF_SMOKE, spark=spark)

    def monthly(s, sf_dir):
        return (
            eng.table("orders")
            .groupBy(F.trunc("o_orderdate", "month").alias("month"))
            .agg(F.count("*").alias("count"), F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy(F.desc("month"))
        )

    eng.register("monthly_stats", monthly)
    rows = eng.to_rows(eng.run("monthly_stats"), limit=3)
    assert len(rows) == 3
    for r in rows:
        assert set(r) == {"month", "count", "total"}
        assert isinstance(r["count"], int)  # F9: counts as native int
        assert isinstance(r["total"], float)  # F9: totals as native float
        assert isinstance(r["month"], dt.date)
    # rows arrive in query order (the app renders them as returned)
    months = [r["month"] for r in rows]
    assert months == sorted(months, reverse=True)
