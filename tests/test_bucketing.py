"""Bucketed co-located joins: same-bucketed fact tables must join with
no shuffle Exchange on either side, and results must equal the plain
join."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.sources.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from clickhouse_build_spark.catalog import load_tables

    t = load_tables(spark, SF_SMOKE)
    write_bucketed(
        t["orders"], "orders_b", "o_orderkey", 8, sort_cols=["o_orderkey"]
    )
    write_bucketed(
        t["lineitem"], "lineitem_b", "l_orderkey", 8, sort_cols=["l_orderkey"]
    )
    yield "orders_b", "lineitem_b"
    for tbl in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join is the sort-merge it would be on two
    # 100 TB fact tables — the property under test is that bucketing
    # removes the SMJ's shuffles, which broadcast would mask at test SF
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = (
            spark.table(lt)
            .join(spark.table(rt), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    # neither bucketed side shuffles: the only Exchange node in the
    # whole plan is the post-join aggregation's (formatted explain
    # prints each node twice — tree + detail — so count node headers)
    import re

    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) <= 1, plan[:2000]


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    from clickhouse_build_spark.catalog import load_tables

    lt, rt = bucketed_tables
    t = load_tables(spark, SF_SMOKE)
    got = (
        bucketed_join(spark, lt, rt, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    want = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
