"""Unit tests for the dialect expression library (SURVEY §2.8 F1-F9)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_build_spark.functions.dialect import (
    coalesce_sum0,
    empty_,
    if_,
    if_empty_label,
    month_start,
    to_date_,
    to_f64,
)


def test_if_empty_label_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "Food")], ["id", "category"]
    )
    out = {
        r["id"]: r["label"]
        for r in df.select(
            "id", if_empty_label("category").alias("label")
        ).collect()
    }
    assert out == {1: "Uncategorized", 2: "Uncategorized", 3: "Food"}


def test_empty_matches_clickhouse_semantics(spark):
    df = spark.createDataFrame([(None,), ("",), ("x",)], ["s"])
    got = [r[0] for r in df.select(empty_("s")).collect()]
    assert got == [True, True, False]


def test_coalesce_sum0_over_empty_relation(spark):
    df = spark.createDataFrame([(1.5,)], ["amount"]).filter(F.lit(False))
    [row] = df.agg(coalesce_sum0("amount").alias("total")).collect()
    assert row["total"] == 0.0


def test_month_start_returns_first_of_month_date(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 17, 13, 45),)], ["ts"]
    )
    [row] = df.select(month_start("ts").alias("m")).collect()
    assert row["m"] == dt.date(2024, 3, 1)


def test_if_and_casts(spark):
    df = spark.createDataFrame([("5", "2024-01-02")], ["n", "d"])
    [row] = df.select(
        if_(F.lit(True), F.lit("a"), F.lit("b")).alias("i"),
        to_f64("n").alias("f"),
        to_date_("d").alias("dd"),
    ).collect()
    assert row["i"] == "a"
    assert row["f"] == 5.0
    assert row["dd"] == dt.date(2024, 1, 2)


def test_apply_column_defaults_fills_and_adds(spark):
    """F8: DDL-default injection at write time — NULLs filled, absent
    columns added, present values untouched."""
    from clickhouse_build_spark.functions.dialect import (
        apply_column_defaults,
        current_date_,
        now_,
    )

    df = spark.createDataFrame(
        [(1, dt.date(2020, 5, 5)), (2, None)], "id long, d date"
    )
    out = apply_column_defaults(
        df, {"d": current_date_(), "created_at": now_()}
    ).collect()
    today = dt.date.today()
    by_id = {r.id: r for r in out}
    assert by_id[1].d == dt.date(2020, 5, 5)  # existing value untouched
    assert by_id[2].d == today  # NULL filled with the default
    assert all(r.created_at is not None for r in out)  # column added


def test_limit_by_takes_first_n_per_key(spark):
    from clickhouse_build_spark.functions.dialect import limit_by
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", i) for i in range(2)],
        "k string, v int",
    )
    out = limit_by(df, 3, by="k", order_by=F.desc("v"))
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("a", 4), ("b", 0), ("b", 1)]


def test_limit_by_requires_explicit_order(spark):
    from clickhouse_build_spark.functions.dialect import limit_by
    import pytest

    df = spark.range(3).withColumn("k", F.lit("x"))
    with pytest.raises(ValueError):
        limit_by(df, 1, by="k")
