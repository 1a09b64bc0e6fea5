"""End-to-end on the reference's LITERAL workload: the expenses app.

Replays the reference's full migration story on this engine:
scan the eval app → plan replication → replicate an expenses table
(snapshot + CDC batch) → run the four analytical queries the scanner
found (``eval/scanner/ground_truth.json``), built with the dialect
helpers (F1–F9) — and validate each against DuckDB on the replica
parquet, both PG-shaped and CH-shaped where the dialects differ.

The expenses rows mirror the reference's seed script distributions
(``eval_repos/pg-expense-direct/scripts/seed-database.js``) with a
fixed seed; NULL and '' categories are both planted because the
NULL-vs-empty-string divergence is SURVEY §7.4 hard part #3.
"""

from __future__ import annotations

import datetime as dt
import pathlib
import random

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_build_spark.functions.dialect import (
    coalesce_sum0,
    if_empty_label,
    month_start,
)
from clickhouse_build_spark.migrator import plan_replication
from clickhouse_build_spark.scanner import scan_repo
from clickhouse_build_spark.sources.replication import Replicator

APP = pathlib.Path("/root/reference/eval_repos/pg-expense-direct")

CATEGORIES = ["Food", "Transport", "Entertainment", "Utilities", None, ""]

EXPENSES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("description", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("category", T.StringType()),
        T.StructField("date", T.DateType()),
    ]
)


@pytest.fixture(scope="module")
def replica(spark, tmp_path_factory):
    """Scan → plan → replicate, returning the queryable replica."""
    root = tmp_path_factory.mktemp("expenses_replica")
    rng = random.Random(7)
    rows = [
        (
            i,
            f"expense {i}",
            round(rng.uniform(1, 500), 2),
            CATEGORIES[rng.randrange(len(CATEGORIES))],
            dt.date(2024, 1, 1) + dt.timedelta(days=rng.randrange(180)),
        )
        for i in range(1, 501)
    ]
    src = spark.createDataFrame(rows, EXPENSES_SCHEMA).coalesce(4)

    if APP.is_dir():
        plan = plan_replication(scan_repo(str(APP)), replication_mode="cdc")
        [mapping] = plan.to_mappings()
        assert mapping.target_table == "expenses"
    else:
        from clickhouse_build_spark.sources.replication import TableMapping

        mapping = TableMapping("public", "expenses", "expenses")

    rep = Replicator(
        spark=spark,
        target_root=str(root),
        key_cols=["id"],
        version_col="date",
        n_buckets=8,
    )
    rep.snapshot(src, mapping)
    # one CDC batch: an update and two inserts, as the app would produce
    changes = spark.createDataFrame(
        [
            (1, "expense 1 (edited)", 42.0, "Food", dt.date(2024, 7, 1)),
            (501, "expense 501", 10.5, None, dt.date(2024, 7, 2)),
            (502, "expense 502", 99.99, "", dt.date(2024, 7, 3)),
        ],
        EXPENSES_SCHEMA,
    )
    rep.apply_changes(changes, mapping)

    df = rep.read(mapping)
    df.createOrReplaceTempView("expenses")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW expenses AS SELECT * EXCLUDE (bucket) "
        f"FROM read_parquet('{root}/expenses/bucket=*/*.parquet')"
    )
    return df, con


def _match(spark_df, con, sql):
    from tests.oracle_compare import compare

    ok, msg = compare(spark_df, con, sql)
    assert ok, msg


def test_stats_total(replica):
    """Query 1: COUNT + COALESCE(SUM) (ground_truth.json q1, F3/A10)."""
    df, con = replica
    got = df.agg(
        F.count("*").alias("count"),
        # round(6) on both sides: amounts have 2 decimals, so the true sum
        # sits on the 0.01 grid and both engines' FP sums snap to it —
        # tie-free under the full-precision compare
        F.round(coalesce_sum0("amount"), 6).alias("total"),
    )
    _match(got, con, "SELECT count(*) AS count, round(COALESCE(SUM(amount), 0), 6) AS total FROM expenses")


def test_stats_by_category_ch_semantics(replica):
    """Query 2: category rollup with the CH if(empty(...)) label — NULL
    and '' must land in the same 'Uncategorized' group (A9, §7.4 #3)."""
    df, con = replica
    got = (
        df.groupBy(if_empty_label("category").alias("category"))
        .agg(
            F.count("*").alias("count"),
            F.round(coalesce_sum0("amount"), 6).alias("total"),
        )
    )
    _match(
        got,
        con,
        """
        SELECT CASE WHEN category IS NULL OR category = ''
                    THEN 'Uncategorized' ELSE category END AS category,
               count(*) AS count, round(sum(amount), 6) AS total
        FROM expenses GROUP BY 1
        """,
    )
    cats = {r.category for r in got.collect()}
    assert "Uncategorized" in cats and "" not in cats


def test_stats_by_month(replica):
    """Query 3: DATE_TRUNC month rollup, CH-shaped Date month (F1)."""
    df, con = replica
    got = df.groupBy(month_start("date").alias("month")).agg(
        F.count("*").alias("count"),
        F.round(coalesce_sum0("amount"), 6).alias("total"),
    )
    _match(
        got,
        con,
        """
        SELECT CAST(date_trunc('month', date) AS DATE) AS month,
               count(*) AS count, round(sum(amount), 6) AS total
        FROM expenses GROUP BY 1
        """,
    )


def test_stats_daily_top30(replica):
    """Query 4: daily rollup ORDER BY date DESC LIMIT 30 (A4/O5)."""
    df, con = replica
    got = (
        df.groupBy("date")
        .agg(
            F.count("*").alias("count"),
            F.round(coalesce_sum0("amount"), 6).alias("total"),
        )
        .orderBy(F.desc("date"))
        .limit(30)
    )
    _match(
        got,
        con,
        """
        SELECT date, count(*) AS count, round(sum(amount), 6) AS total
        FROM expenses GROUP BY 1 ORDER BY date DESC LIMIT 30
        """,
    )


def test_cdc_batch_applied(replica):
    df, _ = replica
    assert df.count() == 502  # 500 + 2 inserts
    [r] = df.filter(F.col("id") == 1).collect()
    assert r.description == "expense 1 (edited)"
