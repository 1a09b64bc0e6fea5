"""Parity queries — the reference's canonical analytical surface.

The reference's whole workload is four stats queries + one filtered list
over the ``expenses`` table (``eval_repos/pg-expense-direct/app/api/
expenses/stats/route.ts:27-67``, ``route.ts:42-73``; golden CH forms in
``src/corpus/orm_none.txt:447-541``). Per FIXTURES.md §2 the driver's
``orders`` table plays the expenses role:

    amount → o_totalprice, category → o_orderpriority,
    date → o_orderdate, id → o_orderkey.

Each query exists in PG and CH dialect in the reference; the engine
computes ONE canonical result (SURVEY §7.4 hard part #1) using the
dialect library in ``functions/dialect.py``.

Scale notes (100 TB): every query here is a single scan → (optional
filter) → partial agg → final agg. Filters and projections reach the
parquet scan via Catalyst pushdown; the group-by aggregates are map-side
partial so the shuffle carries only group keys. No joins, no collects.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.functions.dialect import (
    coalesce_sum0,
    if_empty_label,
    month_start,
    round2,
)
from clickhouse_build_spark.plans.registry import query

# The canonical date-range filter exercised by every stats query variant
# (``buildWhereClause``, ``corpus/orm_none.txt:427-442``). Fixed literals
# so the oracle SQL can repeat them.
START_DATE = "1995-01-01"
END_DATE = "1996-12-31"
CATEGORY = "1-URGENT"
_RANGE_SQL = f"o_orderdate >= TIMESTAMP '{START_DATE} 00:00:00' AND o_orderdate <= TIMESTAMP '{END_DATE} 23:59:59'"


def and_all(*conds: Column) -> Column:
    """Dynamic conjunctive predicate composition (SURVEY P6) — the engine
    form of the reference's ``WHERE 1=1`` + optional ANDs pattern."""
    return reduce(Column.__and__, conds, F.lit(True))


def _orders_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.filter(
        and_all(
            F.col("o_orderdate") >= F.lit(f"{START_DATE} 00:00:00").cast("timestamp_ntz"),
            F.col("o_orderdate") <= F.lit(f"{END_DATE} 23:59:59").cast("timestamp_ntz"),
        )
    )


@query(
    "stats_total",
    oracle=f"""
    SELECT count(*) AS cnt,
           round(coalesce(sum(o_totalprice), 0), 2) AS total
    FROM orders
    WHERE {_RANGE_SQL}
    """,
    tags=("parity", "aggregate", "A1"),
)
def stats_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate, no GROUP BY (SURVEY A1/F3).

    Ref: ``SELECT COUNT(*) as count, COALESCE(SUM(amount), 0) as total
    FROM expenses ${where}`` — ``…stats/route.ts:27-30``; CH form
    ``corpus/orm_none.txt:447``.
    """
    return _orders_in_range(spark, sf_dir).agg(
        F.count("*").alias("cnt"),
        round2(coalesce_sum0("o_totalprice")).alias("total"),
    )


@query(
    "stats_by_category",
    oracle=f"""
    SELECT CASE WHEN o_orderpriority IS NULL OR o_orderpriority = ''
                THEN 'Uncategorized' ELSE o_orderpriority END AS category,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE {_RANGE_SQL}
    GROUP BY 1
    """,
    tags=("parity", "groupby", "A2", "A9"),
)
def stats_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY column + COUNT + SUM with the missing-label policy
    (SURVEY A2/A9/F2): NULL and '' both label as 'Uncategorized', the
    agreed semantics between PG ``COALESCE`` and CH ``if(empty(...))``.

    Ref: ``…stats/route.ts:33-42``; CH ``corpus/orm_none.txt:463-469``.
    """
    return (
        _orders_in_range(spark, sf_dir)
        .groupBy(if_empty_label("o_orderpriority").alias("category"))
        .agg(
            F.count("*").alias("cnt"),
            round2(F.sum("o_totalprice")).alias("total"),
        )
        .orderBy(F.desc("total"))
    )


@query(
    "stats_by_month",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE {_RANGE_SQL}
    GROUP BY 1
    """,
    tags=("parity", "groupby-expr", "A3", "F1"),
)
def stats_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY expression — monthly rollup (SURVEY A3/F1).

    Ref: PG ``GROUP BY DATE_TRUNC('month', date)``
    (``…stats/route.ts:45-54``); CH ``toStartOfMonth`` grouping by the
    output alias (``corpus/orm_none.txt:484-490``).
    """
    return (
        _orders_in_range(spark, sf_dir)
        .groupBy(month_start("o_orderdate").alias("month"))
        .agg(
            F.count("*").alias("cnt"),
            round2(F.sum("o_totalprice")).alias("total"),
        )
        .orderBy(F.desc("month"))
    )


@query(
    "stats_daily_top30",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS day,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE {_RANGE_SQL}
    GROUP BY 1
    ORDER BY day DESC
    LIMIT 30
    """,
    tags=("parity", "topk", "A4", "O5"),
)
def stats_daily_top30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: daily rollup, most recent 30 days (SURVEY A4/O5).

    Ref: ``… GROUP BY date ORDER BY date DESC LIMIT 30``
    (``…stats/route.ts:57-67``; CH ``corpus/orm_none.txt:504-511``).
    Spark plans TakeOrderedAndProject — a true distributed top-k, no
    global sort. Group keys are unique so the LIMIT boundary is
    deterministic.
    """
    return (
        _orders_in_range(spark, sf_dir)
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count("*").alias("cnt"),
            round2(F.sum("o_totalprice")).alias("total"),
        )
        .orderBy(F.desc("day"))
        .limit(30)
    )


@query(
    "list_filtered",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 2) AS o_totalprice, o_orderdate
    FROM orders
    WHERE {_RANGE_SQL} AND o_orderpriority = '{CATEGORY}'
    """,
    tags=("parity", "projection", "P1", "P4", "P5", "P6", "O1", "O2"),
)
def list_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered list with explicit projection and deterministic ordering
    (SURVEY P1/P4-P6, O1/O2).

    Ref: ``SELECT id, description, amount, category, date FROM expenses
    [filters] ORDER BY date DESC, id DESC``
    (``…expenses/route.ts:42-73``; tiebreak policy
    ``corpus/orm_none.txt:541``). The dynamic WHERE composition mirrors
    ``buildWhereClause`` (``corpus/orm_none.txt:427-442``).

    Scale: projection + all three predicates push down to the parquet
    scan (PushedFilters); only 5 of 6 columns are read.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    conds = and_all(
        F.col("o_orderdate") >= F.lit(f"{START_DATE} 00:00:00").cast("timestamp_ntz"),
        F.col("o_orderdate") <= F.lit(f"{END_DATE} 23:59:59").cast("timestamp_ntz"),
        F.col("o_orderpriority") == F.lit(CATEGORY),
    )
    return (
        orders.filter(conds)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            round2("o_totalprice").alias("o_totalprice"),
            "o_orderdate",
        )
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    )


@query(
    "stats_by_month_pg_shape",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE {_RANGE_SQL}
    GROUP BY 1
    """,
    tags=("parity", "dialect", "pg-shape", "F1"),
)
def stats_by_month_pg_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PG-dialect presentation of the monthly rollup (SURVEY §7.4
    hard part #1): PG ``DATE_TRUNC('month', date)`` returns a
    *timestamp*, CH ``toStartOfMonth`` returns a *Date*. The engine's
    canonical result is the CH-shaped ``stats_by_month``
    (``functions.dialect.month_start`` → DateType); this twin is the
    PG presentation — same groups, same aggregates, timestamp-shaped
    month — so both dialect surfaces are first-class and both oracle-
    checked (``month: Date | string`` in the reference's result typing,
    ``corpus/orm_prismaorm.txt:388-391``)."""
    return (
        _orders_in_range(spark, sf_dir)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count("*").alias("cnt"),
            round2(F.sum("o_totalprice")).alias("total"),
        )
        .orderBy(F.desc("month"))
    )


@query(
    "customer_latest_order_argmax",
    oracle="""
    SELECT o_custkey,
           (max(struct_pack(b := o_orderdate, v := o_orderkey))).v AS latest_orderkey,
           (min(struct_pack(b := o_orderdate, v := o_orderkey))).v AS first_orderkey,
           count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent_cnt,
           round(COALESCE(sum(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 0), 2)
             AS urgent_total
    FROM orders
    GROUP BY 1
    """,
    tags=("parity", "dialect", "argmax", "count-if"),
)
def customer_latest_order_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse aggregate-combinator surface: ``argMax``/``argMin``
    (value at max/min of another column, struct-max so same-date ties
    break on the orderkey identically in both engines) and the ``-If``
    combinators ``countIf``/``sumIf`` — all one partially-aggregated
    pass (``functions.dialect``)."""
    from clickhouse_build_spark.functions.dialect import (
        arg_max,
        arg_min,
        count_if,
        sum_if,
    )

    orders = load_tables(spark, sf_dir)["orders"]
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return orders.groupBy("o_custkey").agg(
        arg_max("o_orderkey", "o_orderdate").alias("latest_orderkey"),
        arg_min("o_orderkey", "o_orderdate").alias("first_orderkey"),
        count_if(urgent).alias("urgent_cnt"),
        round2(sum_if("o_totalprice", urgent)).alias("urgent_total"),
    )
