"""Window-function queries (SURVEY §2.5).

The reference's only window-function evidence is the capability claim in
``README.md:23`` ("aggregations, GROUP BY, window functions") plus the
internal CDC need (``row_number() OVER (PARTITION BY key ORDER BY version
DESC) = 1``, SURVEY S4/C3). This module maps the standard families once:
ranking, analytic (lag/lead), and framed aggregates.

Scale: a window partitioned by a key shuffles once on that key and sorts
within partitions — same cost envelope as a groupBy on the key. The
global-window variant (nation ranking) is only safe because its input is
pre-aggregated to |nations| rows; never apply an unpartitioned window to
a fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.functions.dialect import round2
from clickhouse_build_spark.plans.registry import query


@query(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window", "ranking"),
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 rows per group via row_number (the grouped
    top-k idiom; also the exact shape of the CDC dedup rule C3).

    Deterministic tiebreak on o_orderkey (SURVEY §7.4 #5).
    """
    orders = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", round2("o_totalprice").alias("o_totalprice"), "rn")
    )


@query(
    "customer_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "analytic", "lag"),
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: days since the customer's previous order (lag)."""
    orders = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    prev = F.lag(F.col("o_orderdate")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias("gap_days"),
    )


@query(
    "running_customer_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
    tags=("window", "framed-aggregate"),
)
def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed aggregate: running per-customer revenue
    (``rowsBetween(unboundedPreceding, currentRow)``)."""
    orders = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        round2(F.sum("o_totalprice").over(w)).alias("running_total"),
    )


@query(
    "nation_revenue_ranks",
    oracle="""
    SELECT nation, revenue,
           rank() OVER (ORDER BY revenue DESC) AS rnk,
           dense_rank() OVER (ORDER BY revenue DESC) AS drnk
    FROM (
      SELECT n_name AS nation, round(sum(o_totalprice), 2) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    )
    """,
    tags=("window", "ranking", "join"),
)
def nation_revenue_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a pre-aggregated input.

    Scale: the unpartitioned window runs on |nations| = 25 rows (post
    aggregation), so the single-partition sort is trivial by design.
    """
    t = load_tables(spark, sf_dir)
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(round2(F.sum("o_totalprice")).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"))
    return rev.select(
        "nation",
        "revenue",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "order_value_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "distribution", "ntile"),
)
def order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile quartiles, percent_rank, cume_dist,
    and lead — ordered with an orderkey tiebreak so every rank is
    deterministic (SURVEY §7.4 hard part #5).

    Scale: one shuffle on the partition key; each priority group sorts
    independently.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "customer_order_span",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderdate) OVER w AS first_order,
           last_value(o_orderdate) OVER w AS last_order,
           count(*) OVER w AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "first-last", "frame"),
)
def customer_order_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame — the full-span
    analytic frame (last_value is wrong without the explicit frame; the
    default frame stops at CURRENT ROW)."""
    orders = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w).alias("last_order"),
        F.count("*").over(w).alias("n_orders"),
    ).distinct()


@query(
    "rolling_30day_customer_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ), 2) AS spend_30d
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def rolling_30day_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: each order sums the customer's
    spend in the trailing 30 days — a value-based frame (all rows in
    the range, regardless of row count), vs the ROWS frames elsewhere.

    Spark range frames need a numeric ordering key, so the date becomes
    epoch days; ties (same-day orders) are summed together on both
    engines, which is exactly RANGE semantics.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        round2(F.sum("o_totalprice").over(w)).alias("spend_30d"),
    )
