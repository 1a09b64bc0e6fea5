"""Relational completeness over the star schema (SURVEY §2.3, §7.2 phase 4).

The reference workload has no joins — but its scanner classifies ANY
aggregate/multi-table SQL as analytical (``src/prompts/scanner.py:21,27``)
and its external eval targets (cal.com, dub, twenty…) join heavily, so
joins, AVG/MIN/MAX, DISTINCT, HAVING, set ops, and subquery forms are
in-scope for the engine. Shapes follow TPC-H on the driver's star schema.

Scale notes per query are inline. The standing rules:
- dimension joins (region, nation) get explicit ``F.broadcast`` — they
  are fixed-cardinality at any SF;
- fact-fact joins (orders⋈lineitem) stay sort-merge on the join key and
  rely on AQE for skew;
- every aggregate is expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.functions.dialect import round2
from clickhouse_build_spark.plans.registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                   AS avg_qty,
           round(avg(l_extendedprice), 2)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "aggregate", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate grouped scan with computed
    expressions (SURVEY A1-A8 in one plan).

    Scale: single lineitem scan; filter pushes to parquet; 8 aggregates
    compute map-side partially, shuffle carries 2 short group keys ×
    ~4 groups — bytes, not gigabytes, at 100 TB.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round2(F.sum("l_quantity")).alias("sum_qty"),
            round2(F.sum("l_extendedprice")).alias("sum_base_price"),
            round2(F.sum(disc_price)).alias("sum_disc_price"),
            round2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            round2(F.avg("l_quantity")).alias("avg_qty"),
            round2(F.avg("l_extendedprice")).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "topk", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + grouped agg + top-k by aggregate.

    Scale: customer filters on segment BEFORE the join (pushdown), so
    the orders⋈customer join's build side is ~1/5 of customers — AQE
    will broadcast it at moderate SF; orders⋈lineitem is the fact-fact
    sort-merge join on the natural key. LIMIT 10 plans as
    TakeOrderedAndProject (no global sort). Tiebreak on l_orderkey keeps
    the cut deterministic (SURVEY §7.4 #5).
    """
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("relational", "join", "broadcast", "tpch"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join through region→nation→supplier.

    Scale: region (5 rows) and nation (25 rows) are explicitly
    broadcast — they stay fixed-size at 100 TB, so that join never
    shuffles the fact side. The customer/orders/lineitem chain joins on
    its keys via sort-merge; the nationkey equality between customer and
    supplier rides along as a join condition, not an extra shuffle.
    """
    t = load_tables(spark, sf_dir)
    region = F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))
    nation = F.broadcast(t["nation"])
    asia_nations = nation.join(region, nation.n_regionkey == region.r_regionkey)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    t1 = t["customer"].join(orders, F.col("c_custkey") == F.col("o_custkey"))
    t2 = t1.join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
    t3 = t2.join(
        t["supplier"],
        (F.col("l_suppkey") == F.col("s_suppkey"))
        & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    return (
        t3.join(asia_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(coalesce(sum(l_extendedprice * l_discount), 0), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "aggregate", "pushdown", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective filtered global aggregate.

    Scale: all four predicates push to the parquet reader
    (min/max row-group skipping); only 4 of 11 lineitem columns are read.
    The aggregate reduces to one double per partition before the
    single-row final combine.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round2(
                F.coalesce(F.sum(F.col("l_extendedprice") * F.col("l_discount")), F.lit(0.0))
            ).alias("revenue")
        )
    )


@query(
    "top_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS order_cnt
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk"),
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORM-style groupBy ordered by aggregate (SURVEY A6: prisma
    ``groupBy({by, orderBy:{_sum:{amount:'desc'}}})``) with a join.

    Scale: aggregate orders by custkey FIRST (map-side partial → one row
    per customer), then join the already-reduced side to customer —
    the join input is |customers|, not |orders|.
    """
    t = load_tables(spark, sf_dir)
    per_cust = t["orders"].groupBy("o_custkey").agg(
        round2(F.sum("o_totalprice")).alias("revenue"),
        F.count("*").alias("order_cnt"),
    )
    return (
        t["customer"]
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "revenue", "order_cnt")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "part_stats_min_max_avg",
    oracle="""
    SELECT p_brand,
           round(min(p_retailprice), 2) AS min_price,
           round(max(p_retailprice), 2) AS max_price,
           round(avg(p_retailprice), 2) AS avg_price,
           round(avg(p_size), 2) AS avg_size,
           count(*) AS cnt
    FROM part
    GROUP BY p_brand
    """,
    tags=("relational", "aggregate", "A8"),
)
def part_stats_min_max_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG/MAX/MIN — the scanner's declared analytical triggers
    (SURVEY A8, ``src/prompts/scanner.py:27,30``)."""
    part = load_tables(spark, sf_dir)["part"]
    return part.groupBy("p_brand").agg(
        round2(F.min("p_retailprice")).alias("min_price"),
        round2(F.max("p_retailprice")).alias("max_price"),
        round2(F.avg("p_retailprice")).alias("avg_price"),
        round2(F.avg("p_size")).alias("avg_size"),
        F.count("*").alias("cnt"),
    )


@query(
    "distinct_counts",
    oracle="""
    SELECT count(DISTINCT l_suppkey) AS suppliers,
           count(DISTINCT l_partkey) AS parts,
           count(DISTINCT l_returnflag) AS flags
    FROM lineitem
    """,
    tags=("relational", "distinct"),
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation (beyond-parity surface SURVEY §2.4 notes as
    free in Spark). At 100 TB prefer ``approx_count_distinct`` (HLL, no
    expand) — exact distinct is kept here because the oracle is exact.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.agg(
        F.countDistinct("l_suppkey").alias("suppliers"),
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_returnflag").alias("flags"),
    )


@query(
    "status_priority_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "rollup"),
)
def status_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (beyond-parity; SURVEY §2.4 'free in Spark').

    Scale: Spark expands rollup groups before the shuffle but they still
    partial-aggregate map-side; cardinality is |status|×|priority|.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"),
        round2(F.sum("o_totalprice")).alias("total"),
    )


@query(
    "big_spender_segments_having",
    oracle="""
    SELECT c_mktsegment, count(*) AS cnt, round(avg(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    HAVING count(*) > 100 AND avg(c_acctbal) > 0
    """,
    tags=("relational", "having"),
)
def big_spender_segments_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation filter (beyond-parity, SURVEY §2.4)."""
    cust = load_tables(spark, sf_dir)["customer"]
    return (
        cust.groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"), round2(F.avg("c_acctbal")).alias("avg_bal"))
        .filter((F.col("cnt") > 100) & (F.col("avg_bal") > 0))
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("relational", "anti-join"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join — Spark's native anti join avoids
    materializing the subquery. Scale: anti join shuffles only the keys
    of the right side; with AQE it broadcasts when the distinct-key set
    is small."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "urgent_order_customers_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=("relational", "semi-join"),
)
def urgent_order_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / IN-subquery as a left-semi join (SURVEY §2.3)."""
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "nation_account_union",
    oracle="""
    SELECT n_nationkey AS nationkey, 'customer' AS side,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    UNION ALL
    SELECT n_nationkey AS nationkey, 'supplier' AS side,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1
    """,
    tags=("relational", "set-op"),
)
def nation_account_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two grouped aggregates (set-op surface, SURVEY §2.7).

    Scale: each branch aggregates independently (parallel stages); the
    union is a zero-shuffle concatenation of partitions.
    """
    t = load_tables(spark, sf_dir)
    nation = F.broadcast(t["nation"])
    cust = (
        t["customer"]
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_nationkey").alias("nationkey"))
        .agg(round2(F.sum("c_acctbal")).alias("total_bal"))
        .select("nationkey", F.lit("customer").alias("side"), "total_bal")
    )
    supp = (
        t["supplier"]
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_nationkey").alias("nationkey"))
        .agg(round2(F.sum("s_acctbal")).alias("total_bal"))
        .select("nationkey", F.lit("supplier").alias("side"), "total_bal")
    )
    return cust.unionByName(supp)
