"""Join-shape completion (SURVEY §2.3): the shapes round 1 didn't
register — LEFT OUTER with a filtered join condition (TPC-H q13), FULL
OUTER reconciliation, aggregate-view + scalar-max (q15), global-fraction
scalar subquery (q11 shape), nested semi-join chain (q20 shape), and
per-group conditional share (q8 shape).

The reference workload itself is single-table (SURVEY §2.3: joins are
implied in-scope via the scanner's INCLUDE rules, ``src/prompts/
scanner.py:21,27``), so these follow TPC-H's canonical plan shapes on
the driver's reduced star schema. Money aggregates are integerized to
cents per row before summing (order-independent across engines — the
q7 pattern, VERDICT.md round-1 fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.registry import query


def _rev_cents():
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")


@query(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY 1
    """,
    tags=("relational", "tpch", "outer-join"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an extra predicate *inside
    the join condition* (not a post-filter — customers with only urgent
    orders must surface with count 0), then a count-of-counts
    distribution. The one plan shape where pushing the filter below the
    join changes semantics on the preserved side only.

    Scale: one shuffle on custkey for the outer join + per-customer
    count; the distribution re-aggregation is tiny (|distinct counts|
    rows). ``count(o_orderkey)`` counts non-NULL, so unmatched customers
    land in the 0 bucket — same as the oracle.
    """
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "nation_customer_supplier_balance",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust,
             CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cust_bal_cents
      FROM customer GROUP BY 1
    ),
    s AS (
      SELECT s_nationkey AS nk, count(*) AS n_supp,
             CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS supp_bal_cents
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(cust_bal_cents, 0) AS cust_bal_cents,
           COALESCE(n_supp, 0) AS n_supp,
           COALESCE(supp_bal_cents, 0) AS supp_bal_cents
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    tags=("relational", "outer-join", "full-outer"),
)
def nation_customer_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation: per-nation customer vs supplier
    presence and account balance, keeping nations that have only one
    side (COALESCE key + zero-fill) — the audit/reconciliation join
    shape the inner/semi/anti family can't express.

    Scale: both inputs are pre-aggregated to ≤|nation| rows *before*
    the full-outer join, so the unsplittable full-outer shuffle moves
    25 rows, not the fact tables.
    """
    t = load_tables(spark, sf_dir)
    c = t["customer"].groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust"),
        F.sum(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
        ).alias("cust_bal_cents"),
    )
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_supp"),
        F.sum(
            F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long")
        ).alias("supp_bal_cents"),
    )
    joined = c.join(s, "nk", "full_outer")
    return joined.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("cust_bal_cents", F.lit(0)).alias("cust_bal_cents"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.coalesce("supp_bal_cents", F.lit(0)).alias("supp_bal_cents"),
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS total_rev_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_rev_cents
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
    """,
    tags=("relational", "tpch", "scalar-subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: an aggregate view (quarterly revenue per
    supplier) filtered to its own maximum via a scalar subquery — ties
    are kept, exactly like the spec's view formulation. Integer-cents
    revenue makes the max comparison exact on both engines.

    Scale: one partial-aggregated shuffle on l_suppkey builds the view;
    the 1-row max is broadcast back (cross-join with a single-row frame,
    no second shuffle of the view). The view is PERSISTED because it
    feeds two consumers (the max and the final filter) and Catalyst
    does not reuse the exchange across the differing branches —
    without the cache the quarter's lineitem scan + aggregate runs
    twice (verified in the executed plan). The cached frame is
    |suppliers| rows of (key, bigint) — trivial at any SF.
    """
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_cents()).alias("total_rev_cents"))
        .persist()
    )
    max_rev = rev.agg(F.max("total_rev_cents").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev_cents") == F.col("max_rev"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_cents")
    )


@query(
    "q11_major_revenue_parts",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS part_rev_cents
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, part_rev_cents
    FROM pr
    WHERE part_rev_cents * 1000 >
          (SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) FROM lineitem)
    """,
    tags=("relational", "tpch", "scalar-subquery", "having"),
)
def q11_major_revenue_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose aggregate exceeds a *fraction of
    the global total* — the HAVING-against-scalar-subquery pattern.
    Comparison is ``part_cents * 1000 > total_cents`` in exact bigint
    arithmetic, so no floating fraction can tie-break differently
    across engines.

    Scale: ONE lineitem scan — the global total is the sum of the
    per-part partials (Σ groups ≡ Σ rows for an integer sum), so it
    re-aggregates the persisted |parts|-row view instead of rescanning
    the fact table; the 1-row total broadcasts back.
    """
    t = load_tables(spark, sf_dir)
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    li = t["lineitem"]
    pr = (
        li.groupBy("l_partkey")
        .agg(F.sum(cents).alias("part_rev_cents"))
        .persist()
    )
    total = pr.agg(F.sum("part_rev_cents").alias("total_cents"))
    return (
        pr.crossJoin(F.broadcast(total))
        .filter(F.col("part_rev_cents") * 1000 > F.col("total_cents"))
        .select("l_partkey", "part_rev_cents")
    )


@query(
    "q20_bulk_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
        AND l_shipdate >= DATE '1996-01-01'
      GROUP BY l_suppkey
      HAVING CAST(sum(l_quantity) AS BIGINT) > 400
    )
    """,
    tags=("relational", "tpch", "semi-join", "nested-subquery"),
)
def q20_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a nested IN chain — suppliers who moved >400
    units of Brand#3 parts since 1996. Two levels of semi-join: part
    filter into lineitem, grouped HAVING into supplier.

    Scale: the brand-filtered part keys broadcast into the lineitem
    scan (semi-join, no fact shuffle for the filter); the per-supplier
    quantity aggregate shuffles on l_suppkey (|suppliers| rows); the
    final supplier probe is a broadcast left-semi. Quantities are
    integral doubles, so the BIGINT-cast sum is exact.
    """
    t = load_tables(spark, sf_dir)
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    qualified = (
        t["lineitem"]
        .filter(F.col("l_shipdate") >= "1996-01-01")
        .join(
            F.broadcast(brand_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return t["supplier"].join(
        F.broadcast(qualified),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")


@query(
    "q8_nation_market_share",
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                         THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                         + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS nation_rev_cents,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS total_rev_cents
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY 1
    """,
    tags=("relational", "tpch", "multi-join", "conditional-agg"),
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of supplier revenue into ASIA
    customers per order year — the conditional-numerator / full-
    denominator pair inside one aggregation (the market-share pattern).
    Both sums are exact integer cents; the caller divides.

    Scale: region+nation broadcast at any SF (fixed cardinality); the
    customer-side region filter prunes before the fact joins; one
    orderkey shuffle dominates, identical to q7's profile.
    """
    t = load_tables(spark, sf_dir)
    sn = F.broadcast(
        t["nation"].select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    asia_nations = F.broadcast(
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cents = _rev_cents()
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(sn, F.col("sn_key") == F.col("s_nationkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(asia_nations, F.col("cn_key") == F.col("c_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", cents).otherwise(0)
            ).alias("nation_rev_cents"),
            F.sum(cents).alias("total_rev_cents"),
        )
    )


@query(
    "q4_priority_order_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY 1
    """,
    tags=("relational", "tpch", "semi-join", "exists"),
)
def q4_priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-order EXISTS (any returned lineitem) feeding
    a priority distribution — EXISTS at ORDER granularity, unlike the
    customer-granularity semi already covered.

    Scale: the order-date filter prunes the probe side before the
    left-semi; the lineitem side carries only (l_orderkey) after its
    own returnflag filter pushes to the scan.
    """
    t = load_tables(spark, sf_dir)
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-07-01")
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_size IN (5, 10, 15, 20)
    GROUP BY 1, 2
    """,
    tags=("relational", "tpch", "count-distinct"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    group across the part↔lineitem link — grouped COUNT(DISTINCT)
    after a join, with an exclusion predicate and an IN-list.

    Scale: both part filters push to the part scan; the filtered part
    side broadcasts; Spark expands count-distinct into a two-phase
    aggregate (partial per (group, suppkey), then final) so the shuffle
    carries deduplicated pairs, not raw lineitems.
    """
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(5, 10, 15, 20)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 5 AND 25
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("relational", "tpch", "disjunctive-predicate"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate mixing columns from
    both join sides — the disjunctive-pushdown stress test. Catalyst
    extracts the common part-only disjunction (brand/size) below the
    join and keeps the mixed residual on top; at 100 TB that pre-join
    part pruning is the difference between scanning 3 brands and all.

    Scale: part side broadcasts after its disjunctive prune; revenue in
    exact integer cents.
    """
    t = load_tables(spark, sf_dir)
    li, p = t["lineitem"], t["part"]
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(1, 10) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(5, 25) & q.between(20, 40))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH order_stats AS (
      SELECT l_orderkey AS ok,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
               AS n_supp_r
      FROM lineitem GROUP BY 1
    ),
    blamed AS (
      SELECT DISTINCT l.l_suppkey, l.l_orderkey
      FROM lineitem l JOIN order_stats s ON l.l_orderkey = s.ok
      WHERE l.l_returnflag = 'R' AND s.n_supp > 1 AND s.n_supp_r = 1
    )
    SELECT s_name, count(*) AS numwait
    FROM blamed JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY 1
    """,
    tags=("relational", "tpch", "exists-not-exists"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for returns in
    multi-supplier orders — the EXISTS(other supplier) AND NOT
    EXISTS(other supplier also at fault) composition, decorrelated into
    per-order supplier stats (n_supp > 1 AND n_supp_r = 1) exactly as
    Catalyst would rewrite the correlated form.

    Scale: one orderkey-shuffled aggregate builds the stats; the blamed
    set is DISTINCT (supplier, order) pairs so a supplier with several
    faulty lines in one order counts once; the supplier dim joins
    broadcast.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    order_stats = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    blamed = (
        li.filter(F.col("l_returnflag") == "R")
        .join(order_stats, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1))
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    return (
        blamed.join(
            F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

_PIVOT_ORACLE_COLS = ", ".join(
    'CAST(COALESCE(count(*) FILTER (WHERE o_orderpriority = ' + repr(p)
    + "), 0) AS BIGINT) AS \"" + p.split("-")[0] + '_cnt\"'
    for p in _PRIORITIES
)


@query(
    "status_priority_pivot",
    oracle=f"""
    SELECT o_orderstatus, {_PIVOT_ORACLE_COLS}
    FROM orders
    GROUP BY 1
    """,
    tags=("relational", "pivot"),
)
def status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts as a wide status × priority matrix via
    ``groupBy().pivot()`` with an EXPLICIT value list — at 100 TB the
    implicit form would first run a distinct scan to discover pivot
    values; pinning them keeps it a single pass. Missing cells are
    zero-filled (COUNT semantics, matching the oracle's FILTER form).
    """
    t = load_tables(spark, sf_dir)
    wide = (
        t["orders"]
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(_PRIORITIES))
        .count()
    )
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"{p.split('-')[0]}_cnt")
        for p in _PRIORITIES
    ]
    return wide.select(*cols)


@query(
    "part_attributes_unpivot",
    oracle="""
    SELECT p_partkey, attr,
           CAST(floor(val * 100 + 0.5) AS BIGINT) AS val_x100
    FROM (
      SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
    )
    WHERE val IS NOT NULL
    """,
    tags=("relational", "unpivot", "melt"),
)
def part_attributes_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: part's numeric attributes as long-form
    (key, attribute, value) rows — the wide→long reshape feeding
    generic per-attribute statistics and feature pipelines. Uses the
    native ``DataFrame.unpivot`` (Spark 3.4+), which plans as a
    map-only Expand — one scan, no shuffle, no UNION re-scan (the
    oracle's UNION ALL reads the table twice; Spark reads it once).
    """
    t = load_tables(spark, sf_dir)
    wide = t["part"].select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    long = wide.unpivot("p_partkey", ["size", "retailprice"], "attr", "val")
    return long.filter(F.col("val").isNotNull()).select(
        "p_partkey",
        "attr",
        F.floor(F.col("val") * 100 + 0.5).cast("long").alias("val_x100"),
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
               AS cost_cents
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal,
             cost_cents
      FROM ps
      JOIN eu ON l_suppkey = s_suppkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 15 AND p_type = 'STANDARD'
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal,
           cost_cents
    FROM cand c
    WHERE cost_cents = (SELECT min(cost_cents) FROM cand c2
                        WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("relational", "tpch", "correlated-min", "argmin-per-group"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, adapted to the driver schema (no ``partsupp``
    table — the part-supplier catalog is derived from observed
    lineitems, cost = cheapest integer-cents sale price per pair): for
    STANDARD parts of size ≤ 15, the EUROPE supplier(s) achieving each
    part's minimum cost, richest suppliers first. This is the classic
    correlated-min-subquery query; ties on the minimum are kept.

    Scale: the correlated subquery decorrelates into a per-part window
    minimum — ONE shuffle of the candidate frame by p_partkey computes
    min and filter in place (no self-join, no second scan; Spark's
    decorrelation of the equivalent SQL builds the same aggregate +
    rejoin, the window form just skips the join). All three dimension
    joins (supplier+nation+region, part) broadcast; the only big frame
    is the lineitem aggregate, partial-aggregated map-side before its
    (l_partkey, l_suppkey) shuffle. The final ORDER BY ... LIMIT 100
    is a TakeOrderedAndProject — a total order (acctbal, nation,
    supplier, part) so the boundary row cannot flap.
    """
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cost_cents")
        )
    )
    eu = (
        t["supplier"]
        .join(
            t["nation"], F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t["part"].filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    cand = (
        ps.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            "s_acctbal", "cost_cents",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost"))
        .drop("min_cost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )
