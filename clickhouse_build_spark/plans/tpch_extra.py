"""Wider TPC-H-shaped relational coverage (SURVEY §2.3/§2.4 stretch,
§7.2 phase 4): the operator shapes the first relational set doesn't
exercise — two-sided dimension joins, correlated scalar subqueries,
conditional (CASE) aggregation, IN-over-grouped-HAVING, INTERSECT,
CUBE, and anti-join + scalar-subquery composition.

Classic TPC-H q2/q4/q12/q19 need columns the driver's reduced star
schema doesn't carry (partsupp, l_commitdate, l_shipmode, containers);
each query here keeps the *plan shape* of its namesake on the columns
that exist. Every oracle is plain ANSI SQL so DuckDB hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.functions.dialect import round2
from clickhouse_build_spark.plans.registry import query

# Verification-anchor scale gate for sketch queries: exact anchors run
# only at/below this input size (covers the sf0.01 oracle scale with
# headroom; the sf0.1 bench scale and anything larger gets the pure
# sketch plan). See approx_distinct_and_percentiles.
_ANCHOR_MAX_ROWS = 100_000

def _rev():
    # built lazily — classic PySpark Column construction needs a live
    # SparkContext, which doesn't exist at import time
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q7_nation_trade_flows",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    tags=("relational", "tpch", "multi-join"),
)
def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joined twice under
    different roles (supplier side vs customer side) — alias-disciplined
    self-reference plus a 6-way join and year extraction.

    Revenue is integerized to cents PER ROW before the sum: both engines
    compute the identical IEEE double per row, floor it to the same
    bigint, and an integer sum is order-independent; dividing the same
    bigint by the constant 100.0 yields bit-identical doubles. Immune to
    the round(sum(double),2) accumulation-order ties that hash-failed
    this query in round 1 (VERDICT.md "What's wrong" #2).

    Scale: both nation joins broadcast (25 rows at any SF); the
    fact-side work is one shuffle on l_orderkey for the orders join.
    """
    t = load_tables(spark, sf_dir)
    sn = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    cn = F.broadcast(t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(sn, F.col("sn_key") == F.col("s_nationkey"))
        .join(cn, F.col("cn_key") == F.col("c_nationkey"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            (F.sum(F.floor(_rev() * 100 + F.lit(0.5)).cast("long")) / 100.0).alias(
                "revenue"
            )
        )
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(l_shipdate) AS o_year,
           CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                                - 0.6 * p_retailprice * l_quantity) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) / 100.0 AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("relational", "tpch", "multi-join", "like"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year with a LIKE
    part filter (supply cost approximated as 0.6·retailprice — the
    reduced schema has no partsupp). Profit is integerized to cents per
    row before the sum (order-independent; see q7's docstring).

    Scale: the LIKE filter prunes part before the join; AQE broadcasts
    the filtered part side when it fits.
    """
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_name").like("%widget%"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(
            (F.sum(F.floor(profit * 100 + F.lit(0.5)).cast("long")) / 100.0).alias(
                "profit"
            )
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "tpch", "top-k"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking — 4-way join,
    grouped agg, deterministic top-20 (revenue desc, custkey tiebreak,
    SURVEY §7.4 #5)."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    return (
        t["customer"]
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round2(F.sum(_rev())).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_shipping_caseagg",
    oracle="""
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY 1
    """,
    tags=("relational", "tpch", "case-agg"),
)
def q12_priority_shipping_caseagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) aggregation splitting one
    pass into two counters — no second scan, no self-join."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.trunc("l_shipdate", "month").alias("ship_month"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-09-01'
    """,
    tags=("relational", "tpch", "case-agg", "global-agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage — ratio of two
    conditional sums in a single global aggregate."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-09-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
    return (
        li.join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .agg(F.round(100.0 * promo / F.sum(rev), 4).alias("promo_share_pct"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    tags=("relational", "tpch", "correlated-subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + re-join — the plan
    Catalyst produces for the SQL form, written explicitly.

    Scale: the per-part avg is a partial-agg shuffle on l_partkey; the
    re-join reuses that partitioning, and the brand filter broadcasts.
    """
    t = load_tables(spark, sf_dir)
    brand_parts = F.broadcast(
        t["part"].filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    )
    li = t["lineitem"]
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(brand_parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("ap_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(round2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180
    )
    GROUP BY 1, 2, 3, 4
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    tags=("relational", "tpch", "in-subquery", "having"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery → semi join
    against the aggregated key set, then the detail re-aggregation."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(big, F.col("big_key") == F.col("o_orderkey"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(round2(F.sum("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    tags=("relational", "tpch", "scalar-subquery", "anti-join"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average as
    a filter bound) composed with NOT EXISTS (anti join).

    Scale: the scalar average is a one-row broadcast, not a collect —
    the cross join keeps the plan fully distributed/lazy.
    """
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            round2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "returned_and_urgent_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    """,
    tags=("relational", "set-op", "intersect"),
)
def returned_and_urgent_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set-op surface beyond UNION ALL, SURVEY §2.7):
    customers with an urgent order AND a returned item."""
    t = load_tables(spark, sf_dir)
    urgent = (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    )
    returned = (
        t["orders"]
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey")
    )
    return urgent.intersect(returned)


@query(
    "customers_except_returners",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    """,
    tags=("relational", "set-op", "except"),
)
def customers_except_returners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference, completing the UNION/INTERSECT/EXCEPT
    family, SURVEY §2.7): customers who placed orders but never returned
    an item. ``DataFrame.subtract`` ≡ SQL EXCEPT (distinct semantics).

    Scale: both sides reduce to distinct o_custkey before the set op —
    Catalyst plans EXCEPT as a left-anti hash join on the key, one
    shuffle per side.
    """
    t = load_tables(spark, sf_dir)
    all_cust = t["orders"].select("o_custkey")
    returners = (
        t["orders"]
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey")
    )
    return all_cust.subtract(returners)


@query(
    "status_priority_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "cube"),
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping-set combinations in one pass (the ROLLUP
    twin already registered exercises the hierarchy form)."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"), round2(F.sum("o_totalprice")).alias("total")
    )


@query(
    "price_percentiles_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(round(quantile_cont(CAST(floor(l_extendedprice * 100 + 0.5)
                                         AS BIGINT), 0.5) * 100) AS BIGINT)
             / 10000.0 AS p50,
           CAST(round(quantile_cont(CAST(floor(l_extendedprice * 100 + 0.5)
                                         AS BIGINT), 0.9) * 100) AS BIGINT)
             / 10000.0 AS p90,
           CAST(round(quantile_cont(CAST(floor(l_extendedprice * 100 + 0.5)
                                         AS BIGINT), 0.99) * 100) AS BIGINT)
             / 10000.0 AS p99
    FROM lineitem
    GROUP BY 1
    """,
    tags=("relational", "percentile"),
)
def price_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation, R-7) per group, computed
    via a VALUE HISTOGRAM instead of Spark's ``percentile`` aggregate.

    Why not ``F.percentile``: it buffers every value of a group in one
    aggregation buffer — with ~6 groups at 100 TB that's ~17 GB of
    doubles per group in executor memory, a genuine scale-killer
    (VERDICT r03). The histogram plan's memory is bounded by the number
    of DISTINCT cent values (≤ ~10.5 M for any corpus, independent of
    row count): (1) partial-aggregated groupBy (flag, cents) → counts;
    (2) per-flag cumulative counts over the compressed histogram
    (window sort spills, sized by distinct values, not rows); (3) the
    R-7 rank math `h=(n-1)q; v_lo + (h-⌊h⌋)(v_hi - v_lo)` as conditional
    min-aggregates over the histogram. Results are bit-identical to the
    value-buffering form.

    Tie-immunity: percentiles run over integer CENTS; with q in
    hundredths the R-7 interpolant × 100 is mathematically an integer,
    so ``round(p*100)`` snaps both engines' ULP-different interpolants
    to the same bigint (the error is ~1e-6 of the 0.5 rounding margin),
    and the constant division back to dollars is bit-identical. Plain
    ``round(quantile, 2)`` hash-failed on a half-cent interpolation tie
    under the full-precision gate.

    The t-digest sketch (``approx_distinct_and_percentiles`` below)
    remains the constant-memory default when exactness isn't required."""
    from pyspark.sql import Window

    li = load_tables(spark, sf_dir)["lineitem"]
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    hist = li.groupBy(F.col("l_returnflag"), cents.alias("c")).agg(
        F.count("*").alias("k")
    )
    w = Window.partitionBy("l_returnflag").orderBy("c")
    hist = hist.withColumn("cum", F.sum("k").over(w))
    n = hist.groupBy("l_returnflag").agg(F.sum("k").alias("n"))
    hj = hist.join(F.broadcast(n), "l_returnflag")

    quantiles = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
    aggs = []
    for name, q in quantiles:
        h = (F.col("n") - 1) * F.lit(q)
        # value at 0-based rank r = first histogram value with cum > r
        aggs.append(
            F.min(F.when(F.col("cum") > F.floor(h), F.col("c"))).alias(f"vlo_{name}")
        )
        aggs.append(
            F.min(F.when(F.col("cum") > F.ceil(h), F.col("c"))).alias(f"vhi_{name}")
        )
    g = hj.groupBy("l_returnflag", "n").agg(*aggs)
    sel = [F.col("l_returnflag")]
    for name, q in quantiles:
        h = (F.col("n") - 1) * F.lit(q)
        frac = h - F.floor(h)
        p = F.col(f"vlo_{name}") + frac * (F.col(f"vhi_{name}") - F.col(f"vlo_{name}"))
        sel.append((F.round(p * 100).cast("long") / 10000.0).alias(name))
    return g.select(*sel)


@query(
    "approx_distinct_and_percentiles",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS parts_ok,
           TRUE AS p50_ok
    FROM lineitem
    GROUP BY 1
    """,
    tags=("relational", "approx", "sketch"),
)
def approx_distinct_and_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB defaults: HLL++ distinct count
    and KLL-style approximate percentile, fixed memory per group
    regardless of cardinality (exact countDistinct shuffles every
    distinct value; exact percentile sorts the group).

    Sketch *digests* are implementation-defined, so raw sketch outputs
    can't hash-match a DuckDB oracle. Bound-check pattern instead
    (ADVICE r03): emit the error bound as a boolean-pass frame —
    ``parts_ok`` asserts the HLL estimate within 5% (2.5σ at rsd=0.02)
    of the Spark-side exact count, ``p50_ok`` the KLL median within 1%
    of the exact percentile. The oracle recomputes ``exact_parts``
    independently (anchoring the frame to DuckDB ground truth) and
    expects every bound to hold (TRUE columns). The exact twins
    (``distinct_counts``, ``price_percentiles_by_flag``) remain the
    value-level verifiers.

    SCALE GATE (VERDICT r04 "what's wrong" #1): the exact anchors
    (count_distinct + distinct-value-histogram median) exist only to
    verify the sketches, yet exact count-distinct shuffles every
    distinct value — precisely the cost a sketch query exists to
    avoid, and at 100× it IS the query's cost. Anchors therefore run
    only when the input is at or below ``_ANCHOR_MAX_ROWS`` (the
    oracle/correctness scale, sf0.01 ≈ 60 k lineitem rows); above it
    the query returns the sketch plan alone with NULL anchor columns —
    same schema, and NULL reads as "not verified at this scale", never
    as a fabricated pass. The row count comes from parquet footer
    metadata (a metadata-only count, no scan)."""
    from pyspark.sql import Window

    li = load_tables(spark, sf_dir)["lineitem"]
    anchored = li.count() <= _ANCHOR_MAX_ROWS
    # Three SEPARATE aggregation plans joined on the tiny group key, not
    # one .agg(...) with all of them: mixing a distinct aggregate
    # (expand-based two-phase) with TypedImperative sketches
    # (HLL/KLL) disqualifies hash aggregation and Spark falls back to
    # SortAggregate over the expanded rows — measured 8.3 s vs 1.0+0.8+
    # 0.7 s separately at sf0.1. Three map-side-combined passes beat one
    # sort-everything pass at any scale.
    approx_cd = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )
    approx_pct = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_p50"
        )
    )
    sketches = approx_cd.join(F.broadcast(approx_pct), "l_returnflag")
    if not anchored:
        # Production shape: sketches only, fixed memory per group, no
        # exact pass. Anchor columns are NULL — unverified, not faked.
        return sketches.select(
            "l_returnflag",
            F.lit(None).cast("long").alias("exact_parts"),
            F.lit(None).cast("boolean").alias("parts_ok"),
            F.lit(None).cast("boolean").alias("p50_ok"),
        )
    exact_cd = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts")
    )
    sketches = exact_cd.join(F.broadcast(sketches), "l_returnflag")
    # Exact median for the bound via the same distinct-value-histogram
    # trick as price_percentiles_by_flag — NOT F.percentile, which
    # buffers every group value in memory (the scale-killer this file
    # just removed; mixing it into the sketch agg also forces a second
    # full pass). Histogram memory = distinct prices, not rows.
    hist = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("v")).agg(
        F.count("*").alias("k")
    )
    hist = hist.withColumn(
        "cum", F.sum("k").over(Window.partitionBy("l_returnflag").orderBy("v"))
    )
    h = (F.col("n") - 1) * F.lit(0.5)
    exact = (
        hist.join(
            F.broadcast(
                hist.groupBy("l_returnflag").agg(F.sum("k").alias("n"))
            ),
            "l_returnflag",
        )
        .groupBy("l_returnflag", "n")
        .agg(
            F.min(F.when(F.col("cum") > F.floor(h), F.col("v"))).alias("vlo"),
            F.min(F.when(F.col("cum") > F.ceil(h), F.col("v"))).alias("vhi"),
        )
        .select(
            "l_returnflag",
            (
                F.col("vlo")
                + (h - F.floor(h)) * (F.col("vhi") - F.col("vlo"))
            ).alias("exact_p50"),
        )
    )
    rel = lambda a, b: F.abs(F.col(a) - F.col(b)) / F.col(b)  # noqa: E731
    return sketches.join(F.broadcast(exact), "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (rel("approx_parts", "exact_parts") <= 0.05).alias("parts_ok"),
        (rel("approx_p50", "exact_p50") <= 0.01).alias("p50_ok"),
    )


@query(
    "status_priority_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("relational", "grouping-sets"),
)
def status_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent single-column rollups
    in one pass (CUBE/ROLLUP's general form; completes §2.4's
    grouping-analytics family). Spark's DataFrame API has cube/rollup
    but arbitrary sets need the SQL form — exercised through
    ``spark.sql`` over the catalog view, i.e. the engine's S2 path.
    """
    load_tables(spark, sf_dir)  # registers the views
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "events_props_as_map",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(len(json_keys(props))) AS BIGINT) AS total_keys,
           CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS has_k
    FROM events
    GROUP BY 1
    """,
    tags=("events", "map", "semi-structured"),
)
def events_props_as_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props as a typed MapType: ``from_json`` to
    map<string,string>, then map_keys/map_contains_key — the
    map-column surface (SURVEY §1.2 notes MapType enters via event
    props). Stays JVM-side. Per-row from_json parse: wide events scan
    (catalog.py consumer-scoped fan-out, r18)."""
    ev = load_tables(spark, sf_dir).wide("events")
    m = F.from_json("props", "map<string,string>")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.size(F.map_keys(m))).alias("total_keys"),
        F.sum(F.when(m.getItem("k").isNotNull(), 1).otherwise(0)).alias("has_k"),
    )


@query(
    "status_priority_profile",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
             AS priorities,
           count(*) AS cnt
    FROM orders
    GROUP BY 1
    """,
    tags=("relational", "array-agg"),
)
def status_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the distinct priorities seen per status —
    ``collect_set`` alone is partition-order-dependent, so ``sort_array``
    makes the result deterministic (SURVEY §7.4 #5 applies to array
    outputs too). Emitted as a ','-joined STRING, not an array column:
    the driver's canonicalizer pandas-sorts result columns and crashes
    on unhashable lists (round-1 error row, VERDICT.md "What's wrong"
    #3)."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count("*").alias("cnt"),
    )
