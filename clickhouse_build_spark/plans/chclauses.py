"""ClickHouse ORDER-BY-clause parity: ``WITH FILL`` / ``INTERPOLATE``
and ``LIMIT n BY`` as registered, oracle-checked queries.

ClickHouse extends ORDER BY with two clauses Spark SQL lacks:

- ``ORDER BY ts WITH FILL FROM a TO b STEP s`` materializes the missing
  points of a series (gap rows appear with fill defaults), and
  ``INTERPOLATE (col)`` carries a column's previous observed value into
  the filled rows;
- ``LIMIT n BY key`` keeps the first n rows per key group.

A reference user migrating CH dashboards relies on both (time-series
panels gap-fill; "top n per group" panels LIMIT BY). Neither is a
function the CH-SQL translator (``functions/chsql.py``) can rewrite
call-site-wise — they change the *shape* of the result set — so, like
``functions/dialect.py:limit_by``, they live as DataFrame-level
rewrites, and the registered queries here put both under the driver's
hash gate.

Reference parity note: the reference targets the ClickHouse dialect for
every migrated query (``/root/reference/src/prompts/data_migrator.py``);
these clauses are part of that dialect's ORDER BY surface.

Scale (100 TB): the fill grid is |dimension| × |buckets| — tiny by
construction (a time axis and an enum), so the grid build and the
carry-forward window cost nothing next to the one real shuffle (the
observation aggregate, map-side combined). LIMIT BY plans as a single
row_number window — one shuffle on the BY key, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.functions.dialect import limit_by, sample_clause
from clickhouse_build_spark.plans.registry import query


def _sample_band_sql() -> str:
    from clickhouse_build_spark.functions.dialect import sample_clause_sql

    return sample_clause_sql("o_orderkey", 1, 8, 3)

# High-value threshold for the filled series: sparse at every SF (33
# of 150 day×type cells empty at sf0.1, ~149 at sf0.001) so the fill
# path is genuinely exercised, never degenerate.
_FILL_MIN_VALUE = 300.0


def fill_series_days(
    obs: DataFrame,
    dims: DataFrame,
    bounds: DataFrame,
    day_col: str = "day",
) -> DataFrame:
    """``ORDER BY day WITH FILL FROM lo TO hi STEP 1 DAY`` for a
    per-dimension daily series: build the dense (dimension × day) grid
    from a 1-row bounds frame and left-join the observations onto it.
    Returns the grid join with observation columns NULL on gap rows —
    callers apply fill defaults / INTERPOLATE carry-forward on top.

    The day axis expands with ``sequence(lo, hi, interval 1 day)`` from
    the bounds row — no driver round-trip, no collect; the grid is
    |dims| × |days| rows and broadcasts.
    """
    days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias(day_col)
    )
    grid = dims.crossJoin(F.broadcast(days))
    return grid.join(obs, [*dims.columns, day_col], "left")


@query(
    "events_daily_with_fill",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
      FROM events
    ),
    days AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    obs AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events
      WHERE value >= {_FILL_MIN_VALUE}
      GROUP BY 1, 2
    ),
    grid AS (SELECT t.event_type, d.day FROM types t CROSS JOIN days d),
    fill AS (
      SELECT g.event_type, g.day, o.n, o.cents
      FROM grid g LEFT JOIN obs o
        ON g.event_type = o.event_type AND g.day = o.day
    )
    SELECT event_type, day,
           COALESCE(n, 0) AS n_events,
           COALESCE(cents, 0) AS rev_cents,
           CASE WHEN n IS NULL THEN 1 ELSE 0 END AS filled,
           COALESCE(last_value(cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
             AS carried_cents
    FROM fill
    ORDER BY event_type, day
    """,
    tags=("events", "dialect", "with-fill", "time-series"),
)
def events_daily_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH dashboard staple: a daily high-value revenue series per
    event type, ``WITH FILL`` from the corpus's first day to its last
    (gap days appear zero-filled and flagged) and ``INTERPOLATE
    (carried_cents)`` carrying the last observed day's revenue across
    the gaps. Money is per-row integer cents, so every output column is
    an integer or a date — hash-exact.

    Scale: the observation aggregate is the only real shuffle; the
    dense grid is |types| × |days| (enum × time axis, tiny at any data
    size) and the carry-forward window runs per type over that grid,
    not over the raw events.
    """
    ev = load_tables(spark, sf_dir)["events"]
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    obs = (
        ev.filter(F.col("value") >= _FILL_MIN_VALUE)
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
        )
    )
    filled = fill_series_days(obs, types, bounds)
    carry = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return filled.select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("cents", F.lit(0)).alias("rev_cents"),
        F.when(F.col("n").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("filled"),
        F.coalesce(
            F.last("cents", ignorenulls=True).over(carry), F.lit(0)
        ).alias("carried_cents"),
    )


@query(
    "events_top3_users_limit_by",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, user_id, n_events,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY n_events DESC, user_id) AS rn
      FROM c
    )
    SELECT event_type, user_id, n_events FROM r WHERE rn <= 3
    """,
    tags=("events", "dialect", "limit-by", "top-k"),
)
def events_top3_users_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT event_type, user_id, count() FROM events GROUP BY ...
    LIMIT 3 BY event_type`` — the CH per-group limit clause, via the
    ``functions/dialect.py:limit_by`` rewrite (row_number window;
    user_id breaks count ties so the kept set is deterministic, which
    CH's physical-order semantics do not guarantee under distribution).

    Scale: one map-side-combined aggregate, then one window shuffle on
    the BY key over the already-aggregated rows — no global sort.
    """
    ev = load_tables(spark, sf_dir)["events"]
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return limit_by(
        counts,
        3,
        by="event_type",
        order_by=[F.desc("n_events"), F.asc("user_id")],
    )


@query(
    "orders_sample_band",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE {{band}}
    GROUP BY 1
    """.format(band=_sample_band_sql()),
    tags=("dialect", "sample", "clickhouse-sql"),
)
def orders_sample_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT ... FROM orders SAMPLE 1/8 OFFSET 3/8`` — the CH
    deterministic-sampling clause via ``functions/dialect.py:
    sample_clause``: the [3/8, 4/8) band of the portable hash of
    o_orderkey, rolled up per status with integer-cents money. The
    exact same band predicate runs on both engines, so the sampled
    aggregate is hash-exact — the property that makes CH sampled
    dashboards trustworthy (every query over the same band sees the
    same rows).

    Scale: a row-local predicate evaluated in the scan stage — the
    sample never materializes, and the aggregate shuffles only the
    sampled partials.
    """
    o = load_tables(spark, sf_dir)["orders"]
    sampled = sample_clause(o, "o_orderkey", 1, 8, 3)
    return sampled.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias(
            "total_cents"
        ),
    )
