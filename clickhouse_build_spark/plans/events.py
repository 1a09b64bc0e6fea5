"""Event-stream queries: time windows, JSON props, sessionization, CDC
latest-row (SURVEY §2.9 + the driver's `events` extension surface).

The reference's only streaming semantics are the CDC replication modes
(``src/tools/data_migrator.py:10-21``) whose reader-side contract is
"latest version per key" (ReplacingMergeTree analogue, SURVEY C3). These
queries express that contract plus the event-time windowing a real events
table needs. The same builders run unchanged on a Structured Streaming
DataFrame (``streaming/``) — `F.window` is the shared primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.functions.dialect import round2
from clickhouse_build_spark.plans.registry import query


@query(
    "events_tumbling_10min",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           count(*) AS cnt,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-agg", "tumbling"),
)
def events_tumbling_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate (``F.window(ts, '10 minutes')``).

    Scale/streaming: identical code runs on ``readStream`` with a
    watermark; in batch it's a groupBy on (bucket, type) with map-side
    partial aggregation.
    """
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), round2(F.sum("value")).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@query(
    "events_sliding_10min_step5",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           count(*) AS cnt
    FROM events GROUP BY 1
    UNION ALL
    SELECT time_bucket(INTERVAL '10 minutes', ts,
                       TIMESTAMP '2000-01-01 00:05:00') AS window_start,
           count(*) AS cnt
    FROM events GROUP BY 1
    """,
    tags=("events", "window-agg", "sliding"),
)
def events_sliding_10min_step5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10-minute windows every 5 minutes — each event
    lands in 2 windows (``F.window(ts, '10 minutes', '5 minutes')``).

    The oracle reproduces the two overlapping bucket phases as a UNION of
    tumbling bucketings with shifted origins.
    """
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS avg_k
    FROM events
    GROUP BY 1
    """,
    tags=("events", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: extract a JSON field and aggregate it.

    The events table stores ``props`` as a JSON string (FIXTURES.md §2);
    ``get_json_object`` stays JVM-side (no Python). Per-row JSON parse:
    wide events scan (catalog.py consumer-scoped fan-out, r18).
    """
    ev = load_tables(spark, sf_dir).wide("events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            round2(
                F.avg(F.get_json_object("props", "$.k").cast("double"))
            ).alias("avg_k"),
        )
    )


@query(
    "cdc_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, ts
    FROM (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    tags=("events", "cdc", "C3"),
)
def cdc_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC reader contract: latest version per key (SURVEY C3 —
    ReplacingMergeTree analogue implied by ClickPipes CDC,
    ``src/tools/data_migrator.py:13-18``). Treating ``events`` as a
    change stream keyed by user_id, resolve each key to its newest row.

    Scale: one shuffle on the key; at 100 TB the replication writer
    (sources/replication.py) keeps data hash-bucketed by key so this
    dedup never reshuffles the full table per batch (SURVEY §7.4 #6).
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


@query(
    "user_sessions_30min",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id
    """,
    tags=("events", "sessionization"),
)
def user_sessions_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — the classic
    lag + cumulative-sum session assignment, fully declarative (no
    stateful UDF needed in batch; the streaming twin uses
    ``F.session_window``).

    Scale: two windows over the same (user_id, ts) partitioning — Spark
    reuses one shuffle+sort for both.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev = F.lag(F.col("ts")).over(w)
    # Gap in exact epoch microseconds — integer math, no sub-second
    # truncation ambiguity between engines.
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    flagged = ev.withColumn(
        "new_session",
        F.when(prev.isNull() | (gap_us > 1_800_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    # event_id tiebreak on the ROWS cumsum too: with two events at the
    # same ts, a ts-only ordering makes the prefix sums (and so the
    # session count) partition-order-dependent (SURVEY §7.4 #5).
    wcum = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wcum))
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "signup_purchase_funnel",
    oracle="""
    WITH signups AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    conversions AS (
      SELECT s.user_id, s.signup_ts, min(e.ts) AS first_purchase_ts
      FROM signups s
      JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND e.ts > s.signup_ts
       AND epoch_us(e.ts) - epoch_us(s.signup_ts) <= 86400000000
      GROUP BY 1, 2
    )
    SELECT count(*) AS n_signups,
           (SELECT count(*) FROM conversions) AS n_converted_24h
    FROM signups
    """,
    tags=("events", "funnel"),
)
def signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (ClickHouse ``windowFunnel`` shape): users whose
    first purchase follows their first signup within 24h.

    Scale: both steps are user-keyed aggregates sharing one shuffle
    partitioning; the step-2 join is key-local (same user_id
    partitioning on both sides — no extra shuffle).
    """
    ev = load_tables(spark, sf_dir)["events"]
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    gap_us = F.unix_micros(F.col("p_ts").cast("timestamp")) - F.unix_micros(
        F.col("signup_ts").cast("timestamp")
    )
    converted = (
        signups.join(purchases, "user_id")
        .filter((F.col("p_ts") > F.col("signup_ts")) & (gap_us <= 86_400_000_000))
        .select("user_id")
        .distinct()
    )
    return signups.agg(F.count("*").alias("n_signups")).crossJoin(
        converted.agg(F.count("*").alias("n_converted_24h"))
    )


@query(
    "weekly_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(time_bucket(INTERVAL '7 days', min(ts),
                           TIMESTAMP '2024-01-01 00:00:00') AS DATE) AS cohort_week
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(time_bucket(INTERVAL '7 days', ts,
                  TIMESTAMP '2024-01-01 00:00:00') AS DATE) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT) AS week_offset,
           count(*) AS active_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "retention", "cohort"),
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: users grouped by first-seen week, counted in
    every week they were active (offset 0 = the cohort's own week).

    Scale: one events pass — distinct (user, week), then the cohort
    week as a window MIN over the user's weeks (the week of the first
    event IS the min active week: the window start is monotone in ts),
    then the |weeks|²-row rollup. r17 (guide §2.4): this replaces a
    second user-keyed aggregate + join — one fewer scan and shuffle;
    same rows (the join matched each (user, week) to its single cohort
    row, exactly what the window min annotates).
    """
    ev = load_tables(spark, sf_dir)["events"]
    weekly = ev.select(
        "user_id",
        # startTime 4 days: epoch (Thu) -> 2024-01-01 (Mon) alignment,
        # matching the oracle's time_bucket origin
        F.window("ts", "7 days", startTime="4 days").start.cast("date").alias("active_week"),
    ).distinct()
    weekly = weekly.withColumn(
        "cohort_week",
        F.min("active_week").over(Window.partitionBy("user_id")),
    )
    return (
        weekly.groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


@query(
    "event_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           count(*) AS cnt,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "histogram"),
)
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (25-unit buckets with
    per-bucket min/max) — the single-pass distribution profile; at any
    scale the shuffle carries |types|x|buckets| rows."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 25.0).cast("long").alias("bucket"),
    ).agg(
        F.count("*").alias("cnt"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


@query(
    "events_asof_last_error",
    oracle="""
    SELECT ev.event_id, ev.user_id, ev.event_type,
           err.event_id AS err_event_id_asof,
           err.ts AS err_ts_asof
    FROM (SELECT * FROM events WHERE event_type <> 'error') ev
    ASOF LEFT JOIN (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
    ) err
      ON ev.user_id = err.user_id AND ev.ts >= err.ts
    """,
    tags=("events", "asof-join"),
)
def events_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN (the ClickHouse marquee join, SURVEY §2.3 stretch):
    enrich every non-error event with the user's most recent error at
    or before it. The oracle is DuckDB's native ASOF LEFT JOIN; the
    Spark side is the union + ordered carry-forward plan
    (``operators/asof.py``) — one key shuffle, no range explosion.
    """
    from clickhouse_build_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    left = ev.filter(F.col("event_type") != "error").select(
        "event_id", "user_id", "event_type", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_event_id")
    )
    joined = asof_join(
        left,
        errors,
        on=["user_id"],
        left_ts="ts",
        right_ts="err_ts",
        right_cols=["err_event_id", "err_ts"],
    )
    return joined.select(
        "event_id", "user_id", "event_type", "err_event_id_asof", "err_ts_asof"
    )


@query(
    "events_views_in_error_windows",
    oracle="""
    SELECT v.user_id, count(DISTINCT v.event_id) AS n_points
    FROM events v
    JOIN events e ON v.user_id = e.user_id AND e.event_type = 'error'
      AND v.ts BETWEEN e.ts AND e.ts + INTERVAL 5 MINUTE
    WHERE v.event_type = 'view'
    GROUP BY 1
    """,
    tags=("events", "range-join", "interval"),
)
def events_views_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (point-in-interval): per user, the distinct views
    that landed within 5 minutes after any of that user's errors — the
    blast-radius query. Executed via the bucketed range join
    (``operators/rangejoin.py``): intervals explode into 300 s buckets
    and equi-join on (user_id, bucket), NOT the BroadcastNestedLoopJoin
    Spark would plan for the raw BETWEEN — the non-equi candidate space
    is |views|×|errors| per user and dies at 100 TB; the bucketed form
    is linear in points + matches.
    """
    from clickhouse_build_spark.operators.rangejoin import point_in_interval_counts

    ev = load_tables(spark, sf_dir)["events"]
    points = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    intervals = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("win_end"),
    )
    return point_in_interval_counts(
        points,
        intervals,
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
        on=["user_id"],
        count_col="event_id",
        bucket_seconds=300,
    )


@query(
    "events_type_counts_salted",
    oracle="""
    SELECT event_type, count(*) AS count
    FROM events
    GROUP BY 1
    """,
    tags=("events", "skew", "salted-agg"),
)
def events_type_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (``operators/skew.py``): counts per
    event type with the hot key spread over 8 salt partitions before
    the final combine. Result is salt-independent — the oracle is the
    plain GROUP BY — so the driver verifies the skew path end-to-end.
    The 5-type events table isn't actually skewed; the point is the
    verified plan shape for keys that are (one key = 30% of 100 TB).
    """
    from clickhouse_build_spark.operators.skew import salted_group_count

    ev = load_tables(spark, sf_dir)["events"]
    return salted_group_count(ev, "event_type", n_salts=8)
