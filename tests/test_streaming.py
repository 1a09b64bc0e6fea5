"""Structured Streaming equivalence: each streaming pipeline, run to
completion over the staged event chunks, must agree with its batch twin
from plans/events.py (the Kappa property)."""

from __future__ import annotations

import pathlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.plans import REGISTRY
from clickhouse_build_spark.sources.replication import TableMapping, Replicator
from clickhouse_build_spark.streaming import (
    cdc_stream_writer,
    read_event_stream,
    running_user_totals,
    session_aggregates,
    sliding_counts,
    stage_event_chunks,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stage(spark):
    d = tempfile.mkdtemp(prefix="stream_stage_")
    stage_event_chunks(spark, SF_SMOKE, d, n_chunks=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_complete(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return q


def test_tumbling_stream_matches_batch(spark, stage):
    stream = read_event_stream(spark, stage)
    _run_complete(tumbling_counts(stream), "t_tumbling")
    got = {
        (r.window_start, r.event_type): (r.cnt, r.total_value)
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.cnt, r.total_value)
        for r in REGISTRY["events_tumbling_10min"].builder(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_sliding_stream_matches_batch(spark, stage):
    stream = read_event_stream(spark, stage)
    _run_complete(sliding_counts(stream), "t_sliding")
    got = {
        r.window_start: r.cnt for r in spark.sql("SELECT * FROM t_sliding").collect()
    }
    want = {
        r.window_start: r.cnt
        for r in REGISTRY["events_sliding_10min_step5"].builder(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_session_windows_match_batch_session_counts(spark, stage):
    stream = read_event_stream(spark, stage)
    _run_complete(session_aggregates(stream), "t_sessions")
    sessions = spark.sql("SELECT * FROM t_sessions")
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in sessions.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    }
    want = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in REGISTRY["user_sessions_30min"].builder(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_stateful_running_totals_match_batch(spark, stage):
    from clickhouse_build_spark.catalog import load_tables

    stream = read_event_stream(spark, stage)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    # update mode emits one row per user per micro-batch; the last row
    # per user is the final running state.
    final = (
        spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC) AS rn
              FROM t_totals) WHERE rn = 1
            """
        )
        .collect()
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in final}
    ev = load_tables(spark, SF_SMOKE)["events"]
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_cdc_stream_merges_to_latest_per_key(spark, stage, tmp_path):
    """Streamed micro-batch merges must land the same final replica as
    the batch CDC contract: latest event per user."""
    rep = Replicator(
        spark=spark,
        target_root=str(tmp_path / "replica"),
        key_cols=["user_id"],
        version_col="ts",
        n_buckets=8,
    )
    mapping = TableMapping("public", "events", "events_latest")
    stream = read_event_stream(spark, stage).select(
        "user_id", "event_id", "event_type", "ts"
    )
    q = cdc_stream_writer(stream, rep, mapping, str(tmp_path / "ckpt")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(timeout=300)
    got = {
        r.user_id: (r.event_id, r.ts)
        for r in rep.read(mapping).collect()
    }
    want = {
        r.user_id: (r.event_id, r.ts)
        for r in REGISTRY["cdc_latest_event_per_user"].builder(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_dedup_stream_drops_replayed_chunks(spark, stage, tmp_path):
    """Feed the same chunk set twice (a replayed feed); streaming dedup
    must land each event_id exactly once."""
    import shutil

    replay = tmp_path / "replay"
    shutil.copytree(stage, replay)
    for chunk in list(pathlib.Path(replay).glob("__chunk=*")):
        shutil.copytree(chunk, replay / (chunk.name + "_dup"))
    from clickhouse_build_spark.streaming import dedup_stream

    stream = read_event_stream(spark, str(replay))
    q = (
        dedup_stream(stream, ["event_id"], watermark="10 hours")
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM t_dedup").head()
    from clickhouse_build_spark.catalog import load_tables

    want = load_tables(spark, SF_SMOKE)["events"].count()
    assert got.n == got.d == want


def test_stream_static_enrich_matches_batch_join(spark, stage):
    from clickhouse_build_spark.streaming.pipeline import enrich_with_static

    dim = spark.range(200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).cast("string").alias("segment"),
    )
    stream = read_event_stream(spark, stage)
    enriched = enrich_with_static(stream, dim, on="user_id").groupBy(
        "segment"
    ).agg(F.count("*").alias("n"))
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = {
        r["segment"]: r["n"]
        for r in spark.sql("SELECT * FROM t_enrich").collect()
    }
    from clickhouse_build_spark.catalog import load_tables

    ev = load_tables(spark, SF_SMOKE)["events"]
    want = {
        r["segment"]: r["n"]
        for r in ev.join(dim, "user_id", "left")
        .groupBy("segment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, stage):
    from clickhouse_build_spark.streaming.pipeline import views_after_errors_stream

    stream = read_event_stream(spark, stage)
    views = stream.filter(F.col("event_type") == "view")
    errors = stream.filter(F.col("event_type") == "error")
    joined = views_after_errors_stream(views, errors)
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = {
        (r["view_id"], r["error_id"])
        for r in spark.sql("SELECT view_id, error_id FROM t_ssjoin").collect()
    }
    from clickhouse_build_spark.catalog import load_tables

    ev = load_tables(spark, SF_SMOKE)["events"].withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    v = ev.filter(F.col("event_type") == "view")
    e = ev.filter(F.col("event_type") == "error")
    want = {
        (r["view_id"], r["error_id"])
        for r in v.alias("v")
        .join(
            e.alias("e"),
            (F.col("v.user_id") == F.col("e.user_id"))
            & (F.col("v.ts") >= F.col("e.ts"))
            & (F.col("v.ts") <= F.col("e.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(
            F.col("v.event_id").alias("view_id"),
            F.col("e.event_id").alias("error_id"),
        )
        .collect()
    }
    # append-mode emits pairs as watermarks permit; availableNow's final
    # watermark passes max event time, so ALL pairs must be emitted.
    assert got == want
