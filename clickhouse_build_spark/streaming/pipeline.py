"""Streaming pipelines over the ``events`` stream (SURVEY §2.9 + driver
extension surface).

Design rule: every streaming aggregation here shares its expression
shape with the batch twin in ``plans/events.py`` — ``F.window`` /
``F.session_window`` are the common primitives — so batch backfill and
live tail produce identical semantics (the Kappa pattern). Watermarks
bound state; ``foreachBatch`` reuses the CDC merge writer so the
"continuous sync" replication mode (C2) is the same code path whether
changes arrive from a file feed or a batch.

100 TB notes: windowed state is keyed by (window, group) and bounded
by the watermark horizon; the stateful-op state is one small row per
user_id; the CDC sink inherits the bucket-bounded merge from
``sources/replication.py`` — each micro-batch rewrites only touched
buckets.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from clickhouse_build_spark.catalog import SCHEMAS, load_tables
from clickhouse_build_spark.sources.replication import Replicator, TableMapping

# ------------------------------------------------------------------ source


def stage_event_chunks(
    spark: SparkSession, sf_dir: str, stage_dir: str, n_chunks: int = 4
) -> str:
    """Stage the batch ``events`` table as ``n_chunks`` parquet files in
    arrival order — a deterministic stand-in for a live feed directory
    (each file becomes one micro-batch under ``maxFilesPerTrigger=1``).
    """
    ev = load_tables(spark, sf_dir)["events"].orderBy("event_id")
    n = ev.count()
    per = (n + n_chunks - 1) // n_chunks
    chunk = F.floor(F.col("event_id") / per).cast("int")
    (
        ev.withColumn("__chunk", chunk)
        .repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(stage_dir)
    )
    return stage_dir


def read_event_stream(
    spark: SparkSession, stage_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source readStream with the catalog's declared events schema
    (never inferSchema — SURVEY §1.3 applies to streams too).

    ``ts`` is cast TIMESTAMP_NTZ → TIMESTAMP because watermarks require
    an instant type; the session timezone is pinned to UTC
    (session.py), so the cast is a lossless wall-clock round-trip."""
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(stage_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


# ------------------------------------------------- windowed aggregations


def tumbling_counts(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin of ``events_tumbling_10min``: watermarked
    event-time tumbling window × event_type counts + value sums."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value"
        )
    )


def sliding_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of ``events_sliding_10min_step5``."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


def session_aggregates(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Native streaming sessionization: ``F.session_window`` merges
    events within the inactivity gap into one growing window per user —
    the streaming equivalent of the batch lag+cumsum session assignment
    (``user_sessions_30min``); late data beyond the watermark is
    dropped instead of reopening closed sessions."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact deduplication: first event per key wins, state
    bounded by the watermark (keys older than the horizon are evicted —
    a duplicate arriving later than the watermark delay is NOT caught;
    that is the documented trade for bounded state).

    Uses ``dropDuplicatesWithinWatermark``, NOT plain
    ``dropDuplicates``: the plain form only evicts state when the
    event-time column is part of the dedup keys, so keyed on event_id
    alone it would accumulate one state row per key forever — the
    watermark would bound nothing.

    The streaming twin of ``doc_exact_dedup``'s hash-groupBy: at 100 TB
    of stream history you cannot keep every seen key, so the watermark
    is the retention contract.
    """
    keys = key_cols or ["event_id"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


# ------------------------------------------- custom stateful operator

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running totals — the ``applyInPandasWithState`` kernel.
    State is one (count, sum) pair per user; each micro-batch folds its
    Arrow batches in and emits the updated running row."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, Σvalue) via
    ``applyInPandasWithState`` — the escape hatch for semantics
    ``F.window`` can't express (running, never-closing accumulators).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------- CDC sink


def cdc_stream_writer(
    stream: DataFrame,
    replicator: Replicator,
    mapping: TableMapping,
    checkpoint_dir: str,
):
    """C2 continuous sync: every micro-batch goes through the SAME
    bucket-bounded merge as batch CDC (``Replicator.apply_changes``) —
    the stream is just a driver for the replication writer.

    Returns an unstarted ``DataStreamWriter``; callers pick the trigger
    (``availableNow`` for backfill-and-stop, processing-time for live).
    """

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        replicator.apply_changes(batch, mapping)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "cdc"))
        .outputMode("update")
    )


def stream_ingest(
    spark: SparkSession,
    feed_dir: str,
    replicator: Replicator,
    mapping: TableMapping,
    schema,
    checkpoint_dir: str,
    source_format: str = "json",
    max_files_per_trigger: int | None = None,
) -> str:
    """C2 as a LIVE change feed: consume change files dropped into
    ``feed_dir`` through a real Structured Streaming file source and
    merge each micro-batch with the bucket-bounded CDC writer.

    This is the ClickPipes seam the reference delegates
    (``src/tools/data_migrator.py:13-21``) made concrete: a CDC
    producer appends files (JSON/CSV/parquet — Debezium-style rows with
    an optional ``_op`` delete marker and a version column) and this
    pipeline drains WHATEVER ARRIVED SINCE THE LAST RUN — the file
    source's checkpoint tracks consumed files, so repeated invocations
    (cron-style) or a long-running query both see each change exactly
    once. ``availableNow`` drains-and-stops, which makes the e2e path
    deterministic AND restart-safe (tests/test_stream_ingest.py feeds
    three sequential drops through three invocations sharing one
    checkpoint).

    Scale: the file source lists only new files per trigger
    (``maxFilesPerTrigger`` bounds a backlog catch-up so one giant
    batch can't blow executor memory); each merge touches only the
    hash buckets present in its batch. The feed schema is DECLARED —
    a schema-inferred stream would fork the replica's parquet schema
    on the first ambiguous file.
    """
    reader = spark.readStream.format(source_format).schema(schema)
    if source_format == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(feed_dir)
    q = (
        cdc_stream_writer(stream, replicator, mapping, checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return replicator._target_path(mapping)


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich the event stream with a batch
    dimension frame. Stateless on the stream side — each micro-batch
    hash-joins against the (broadcastable) static relation, so there is
    no watermark and no state store; the static side re-resolves per
    batch (a replicator-refreshed dim view picks up CDC updates between
    batches for free).
    """
    return stream.join(dim, on=on, how=how)


def views_after_errors_stream(
    views: DataFrame,
    errors: DataFrame,
    watermark: str = "30 minutes",
    horizon_minutes: int = 5,
) -> DataFrame:
    """Stream-stream interval join: each view event pairs with the
    same user's error events in the preceding ``horizon_minutes`` —
    the streaming twin of the batch bucketed range join
    (``events_views_in_error_windows``). Both sides carry watermarks so
    the join state is bounded: a buffered error can be dropped once the
    view-side watermark passes its ts + horizon.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", watermark)
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("e_ts"),
    ).withWatermark("e_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("e_user"))
        & (F.col("v_ts") >= F.col("e_ts"))
        & (F.col("v_ts") <= F.col("e_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES"))
    )
    return v.join(e, cond).select(
        F.col("v_user").alias("user_id"), "view_id", "error_id", "v_ts", "e_ts"
    )
