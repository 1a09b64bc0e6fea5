"""Streaming corpus ingest: the LLM-data pipeline's live-tail side.

Batch cleaning (``plans/textops.py clean_corpus``) and this stream
share the same expression shapes (md5 fingerprint, quality predicates),
so a backfill over yesterday's parquet and the live tail agree — the
same Kappa rule ``streaming/pipeline.py`` applies to events.

Pipeline: file-source stream of document rows (with an ingest
timestamp) → cheap quality gate (C4/Gopher-style length + symbol
rules, all codegen) → exact-dup drop within the watermark horizon
(``dropDuplicatesWithinWatermark`` on the content fingerprint) →
windowed per-language admission counts for monitoring.

100 TB notes: the dedup state holds one (fingerprint, ts) pair per doc
inside the watermark horizon — 16-byte digests, never document text;
the quality gate runs before dedup so rejected rows never enter state;
admission counts are (window × lang) cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_build_spark.catalog import SCHEMAS, load_tables

# Quality gate thresholds (match doc_quality_scores semantics).
MIN_TOKENS = 20
MAX_TOKENS = 1000
MAX_SYMBOL_RATIO = 0.30

INGEST_BASE = "2026-01-01 00:00:00"


def _with_ingest_ts(df: DataFrame) -> DataFrame:
    """Deterministic synthetic arrival time: base + doc_id seconds — a
    pure function of the row (staging, replays, and the batch twin all
    see identical event times) and MONOTONE in arrival order, so the
    watermark never classifies an in-order chunk as late. The sf0.001
    corpus (500 docs) spans ~8 minutes, well inside the 60-minute
    dedup horizon — a replayed chunk therefore exercises the dedup
    state, not the late-drop path."""
    return df.withColumn(
        "ingest_ts",
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(INGEST_BASE).cast("timestamp"))
            + F.col("doc_id")
        ),
    )


def stage_doc_chunks(
    spark: SparkSession, sf_dir: str, stage_dir: str, n_chunks: int = 4
) -> str:
    """Stage the batch ``documents`` table as ``n_chunks`` parquet files
    in doc_id order — each file is one micro-batch under
    ``maxFilesPerTrigger=1``."""
    docs = _with_ingest_ts(load_tables(spark, sf_dir)["documents"])
    n = docs.count()
    per = (n + n_chunks - 1) // n_chunks
    chunk = F.floor(F.col("doc_id") / per).cast("int")
    (
        docs.withColumn("__chunk", chunk)
        .repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(stage_dir)
    )
    return stage_dir


def read_doc_stream(
    spark: SparkSession, stage_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    # copy — StructType.add would mutate the shared catalog schema
    schema = T.StructType(
        list(SCHEMAS["documents"].fields)
        + [T.StructField("ingest_ts", T.TimestampType())]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(stage_dir)
    )


def quality_gate(docs: DataFrame) -> DataFrame:
    """The streaming quality filter — identical predicates batch-side.
    Adds ``fingerprint`` (md5 of text, the dedup key) on the way out."""
    words = F.split(F.col("text"), " ")
    symbol_ratio = F.length(
        F.regexp_replace("text", "[a-zA-Z ]", "")
    ).cast("double") / F.length("text")
    return (
        docs.filter(F.length("text") > 0)
        .filter(F.size(words).between(MIN_TOKENS, MAX_TOKENS))
        .filter(symbol_ratio <= MAX_SYMBOL_RATIO)
        .withColumn("fingerprint", F.md5("text"))
    )


def clean_doc_stream(stream: DataFrame, watermark: str = "60 minutes") -> DataFrame:
    """Quality gate → exact-dup drop within the watermark horizon.
    State carries only (fingerprint, ingest_ts); a duplicate arriving
    later than the horizon is admitted again (the documented streaming
    relaxation — full-history dedup is the batch job's contract)."""
    return (
        quality_gate(stream)
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def admission_counts(clean: DataFrame, window: str = "30 minutes") -> DataFrame:
    """Per-(window, lang) admitted-document counts — the ingest monitor."""
    return (
        clean.groupBy(F.window("ingest_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_admitted"))
        .select("w.start", "w.end", "lang", "n_admitted")
    )


def batch_clean_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch computation the stream must agree with: same gate,
    first-arrival winner per fingerprint (min ingest_ts ⇔ min doc_id
    here, since ingest time is monotone in doc_id modulo wrap —
    equality is asserted on the admitted fingerprint SET and counts,
    which are arrival-order-free)."""
    docs = _with_ingest_ts(load_tables(spark, sf_dir)["documents"])
    return quality_gate(docs).groupBy("fingerprint").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min("ingest_ts").alias("ingest_ts"),
    )
