"""Registered multimodal queries (rows-only checks — the decode stage
is a deterministic fake because no codec libraries exist in this
environment; see ``operators/multimodal.py``). No DuckDB oracle: the
mapInPandas kernels are not SQL-expressible, so the driver records the
weaker rows-only check for these."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.operators.multimodal import (
    chunk_audio,
    extract_image_features,
    sample_frames,
    synthetic_media,
)
from clickhouse_build_spark.plans.registry import query


@query("media_image_features", oracle=None, tags=("multimodal", "mapInPandas"))
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction over the deterministic synthetic media
    corpus: binary payload → (width, height, mean_luma, phash) via
    Arrow-batched mapInPandas. sf_dir is unused — media is generated,
    not driver-provided."""
    return extract_image_features(synthetic_media(spark, n=24)).orderBy("media_id")


@query("media_video_frame_sample", oracle=None, tags=("multimodal", "fan-out"))
def media_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling fan-out (one row → duration/500ms frame
    rows), payload-free projection of the frame index."""
    frames = sample_frames(synthetic_media(spark, n=24), every_ms=500)
    return frames.select("media_id", "frame_idx", "frame_ms").orderBy(
        "media_id", "frame_idx"
    )


@query("media_audio_chunks", oracle=None, tags=("multimodal", "audio", "fan-out"))
def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing fan-out (one row → duration/250ms chunk rows)
    with per-chunk deterministic RMS energy, then a per-media roll-up
    (chunk count + mean energy) — the ingest-segmentation stage of a
    speech pipeline plus its QA summary."""
    chunks = chunk_audio(synthetic_media(spark, n=24), window_ms=250)
    return (
        chunks.groupBy("media_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("end_ms").alias("duration_ms"),
            F.floor(F.avg("rms_x1e6")).cast("long").alias("mean_rms_x1e6"),
        )
        .orderBy("media_id")
    )
