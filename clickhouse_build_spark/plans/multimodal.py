"""Registered multimodal queries.

The decode stage is a deterministic fake (no codec libraries in this
environment; see ``operators/multimodal.py`` for the marked production
seam), but everything around it is real and ORACLE-CHECKED: the media
corpus derives from the driver's ``documents`` table (rows scale with
the scale factor), payloads are md5 chains whose first block equals
``md5('media:' || media_id)``, and every fake feature is a pure md5/hex
function of that digest — so DuckDB reproduces the full pipeline in SQL
(same portable-hash trick as ``operators/dedup.py:portable_hash_sql``)
and the driver's hash gate verifies the mapInPandas kernels exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.operators.multimodal import (
    chunk_audio,
    extract_image_features,
    media_from_documents,
    sample_frames,
)
from clickhouse_build_spark.plans.registry import query

# DuckDB twin of the media derivation in media_from_documents: digest,
# kind and metadata are pure functions of doc_id.
_MEDIA_CTE = """
    media AS (
        SELECT doc_id AS media_id,
               doc_id % 3 AS kind_idx,
               md5('media:' || CAST(doc_id AS VARCHAR)) AS h,
               CAST(1000 * (1 + doc_id % 5) AS INTEGER) AS duration_ms
        FROM documents
    )
"""

# sum of the first 16 payload bytes == sum of the digest's hex pairs
_LUMA_SUM = " + ".join(
    f"('0x' || substr(h, {2 * i + 1}, 2))::BIGINT" for i in range(16)
)


@query(
    "media_image_features",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id,
           CAST(64 + (media_id % 4) * 32 AS INTEGER) AS width,
           CAST(48 + (media_id % 3) * 16 AS INTEGER) AS height,
           ({_LUMA_SUM}) / 16.0 AS mean_luma,
           ('0x' || substr(h, 1, 15))::BIGINT AS phash
    FROM media WHERE kind_idx = 0
    """,
    tags=("multimodal", "mapInPandas"),
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction: binary payload → (width, height,
    mean_luma, phash) via Arrow-batched mapInPandas over the sf-scaled
    media corpus derived from ``documents``."""
    docs = load_tables(spark, sf_dir)["documents"]
    media = media_from_documents(docs, kinds=("image",))
    return extract_image_features(media).orderBy("media_id")


@query(
    "media_video_frame_sample",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id,
           CAST(ms // 500 AS INTEGER) AS frame_idx,
           CAST(ms AS INTEGER) AS frame_ms,
           ('0x' || substr(md5('frame:' || h || ':' || CAST(ms AS VARCHAR)),
                           1, 8))::BIGINT AS frame_fp
    FROM media, UNNEST(range(0, duration_ms, 500)) AS t(ms)
    WHERE kind_idx = 2
    """,
    tags=("multimodal", "fan-out"),
)
def media_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out (one row → duration/500ms frame
    rows) with a per-frame fingerprint; frame payloads are dropped
    before the sort — binaries never cross the shuffle."""
    docs = load_tables(spark, sf_dir)["documents"]
    media = media_from_documents(docs, kinds=("video",))
    frames = sample_frames(media, every_ms=500, with_payload=False)
    return frames.select("media_id", "frame_idx", "frame_ms", "frame_fp").orderBy(
        "media_id", "frame_idx"
    )


@query(
    "media_audio_chunks",
    oracle=f"""
    WITH {_MEDIA_CTE},
    chunks AS (
        SELECT media_id, duration_ms,
               ('0x' || substr(md5('rms:' || h || ':' || CAST(ms AS VARCHAR)),
                               1, 12))::BIGINT % 1000000 AS rms
        FROM media, UNNEST(range(0, duration_ms, 250)) AS t(ms)
        WHERE kind_idx = 1
    )
    SELECT media_id,
           count(*) AS n_chunks,
           CAST(max(duration_ms) AS INTEGER) AS duration_ms,
           CAST(floor(avg(rms)) AS BIGINT) AS mean_rms_x1e6
    FROM chunks GROUP BY media_id
    """,
    tags=("multimodal", "audio", "fan-out"),
)
def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing fan-out (one row → duration/250ms chunk rows)
    with per-chunk deterministic RMS energy, then a per-media roll-up
    (chunk count + mean energy) — the ingest-segmentation stage of a
    speech pipeline plus its QA summary."""
    docs = load_tables(spark, sf_dir)["documents"]
    media = media_from_documents(docs, kinds=("audio",))
    chunks = chunk_audio(media, window_ms=250)
    return (
        chunks.groupBy("media_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("end_ms").alias("duration_ms"),
            F.floor(F.avg("rms_x1e6")).cast("long").alias("mean_rms_x1e6"),
        )
        .orderBy("media_id")
    )
