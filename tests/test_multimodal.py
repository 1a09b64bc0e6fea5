"""Multimodal plumbing tests: schemas, Arrow batch round-trips, frame
fan-out, determinism, and the marked real-decode seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.operators.multimodal import (
    FRAME_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    decode_media_real,
    extract_image_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=24).cache()


def test_media_schema_and_kinds(media):
    assert media.schema == MEDIA_SCHEMA
    counts = {r.kind: r["count"] for r in media.groupBy("kind").count().collect()}
    assert counts == {"image": 8, "audio": 8, "video": 8}
    sizes = {
        r.kind: r.sz
        for r in media.select("kind", F.length("payload").alias("sz")).distinct().collect()
    }
    assert sizes == {"image": 4096, "audio": 8192, "video": 16384}


def test_image_features_schema_and_determinism(media):
    feats = extract_image_features(media)
    assert feats.schema == IMAGE_FEATURES_SCHEMA
    rows1 = sorted((r.media_id, r.mean_luma, r.phash) for r in feats.collect())
    rows2 = sorted(
        (r.media_id, r.mean_luma, r.phash)
        for r in extract_image_features(media).collect()
    )
    assert rows1 == rows2  # stable across runs (retry/speculation safety)
    assert len(rows1) == 8  # images only — kind filter prunes before Python
    assert all(0 <= r[1] <= 255 for r in rows1)
    assert all(r[2] >= 0 for r in rows1)


def test_resize_preserves_schema_updates_meta(media):
    out = resize_images(media, 32, 24)
    assert out.schema == MEDIA_SCHEMA
    rows = out.select("media_id", "meta.width", "meta.height", F.length("payload").alias("sz")).collect()
    assert len(rows) == 8
    assert all((r.width, r.height, r.sz) == (32, 24, 32 * 24 // 4) for r in rows)
    # resize is deterministic in (payload, target size)
    a = {r.media_id: bytes(r.payload) for r in out.select("media_id", "payload").collect()}
    b = {r.media_id: bytes(r.payload) for r in resize_images(media, 32, 24).select("media_id", "payload").collect()}
    assert a == b


def test_frame_fanout_counts_match_duration(media):
    frames = sample_frames(media, every_ms=500)
    assert frames.schema == FRAME_SCHEMA
    got = {
        r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r.media_id: (r.duration_ms + 499) // 500
        for r in media.filter(F.col("kind") == "video")
        .select("media_id", "meta.duration_ms")
        .collect()
    }
    assert got == want
    idx = frames.filter(F.col("media_id") == 2).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in idx] == list(range(len(idx)))
    assert all(r.frame_ms == r.frame_idx * 500 for r in idx)


def test_real_decode_seam_is_marked(media):
    with pytest.raises(NotImplementedError, match="stubbed|production-only"):
        decode_media_real(b"\x89PNG", "png")
    with pytest.raises(Exception):
        # the non-fake path must fail loudly, not silently fake
        extract_image_features(media, fake=False).collect()


def test_audio_chunking_fanout_and_determinism(spark):
    from clickhouse_build_spark.operators.multimodal import chunk_audio, synthetic_media

    media = synthetic_media(spark, n=12)
    chunks = chunk_audio(media, window_ms=250)
    rows = chunks.collect()
    # every audio row fans out to ceil(duration/250) chunks
    audio = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect() if r["kind"] == "audio"}
    got = {}
    for r in rows:
        got[r["media_id"]] = got.get(r["media_id"], 0) + 1
        assert r["end_ms"] <= audio[r["media_id"]]
        assert 0 <= r["rms_x1e6"] < 1_000_000
    assert got == {mid: -(-dur // 250) for mid, dur in audio.items()}
    # deterministic across recomputation
    again = {(r["media_id"], r["chunk_idx"]): r["rms_x1e6"] for r in chunk_audio(media, window_ms=250).collect()}
    first = {(r["media_id"], r["chunk_idx"]): r["rms_x1e6"] for r in rows}
    assert first == again


def test_audio_chunks_have_no_payload_column(spark):
    from clickhouse_build_spark.operators.multimodal import chunk_audio, synthetic_media

    chunks = chunk_audio(synthetic_media(spark, n=6))
    assert "payload" not in chunks.columns  # binaries never cross a shuffle
