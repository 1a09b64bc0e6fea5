"""Streaming media ingest e2e: staged document-id files → encode
kernel per micro-batch → exactly-once landing into the kind-partitioned
at-rest corpus → features over the ingested corpus match the batch
path bit-for-bit. Exactly-once is checkpoint + IDEMPOTENT epoch-keyed
overwrite (a replayed micro-batch rewrites its own subdir), so a
mid-batch failure retry cannot duplicate rows — asserted below by
replaying a committed epoch's write by hand."""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.operators.multimodal import (
    extract_image_features,
    media_from_documents,
)
from clickhouse_build_spark.streaming.media import (
    read_media_corpus,
    stream_media_ingest,
)

SF = "/root/testdata/sf0.001"


def _stage_ids(spark, sf_dir, stage_dir, n_chunks=3):
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    n = docs.count()
    per = (n + n_chunks - 1) // n_chunks
    (
        docs.withColumn("__chunk", F.floor(F.col("doc_id") / per).cast("int"))
        .repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(stage_dir)
    )
    return n


def test_stream_media_ingest_e2e(spark, tmp_path):
    stage = str(tmp_path / "stage")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    n = _stage_ids(spark, SF, stage, n_chunks=3)

    stream_media_ingest(spark, stage, corpus, ckpt, max_files_per_trigger=1)
    at_rest = read_media_corpus(spark, corpus)

    # every staged doc became exactly one media row, kinds partitioned
    assert at_rest.count() == n
    assert sorted(
        r["kind"] for r in at_rest.select("kind").distinct().collect()
    ) == ["audio", "image", "video"]

    # ingested payloads are REAL containers (both image signatures survive)
    images = at_rest.filter(F.col("kind") == "image")
    png_head = images.filter(F.col("meta.format") == "png").select(
        "payload"
    ).first()["payload"]
    assert bytes(png_head[:8]) == b"\x89PNG\r\n\x1a\n"
    jpg_head = images.filter(F.col("meta.format") == "jpeg").select(
        "payload"
    ).first()["payload"]
    assert bytes(jpg_head[:2]) == b"\xff\xd8"

    # features over the streamed corpus == features over the batch path
    streamed = extract_image_features(at_rest, fake=False)
    batch = extract_image_features(
        media_from_documents(
            load_tables(spark, SF)["documents"],
            kinds=("image",),
            real_payloads=True,
        ),
        fake=False,
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # exactly-once (clean restart): re-running the drained stream adds nothing
    stream_media_ingest(spark, stage, corpus, ckpt, max_files_per_trigger=1)
    assert read_media_corpus(spark, corpus).count() == n

    # exactly-once (mid-batch failure retry): a replay of an ALREADY
    # COMMITTED epoch — the case a blind append would double — must
    # converge, because the sink overwrites its own epoch subdir.
    # Simulate by re-executing epoch 0's landing write by hand (rows
    # pulled to the driver first — Spark refuses a self-overwrite of a
    # path it is lazily reading; a real replay recomputes from source).
    epoch0 = spark.read.parquet(corpus + "/ingest_batch=0")
    replay = spark.createDataFrame(epoch0.collect(), epoch0.schema)
    rows0 = replay.count()
    assert rows0 > 0
    (
        replay.write.mode("overwrite")
        .partitionBy("kind")
        .parquet(corpus + "/ingest_batch=0")
    )
    assert read_media_corpus(spark, corpus).count() == n
    assert spark.read.parquet(corpus + "/ingest_batch=0").count() == rows0

    # late-arriving manifest file → only the delta is ingested
    mx = load_tables(spark, SF)["documents"].agg(F.max("doc_id")).first()[0]
    spark.range(mx + 1, mx + 4).select(
        F.col("id").alias("doc_id")
    ).coalesce(1).write.mode("append").parquet(stage + "/__chunk=99")
    stream_media_ingest(spark, stage, corpus, ckpt, max_files_per_trigger=1)
    assert read_media_corpus(spark, corpus).count() == n + 3
