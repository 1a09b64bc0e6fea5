"""Streaming media ingest: the live-tail twin of the at-rest media
corpus.

Batch-side, ``plans/multimodal.py:shared_media_corpus`` encodes the
corpus once and lands it as kind-partitioned parquet. This module is
the same ingest as a stream: a file-source of document rows drives the
payload-encode kernel (``operators/multimodal.py:media_from_documents``
— the seam where production reads object-store bytes), and
``foreachBatch`` appends each micro-batch to the SAME kind-partitioned
parquet layout the batch writer uses. Checkpointing makes the append
exactly-once per input file; downstream feature queries
(``extract_image_features`` etc.) read the growing corpus identically
either way — the Kappa rule the events and document pipelines already
follow.

100 TB notes: payload bytes exist only inside the micro-batch (bounded
by the source's ``maxFilesPerTrigger`` × the kernel's 256-row Arrow
slices); the append is partitioned by kind so consumers keep partition
pruning; no state store is involved (encode is stateless), so the only
streaming state is the file-source log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from clickhouse_build_spark.operators.multimodal import media_from_documents

_DOC_ID_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType())])


def read_doc_id_stream(
    spark: SparkSession, stage_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of arriving document ids (the ingest
    manifest); payloads are derived/fetched downstream."""
    return (
        spark.readStream.schema(_DOC_ID_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(stage_dir)
    )


def stream_media_ingest(
    spark: SparkSession,
    stage_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Drain every staged-but-unprocessed document file into the
    at-rest media corpus: encode real container bytes per micro-batch,
    append kind-partitioned parquet, exactly once per input file.

    Returns the terminated query (``availableNow`` trigger — bounded
    catch-up, same shape as ``pipeline.stream_ingest``)."""
    docs = read_doc_id_stream(spark, stage_dir, max_files_per_trigger)
    media = media_from_documents(docs, kinds=None, real_payloads=True)

    def append_batch(batch: DataFrame, _batch_id: int) -> None:
        batch.write.mode("append").partitionBy("kind").parquet(corpus_dir)

    q = (
        media.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
