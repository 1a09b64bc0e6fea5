"""Streaming media ingest: the live-tail twin of the at-rest media
corpus.

Batch-side, ``plans/multimodal.py:shared_media_corpus`` encodes the
corpus once and lands it as kind-partitioned parquet. This module is
the same ingest as a stream: a file-source of document rows drives the
payload-encode kernel (``operators/multimodal.py:media_from_documents``
— the seam where production reads object-store bytes), and
``foreachBatch`` lands each micro-batch under a deterministic
epoch-keyed subdirectory of the same kind-partitioned layout,
OVERWRITING on replay — checkpoint + idempotent sink is what upgrades
foreachBatch's at-least-once delivery to exactly-once (a blind append
would duplicate rows if the job died between sink write and checkpoint
commit). Downstream feature queries (``extract_image_features`` etc.)
read the growing corpus identically either way (via
:func:`read_media_corpus`) — the Kappa rule the events and document
pipelines already follow.

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
    land kind-partitioned parquet, exactly once per input file.

    Exactly-once mechanics (ADVICE r05): ``foreachBatch`` is inherently
    at-least-once — a failure between the sink write and the checkpoint
    commit replays the micro-batch — so a blind ``append`` would
    duplicate rows on retry. Each micro-batch therefore OVERWRITES its
    own deterministic ``ingest_batch=<epoch>`` subdirectory: a replayed
    epoch rewrites the same path and the corpus converges to one copy
    per input row (overwrite idempotence, the same trick Spark's own
    exactly-once file sink uses via its output commit log). Read the
    corpus back through :func:`read_media_corpus`, which hides the
    bookkeeping partition column.

    Returns the terminated query (``availableNow`` trigger — bounded
    catch-up, same shape as ``pipeline.stream_ingest``)."""
    docs = read_doc_id_stream(spark, stage_dir, max_files_per_trigger)
    media = media_from_documents(docs, kinds=None, real_payloads=True)

    def land_batch(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").partitionBy("kind").parquet(
            f"{corpus_dir}/ingest_batch={batch_id}"
        )

    q = (
        media.writeStream.foreachBatch(land_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_media_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """Read a streamed-in media corpus back in the batch corpus's
    schema: partition discovery yields ``ingest_batch`` (the epoch
    bookkeeping) and ``kind``; consumers see only the media columns +
    kind, so batch and streamed corpora are interchangeable. Kind
    filters still prune partitions — kind is the second directory
    level, and pruning composes across levels."""
    return spark.read.parquet(corpus_dir).select(
        "media_id", "kind", "payload", "meta"
    )
