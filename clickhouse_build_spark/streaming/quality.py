"""Streaming quality admission: the live-tail twin of
``doc_quality_classifier`` / ``corpus_quality_filter``.

Batch-side, the trained Naive Bayes scorer (plans/quality.py) filters
a corpus after the fact. This module runs the same decision as an
admission gate on a STREAM of arriving documents — the deployment
shape every production quality filter actually has: the model is
trained once at ingest time and materialized AT REST (the ≤QC_BUCKETS
row llr table + the 1-row prior), and every micro-batch of new
documents is labeled, hashed, and scored against that at-rest model
BEFORE it lands. Scoring per micro-batch is the shared
``plans/quality.py:score_documents`` code — a broadcast model join
plus one integer grouped sum — not a re-implementation.

Equivalence contract (pytest-asserted,
tests/test_streaming_quality.py): streamed admission rows over the
drip-fed corpus are row-identical to the batch
``doc_quality_classifier`` output, and replaying the stream converges
(the epoch-keyed overwrite sink recipe from streaming/media.py).

100 TB notes: the at-rest model is O(QC_BUCKETS) regardless of corpus
size, so the per-batch join always broadcasts; per-batch work is one
map-side-combined integer sum keyed by doc_id; verdicts land
epoch-keyed so a replayed micro-batch overwrites instead of
duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_build_spark.plans.quality import (
    label_documents,
    score_documents,
    shared_quality_model,
)
from clickhouse_build_spark.streaming.dedup import read_new_doc_stream


def build_quality_model_store(
    spark: SparkSession, sf_dir: str, store_dir: str
) -> None:
    """Materialize the trained quality model AT REST: the per-bucket
    fixed-point llr table and the 1-row class prior, written as parquet
    under ``store_dir`` — the deployable artifact the admission stream
    scores against."""
    model, priors = shared_quality_model(spark, sf_dir)
    model.write.mode("overwrite").parquet(f"{store_dir}/model")
    priors.write.mode("overwrite").parquet(f"{store_dir}/prior")


def stream_quality_admission(
    spark: SparkSession,
    stage_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Drain staged document files through the quality gate: every
    micro-batch is labeled and scored against the at-rest model, and
    its admission rows land under an epoch-keyed subdirectory
    (overwrite on replay = idempotent). Returns the terminated
    availableNow query."""
    model = spark.read.parquet(f"{store_dir}/model")
    priors = spark.read.parquet(f"{store_dir}/prior")
    stream = read_new_doc_stream(spark, stage_dir, max_files_per_trigger)

    def land_batch(batch: DataFrame, batch_id: int) -> None:
        scored = score_documents(label_documents(batch), model, priors)
        scored.write.mode("overwrite").parquet(
            f"{out_dir}/ingest_batch={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(land_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_quality_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Admission rows across all drained epochs (bookkeeping column
    hidden): (doc_id, source, label_good, score_x1e6, pred_good).

    Latest-epoch resolution (ADVICE r07): a doc staged in two DIFFERENT
    micro-batches (a re-drop across epochs — the epoch-keyed overwrite
    only dedups replays of the SAME batch id) resolves to its newest
    verdict via max(ingest_batch) per doc, the same ReplacingMergeTree
    read rule the CDC reader uses (sources/replication.py:latest_per_key).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.read.parquet(out_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("ingest_batch"))
    return (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "source", "label_good", "score_x1e6", "pred_good")
    )
