"""Streaming perplexity admission: the live-tail twin of
``doc_lm_perplexity`` / ``corpus_perplexity_bands``.

Batch-side, the bigram LM (plans/perplexity.py) bands a corpus after
the fact. This module runs the same decision as an admission gate on a
STREAM of arriving documents — CCNet's deployment shape: the LM is
trained once on the trusted corpus and materialized AT REST (the ≤B²
row conditional table + the ≤B row left-context totals), and every
micro-batch of new documents is bigrammed, hashed, and scored against
that frozen model BEFORE it lands. Scoring per micro-batch is the
shared ``plans/perplexity.py:score_all_documents`` code — broadcast
model join with left-context backoff plus one integer grouped sum,
and an explicit zero-bigram row for degenerate documents (empty or
one-token text has no bigram evidence but must NOT bypass the gate
unscored) — not a re-implementation; the backoff path is exactly why
the batch scorer carries it (a frozen model WILL meet novel bigrams
here).

Equivalence contract (pytest-asserted,
tests/test_streaming_perplexity.py): streamed admission rows over the
drip-fed corpus are row-identical to the batch ``doc_lm_perplexity``
output, and replaying the stream converges (the epoch-keyed overwrite
sink recipe shared by the media/dedup/quality gates).

100 TB notes: the at-rest model is O(B²) regardless of corpus size, so
the per-batch join always broadcasts; per-batch work is one map-side-
combined integer sum keyed by doc_id; verdicts land epoch-keyed so a
replayed micro-batch overwrites instead of duplicating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_build_spark.plans.perplexity import (
    score_all_documents,
    shared_lm_model,
)
from clickhouse_build_spark.streaming.dedup import read_new_doc_stream


def build_lm_model_store(
    spark: SparkSession, sf_dir: str, store_dir: str
) -> None:
    """Materialize the trained bigram LM AT REST: the (b1, b2, c12,
    nll_x1e6) conditional table and the (b1, c1) left-context totals,
    written as parquet under ``store_dir`` — the deployable artifact
    the admission stream scores against."""
    model, c1 = shared_lm_model(spark, sf_dir)
    model.write.mode("overwrite").parquet(f"{store_dir}/model")
    c1.write.mode("overwrite").parquet(f"{store_dir}/context")


def stream_perplexity_admission(
    spark: SparkSession,
    stage_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Drain staged document files through the LM gate: every
    micro-batch is bigrammed and scored against the at-rest model, and
    its score rows land under an epoch-keyed subdirectory (overwrite on
    replay = idempotent). Returns the terminated availableNow query."""
    model = spark.read.parquet(f"{store_dir}/model")
    c1 = spark.read.parquet(f"{store_dir}/context")
    stream = read_new_doc_stream(spark, stage_dir, max_files_per_trigger)

    def land_batch(batch: DataFrame, batch_id: int) -> None:
        # TOTAL coverage (review r08): a one-token or empty document
        # has no bigram evidence but must still receive a verdict row
        # (n_bigrams = 0, NULL average) — nothing bypasses the gate.
        scored = score_all_documents(batch, model, c1)
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


def read_perplexity_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Score rows across all drained epochs (bookkeeping column
    hidden): (doc_id, source, n_bigrams, nll_sum_x1e6, avg_nll_x1e6).

    Latest-epoch resolution: a doc staged in two DIFFERENT micro-batches
    resolves to its newest score via max(ingest_batch) per doc — the
    same ReplacingMergeTree read rule as the quality and CDC readers.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.read.parquet(out_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("ingest_batch"))
    return (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "source", "n_bigrams", "nll_sum_x1e6", "avg_nll_x1e6")
    )
