"""Streaming quality admission e2e: drip-fed documents scored against
the at-rest trained model must be ROW-IDENTICAL to the batch
``doc_quality_classifier`` decision, and a replayed drain must
converge instead of duplicating rows."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans import REGISTRY
from clickhouse_build_spark.streaming.quality import (
    build_quality_model_store,
    read_quality_verdicts,
    stream_quality_admission,
)

SF = "/root/testdata/sf0.001"


def _stage_docs(spark, sf_dir, stage_dir, n_chunks=3):
    docs = load_tables(spark, sf_dir)["documents"]
    n = docs.count()
    per = (n + n_chunks - 1) // n_chunks
    rank = F.floor(
        (F.row_number().over(Window.orderBy("doc_id")) - 1) / per
    ).cast("int")
    (
        docs.withColumn("__chunk", rank)
        .repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(stage_dir)
    )
    return n


def test_streamed_admission_equals_batch_classifier(spark, tmp_path):
    stage = str(tmp_path / "stage")
    store = str(tmp_path / "store")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    n = _stage_docs(spark, SF, stage, n_chunks=3)
    build_quality_model_store(spark, SF, store)
    stream_quality_admission(spark, stage, store, out, ckpt)

    streamed = read_quality_verdicts(spark, out).select(
        "doc_id", "label_good", "score_x1e6", "pred_good"
    )
    batch = REGISTRY["doc_quality_classifier"].builder(spark, SF)

    assert streamed.count() == n
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # replay with a fresh checkpoint: epoch-keyed overwrite converges
    stream_quality_admission(spark, stage, store, out, str(tmp_path / "ck2"))
    replayed = read_quality_verdicts(spark, out).select(
        "doc_id", "label_good", "score_x1e6", "pred_good"
    )
    assert replayed.count() == n
    assert replayed.exceptAll(batch).count() == 0


def test_novel_doc_gets_neutral_verdict(spark, tmp_path):
    """ADVICE r07: a streamed doc whose tokens ALL hash to buckets the
    trained model never saw must still get a verdict (left-join model,
    unseen buckets neutral) — score = prior exactly — and a partially
    unseen doc scores its seen tokens plus 0 for the rest."""
    from clickhouse_build_spark.plans.quality import (
        label_documents,
        score_documents,
        shared_quality_model,
    )

    model, priors = shared_quality_model(spark, SF)
    # empty model = every bucket unseen: the degenerate extreme of the
    # novel-doc case, independent of which buckets sf0.001 trained
    empty_model = model.filter(F.lit(False))
    docs = load_tables(spark, SF)["documents"].limit(5)
    out = score_documents(label_documents(docs), empty_model, priors).collect()
    prior = priors.collect()[0]["prior_x1e6"]
    assert len(out) == 5
    assert all(r["score_x1e6"] == prior for r in out)


def test_redropped_doc_resolves_to_latest_epoch(spark, tmp_path):
    """ADVICE r07: the same doc staged in two different micro-batches
    appears ONCE in read_quality_verdicts, resolved to max(ingest_batch)."""
    stage = str(tmp_path / "stage")
    store = str(tmp_path / "store")
    out = str(tmp_path / "verdicts")

    docs = load_tables(spark, SF)["documents"]
    build_quality_model_store(spark, SF, store)
    # chunk 0: docs 0-9; chunk 1: docs 5-14 — ids 5-9 staged twice
    a = docs.orderBy("doc_id").limit(10)
    b = docs.orderBy("doc_id").limit(15).exceptAll(docs.orderBy("doc_id").limit(5))
    a.coalesce(1).write.mode("overwrite").parquet(stage + "/__chunk=0")
    b.coalesce(1).write.mode("overwrite").parquet(stage + "/__chunk=1")
    stream_quality_admission(spark, stage, store, out, str(tmp_path / "ck"))

    verdicts = read_quality_verdicts(spark, out)
    n_docs = docs.orderBy("doc_id").limit(15).count()
    assert verdicts.count() == n_docs  # 15 distinct docs, no dup rows
    assert verdicts.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_admission_totals_match_filter_report(spark, tmp_path):
    stage = str(tmp_path / "stage")
    store = str(tmp_path / "store")
    out = str(tmp_path / "verdicts")

    _stage_docs(spark, SF, stage, n_chunks=2)
    build_quality_model_store(spark, SF, store)
    stream_quality_admission(spark, stage, store, out, str(tmp_path / "ck"))

    per_source = (
        read_quality_verdicts(spark, out)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pred_good").cast("long").alias("n_admitted"),
        )
    )
    report = REGISTRY["corpus_quality_filter"].builder(spark, SF).select(
        "source", "n_docs", "n_admitted"
    )
    assert per_source.exceptAll(report).count() == 0
    assert report.exceptAll(per_source).count() == 0
