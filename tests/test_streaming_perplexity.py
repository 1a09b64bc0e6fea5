"""Streaming perplexity admission e2e: drip-fed documents scored
against the at-rest bigram LM must be ROW-IDENTICAL to the batch
``doc_lm_perplexity`` output, a replayed drain must converge, and a
novel doc must score through the backoff path."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans import REGISTRY
from clickhouse_build_spark.streaming.perplexity import (
    build_lm_model_store,
    read_perplexity_verdicts,
    stream_perplexity_admission,
)

SF = "/root/testdata/sf0.001"

_COLS = ["doc_id", "n_bigrams", "nll_sum_x1e6", "avg_nll_x1e6"]


def _stage_docs(spark, sf_dir, stage_dir, n_chunks=3):
    docs = load_tables(spark, sf_dir)["documents"]
    per = (docs.count() + n_chunks - 1) // n_chunks
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


def test_streamed_scores_equal_batch_lm(spark, tmp_path):
    stage = str(tmp_path / "stage")
    store = str(tmp_path / "store")
    out = str(tmp_path / "scores")

    _stage_docs(spark, SF, stage, n_chunks=3)
    build_lm_model_store(spark, SF, store)
    stream_perplexity_admission(spark, stage, store, out, str(tmp_path / "ck"))

    batch = REGISTRY["doc_lm_perplexity"].builder(spark, SF).select(*_COLS)
    streamed = read_perplexity_verdicts(spark, out).select(*_COLS)

    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # replay with a fresh checkpoint: epoch-keyed overwrite converges
    stream_perplexity_admission(spark, stage, store, out, str(tmp_path / "ck2"))
    replayed = read_perplexity_verdicts(spark, out).select(*_COLS)
    assert replayed.count() == batch.count()
    assert replayed.exceptAll(batch).count() == 0


def test_novel_stream_doc_scores_via_backoff(spark, tmp_path):
    """A streamed doc whose every bigram is absent from the frozen model
    still gets a score: each bigram backs off to the left-context-only
    likelihood (and to the uniform floor when even the left context is
    unseen) — no doc is silently dropped by the gate."""
    from clickhouse_build_spark.plans.perplexity import (
        doc_bigram_buckets,
        score_perplexity,
        shared_lm_model,
    )

    model, c1 = shared_lm_model(spark, SF)
    empty_model = model.filter(F.lit(False))
    docs = load_tables(spark, SF)["documents"].limit(5)
    out = score_perplexity(doc_bigram_buckets(docs), empty_model, c1).collect()
    assert len(out) == 5
    assert all(r.n_bigrams >= 1 and r.nll_sum_x1e6 > 0 for r in out)


def test_degenerate_docs_still_get_verdict_rows(spark, tmp_path):
    """A one-token or empty document has no bigram evidence but must
    NOT bypass the gate: it lands with n_bigrams = 0 and a NULL
    average for explicit policy routing."""
    stage = str(tmp_path / "stage")
    store = str(tmp_path / "store")
    out = str(tmp_path / "scores")

    docs = load_tables(spark, SF)["documents"].limit(3)
    extra = spark.createDataFrame(
        [(900001, "solo", "synthetic"), (900002, "", "synthetic")],
        "doc_id long, text string, source string",
    )
    docs.select("doc_id", "text", "source").unionByName(extra).coalesce(
        1
    ).write.mode("overwrite").parquet(stage + "/__chunk=0")

    build_lm_model_store(spark, SF, store)
    stream_perplexity_admission(spark, stage, store, out, str(tmp_path / "ck"))

    rows = {r.doc_id: r for r in read_perplexity_verdicts(spark, out).collect()}
    assert set(rows) >= {900001, 900002}  # nothing bypassed the gate
    for d in (900001, 900002):
        assert rows[d].n_bigrams == 0
        assert rows[d].nll_sum_x1e6 == 0
        assert rows[d].avg_nll_x1e6 is None
    assert all(
        r.n_bigrams > 0 for d, r in rows.items() if d not in (900001, 900002)
    )
