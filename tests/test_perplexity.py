"""Bigram LM perplexity family: model boundedness, scoring semantics
(incl. the unseen-bigram backoff a frozen model needs for novel docs),
and band partitioning. Cross-engine exactness is covered by the
registered oracles in test_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.plans.perplexity import (
    PPL_BUCKETS,
    corpus_perplexity_bands,
    doc_bigram_buckets,
    doc_lm_perplexity,
    score_perplexity,
    shared_lm_model,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def model(spark):
    return shared_lm_model(spark, SF_SMOKE)


def test_model_bounded_by_bucket_space(spark, model):
    m, c1 = model
    rows = m.collect()
    assert 0 < len(rows) <= PPL_BUCKETS * PPL_BUCKETS
    assert all(0 <= r.b1 < PPL_BUCKETS and 0 <= r.b2 < PPL_BUCKETS for r in rows)
    # left-context totals derive exactly from the conditional counts
    derived = {
        r.b1: r.s for r in m.groupBy("b1").agg(F.sum("c12").alias("s")).collect()
    }
    assert {r.b1: r.c1 for r in c1.collect()} == derived


def test_scores_are_consistent_integer_arithmetic(spark):
    rows = doc_lm_perplexity(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.nll_sum_x1e6 > 0
        # avg is the floored integer quotient
        assert r.avg_nll_x1e6 * r.n_bigrams <= r.nll_sum_x1e6
        assert (r.avg_nll_x1e6 + 1) * r.n_bigrams > r.nll_sum_x1e6


def test_novel_docs_score_via_backoff(spark, model):
    """A frozen model scoring documents it never saw: common text must
    score better (lower NLL) than gibberish whose every bigram falls
    back to the left-context-only likelihood."""
    m, c1 = model
    docs = spark.createDataFrame(
        [
            (1, "the data of the data of the data of the data", "t"),
            (2, "zzqx jjvw qqpl wwrt zzqx jjvw qqpl wwrt zzqx", "t"),
        ],
        "doc_id long, text string, source string",
    )
    scored = {
        r.doc_id: r
        for r in score_perplexity(doc_bigram_buckets(docs), m, c1).collect()
    }
    assert set(scored) == {1, 2}  # every novel doc gets a verdict
    assert scored[1].avg_nll_x1e6 < scored[2].avg_nll_x1e6


def test_bands_partition_the_scored_corpus(spark):
    scored_n = doc_lm_perplexity(spark, SF_SMOKE).count()
    bands = corpus_perplexity_bands(spark, SF_SMOKE).collect()
    assert {r.band for r in bands} <= {"head", "middle", "tail"}
    assert sum(r.docs for r in bands) == scored_n
    for r in bands:
        assert r.min_avg_nll_x1e6 <= r.max_avg_nll_x1e6
