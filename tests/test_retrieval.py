"""BM25 ranked retrieval: scoring invariants and a hand-computed
pinned value. Cross-engine exactness is covered by the registered
oracle in test_oracle.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clickhouse_build_spark.plans.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_SCALE,
    BM25_TERMS,
    BM25_TOPK,
    bm25_scores,
    doc_bm25_topk,
)
from tests.conftest import SF_SMOKE


def test_topk_is_ordered_and_bounded(spark):
    rows = doc_bm25_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= BM25_TOPK
    keys = [(-r.score_x1e6, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    assert all(1 <= r.n_terms <= len(BM25_TERMS) for r in rows)
    assert all(r.score_x1e6 > 0 for r in rows)


def test_score_matches_hand_computed_bm25(spark):
    """Recompute one document's score in plain Python floats with the
    same program order and assert the integerized sum matches."""
    from clickhouse_build_spark.catalog import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    base = (
        docs.filter(F.length("text") > 0)
        .select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
        .select("doc_id", F.size("toks").alias("dl"), "toks")
    )
    n_docs, total_len = base.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).first()
    scored = {r.doc_id: r for r in bm25_scores(docs).collect()}
    assert scored
    target = min(scored)  # any matching doc works; pick deterministically
    row = base.filter(F.col("doc_id") == target).first()
    expected = 0
    for term in BM25_TERMS:
        tf = sum(1 for w in row.toks if w == term)
        if tf == 0:
            continue
        # df per term, recomputed independently of the operator
        df = (
            base.select("doc_id", F.explode("toks").alias("w"))
            .filter(F.col("w") == term)
            .select("doc_id")
            .distinct()
            .count()
        )
        idf = math.log(1.0 + ((float(n_docs - df) + 0.5) / (float(df) + 0.5)))
        denom = (
            float(tf)
            + BM25_K1 * (1.0 - BM25_B)
            + ((BM25_K1 * BM25_B * float(row.dl)) * float(n_docs))
            / float(total_len)
        )
        expected += int(
            math.floor((idf * (float(tf) * (BM25_K1 + 1.0))) / denom * BM25_SCALE + 0.5)
        )
    assert scored[target].score_x1e6 == expected


def test_rare_term_dominates_ranking(spark):
    """'dup' is the planted-clone marker (rare → high idf): every doc
    containing it must outscore any doc matching only common terms with
    comparable tf."""
    from clickhouse_build_spark.catalog import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    has_dup = {
        r.doc_id
        for r in docs.filter(
            F.array_contains(F.split(F.lower("text"), " "), "dup")
        )
        .select("doc_id")
        .collect()
    }
    if not has_dup:
        return  # sf without planted dups — nothing to assert
    top = doc_bm25_topk(spark, SF_SMOKE).collect()
    assert any(r.doc_id in has_dup for r in top)
