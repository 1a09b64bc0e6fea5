"""Unit tests for the training-data-pipeline textops added in round 2.

The synthetic corpus contains no PII, so the oracle gate only proves the
Spark and DuckDB regexes agree — these tests plant known PII / repeated /
contaminated text and assert the *semantics* (what gets redacted,
counted, sampled) are right.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_build_spark.plans.textops import (
    PII_EMAIL,
    PII_LONGNUM,
    PII_URL,
    STRAT_RATES_BP,
    STRAT_SCALE,
)


def _scrub(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
                PII_URL,
                "<URL>",
            ),
            PII_LONGNUM,
            "<NUM>",
        ).alias("clean")
    ).head()[0]


def test_pii_scrub_redacts_planted_pii(spark):
    text = (
        "contact alice.smith+x@example.co.uk or visit "
        "https://internal.example.com/reset?t=1 and call 5551234567 now"
    )
    clean = _scrub(spark, text)
    assert "<EMAIL>" in clean
    assert "<URL>" in clean
    assert "<NUM>" in clean
    assert "alice" not in clean
    assert "example.com" not in clean
    assert "5551234567" not in clean


def test_pii_scrub_leaves_clean_text_alone(spark):
    text = "plain prose with short numbers 123 456 and no links"
    assert _scrub(spark, text) == text


def test_pii_email_not_greedy_over_plain_words(spark):
    # An '@' with no domain dot must not match.
    assert _scrub(spark, "user@localhost stays") == "user@localhost stays"


def test_repetition_stats_on_degenerate_doc(spark, tmp_path):
    # "spam spam spam spam" → top token ratio 100%, all bigrams equal.
    rows = [
        (1, "spam spam spam spam", "en", "web", 19),
        (2, "the quick brown fox jumps", "en", "web", 25),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "sf")
    docs.write.parquet(d + "/documents.parquet")
    from clickhouse_build_spark.plans.textops import doc_repetition_stats

    out = {
        r["doc_id"]: r
        for r in doc_repetition_stats(spark, d).collect()
    }
    assert out[1]["top_token_ratio_x10k"] == 10000
    assert out[1]["dup_bigram_ratio_x10k"] > 6000  # 3 bigrams, 1 distinct
    assert out[2]["top_token_ratio_x10k"] == 2000  # 1/5 of tokens
    assert out[2]["dup_bigram_ratio_x10k"] == 0


def test_contamination_screen_flags_copied_benchmark_text(spark, tmp_path):
    bench_text = "the seven wonders of the ancient world are listed here"
    rows = [
        # doc_id 100 → benchmark member (doc_id % 100 == 0)
        (100, bench_text, "en", "web", 54),
        # contains a full 5-gram of the benchmark text
        (1, "prefix words the seven wonders of the ancient suffix", "en", "web", 52),
        # shares words but no 5-gram
        (2, "seven ancient wonders exist in the world today", "en", "web", 46),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "sf")
    docs.write.parquet(d + "/documents.parquet")
    from clickhouse_build_spark.plans.textops import doc_contamination_screen

    hits = {
        r["doc_id"]: r["n_contaminated_shingles"]
        for r in doc_contamination_screen(spark, d).collect()
    }
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits
    assert 100 not in hits  # benchmark rows themselves are excluded


def test_stratified_sample_rates_and_determinism(spark, tmp_path):
    n = 4000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(1).cast("long").alias("n_chars"),
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(d + "/documents.parquet")
    from clickhouse_build_spark.plans.textops import doc_stratified_sample

    kept = doc_stratified_sample(spark, d)
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 'de' is unlisted → keep all 2000.
    assert counts["de"] == n // 2
    # 'en' keeps ~50% (hash-uniform; generous tolerance on 2000 docs).
    rate = STRAT_RATES_BP["en"] / STRAT_SCALE
    assert abs(counts["en"] / (n // 2) - rate) < 0.05
    # Deterministic: same membership on a re-run.
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in doc_stratified_sample(spark, d).collect())
    assert ids1 == ids2


def test_token_histogram_buckets(spark, tmp_path):
    rows = [
        (1, "a b c", "en", "web", 5),  # 3 tokens → bucket 0
        (2, " ".join(["t"] * 12), "en", "web", 23),  # 12 tokens → bucket 10
        (3, " ".join(["t"] * 17), "en", "web", 33),  # 17 tokens → bucket 10
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "sf")
    docs.write.parquet(d + "/documents.parquet")
    from clickhouse_build_spark.plans.textops import doc_token_histogram

    out = {r["bucket"]: r for r in doc_token_histogram(spark, d).collect()}
    assert out[0]["n_docs"] == 1 and out[0]["total_tokens"] == 3
    assert out[10]["n_docs"] == 2 and out[10]["total_tokens"] == 29


def _docs_dir(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(d + "/documents.parquet")
    return d


def test_chunking_window_boundaries(spark, tmp_path):
    # 64-token windows at 48 stride: boundary cases around one window,
    # exactly one stride, and one-past-a-stride.
    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    rows = [
        (1, words(1), "en", "web", 2),    # single token → one 1-token chunk
        (2, words(48), "en", "web", 99),  # == stride → exactly one chunk
        (3, words(49), "en", "web", 99),  # stride+1 → full 49-token first
        # window (window > stride) plus a 1-token tail chunk
        (4, words(64), "en", "web", 99),  # == window → 2 chunks (16-tok tail)
        (5, words(112), "en", "web", 99),  # 64+48 → 3 chunks, full middle
    ]
    d = _docs_dir(spark, tmp_path, rows)
    from clickhouse_build_spark.plans.textops import doc_chunk_text

    out = doc_chunk_text(spark, d).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    sizes = {k: [r["n_toks"] for r in v] for k, v in by_doc.items()}
    assert sizes[1] == [1]
    assert sizes[2] == [48]
    assert sizes[3] == [49, 1]
    assert sizes[4] == [64, 16]
    assert sizes[5] == [64, 64, 16]
    # overlap: doc 5's second chunk starts at token 48, inside chunk 1
    starts = [r["start_tok"] for r in by_doc[5]]
    assert starts == [0, 48, 96]


def test_pack_sequences_matches_naive_global_window(spark, tmp_path):
    # The distributed two-phase prefix sum must equal the naive global
    # cumsum bin assignment, and no bin may exceed budget by more than
    # one straddling document.
    rows = [
        (i, " ".join("w" for _ in range(37 + (i * 131) % 400)),
         "en", "web", 99)
        for i in range(300)
    ]
    d = _docs_dir(spark, tmp_path, rows)
    from clickhouse_build_spark.plans.textops import (
        PACK_BUDGET,
        doc_pack_sequences,
    )

    got = {r["bin_id"]: r for r in doc_pack_sequences(spark, d).collect()}

    # naive reference: driver-side cumsum
    sizes = [(i, 37 + (i * 131) % 400) for i in range(300)]
    cum, bins = 0, {}
    for i, n in sizes:
        bin_id = cum // PACK_BUDGET
        cum += n
        b = bins.setdefault(bin_id, [0, 0, None, None])
        b[0] += 1
        b[1] += n
        b[2] = i if b[2] is None else b[2]
        b[3] = i
    assert set(got) == set(bins)
    for bin_id, (n_docs, total, first, last) in bins.items():
        r = got[bin_id]
        assert (r["n_docs"], r["total_tokens"], r["first_doc"], r["last_doc"]) == (
            n_docs, total, first, last
        ), bin_id
    max_doc = max(n for _, n in sizes)
    for r in got.values():
        assert r["total_tokens"] < PACK_BUDGET + max_doc


def test_pack_sequences_skewed_ids_rebalance_and_same_output(spark):
    """A 100:1-skewed doc_id space (dense cluster + sparse tail) must
    trip the bucket-count check, swap in percentile bounds, balance the
    buckets, and leave the packed output IDENTICAL — bucketing is a
    balance knob, never a correctness one."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from clickhouse_build_spark.plans.textops import (
        monotone_id_buckets,
        pack_sequences,
    )

    nbuckets = 8
    # 450 dense ids in [0, 450) + 50 ids strewn across [1e6, 50e6]
    ids = list(range(450)) + [1_000_000 * (i + 1) for i in range(50)]
    rows = [(i, 30 + (i * 7) % 90) for i in ids]
    t = spark.createDataFrame(rows, "doc_id long, n long")

    bucket, used_pct = monotone_id_buckets(t, nbuckets)
    assert used_pct  # the skew check fired
    counts = [
        r["count"] for r in t.groupBy(bucket.alias("b")).count().collect()
    ]
    mean = sum(counts) / nbuckets
    assert max(counts) <= 4 * mean  # balanced under the same gate
    # ...whereas the raw id-range heuristic piles ~90% into one bucket
    lo, hi = min(ids), max(ids)
    uni = t.groupBy(
        F.expr(f"(doc_id - {lo}) * {nbuckets} DIV ({hi} - {lo} + 1)").alias("b")
    ).count().collect()
    assert max(r["count"] for r in uni) > 4 * mean

    # output invariance: distributed result == single-global-window ref
    budget = 512
    got = {r["bin_id"]: r for r in pack_sequences(t, budget, nbuckets).collect()}
    ref_cum = t.withColumn(
        "cum",
        F.sum("n").over(
            W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    ref = {
        r["bin_id"]: r
        for r in ref_cum.withColumn(
            "bin_id", F.expr(f"(cum - n) DIV {budget}")
        )
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for b in ref:
        g, r = got[b], ref[b]
        assert (g["n_docs"], g["total_tokens"], g["first_doc"], g["last_doc"]) == (
            r["n_docs"], r["total_tokens"], r["first_doc"], r["last_doc"]
        )


def test_pack_sequences_dense_ids_keep_the_free_heuristic(spark):
    from clickhouse_build_spark.plans.textops import monotone_id_buckets

    t = spark.createDataFrame(
        [(i, 40) for i in range(500)], "doc_id long, n long"
    )
    _, used_pct = monotone_id_buckets(t, 8)
    assert not used_pct  # dense ids: no quantile pass spent
