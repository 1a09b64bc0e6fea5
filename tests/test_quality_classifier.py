"""Trained quality classifier (plans/quality.py): planted-corpus unit
tests for labeling, training counts, fixed-point llr, separation, and
the session-artifact lifecycle. The DuckDB oracle equivalence runs in
the registry-wide gate (test_oracle.py)."""

import hashlib
import math

from pyspark.sql import functions as F

from clickhouse_build_spark.plans import REGISTRY
from clickhouse_build_spark.plans.quality import (
    QC_BUCKETS,
    QC_HASH_SEED,
    QC_SCALE,
    QC_STOP,
    _labeled,
    doc_quality_classifier,
    doc_quality_classifier_model,
    corpus_quality_filter,
    shared_quality_model,
)


def _docs_dir(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(d + "/documents.parquet")
    return d


def _bucket(w: str) -> int:
    return int(hashlib.md5(f"{QC_HASH_SEED}:{w}".encode()).hexdigest()[:8], 16) % QC_BUCKETS


GOOD_WORDS = ("table", "query", "scan", "join")
BAD_WORDS = ("zzz", "qqq", "xxx")


def _good_text(i: int) -> str:
    # >= 20 tokens, >= 3% stopwords, letters+spaces only
    return " ".join(
        ["the", "a", "of"] + [GOOD_WORDS[(i + j) % 4] for j in range(22)]
    )


def _bad_text(i: int) -> str:
    # 3 tokens -> outside the length band, junk vocabulary
    return " ".join(BAD_WORDS[(i + j) % 3] for j in range(3))


def _planted(spark, tmp_path, n_good=8, n_bad=5):
    rows = [
        (i, _good_text(i), "en", "srcg", 0) for i in range(n_good)
    ] + [
        (100 + i, _bad_text(i), "en", "srcb", 0) for i in range(n_bad)
    ]
    return _docs_dir(spark, tmp_path, rows), rows


def test_labels_match_integer_heuristic(spark, tmp_path):
    d, rows = _planted(spark, tmp_path)
    lab = {r["doc_id"]: r["label_good"] for r in _labeled(spark, d).collect()}
    for doc_id, text, *_ in rows:
        toks = text.split(" ")
        stop_hits = sum(1 for w in text.lower().split(" ") if w in QC_STOP)
        sym = sum(1 for c in text if not (c.isalpha() or c == " "))
        want = int(
            20 <= len(toks) <= 1000
            and stop_hits * 100 >= 3 * len(toks)
            and sym * 10 <= len(text)
        )
        assert lab[doc_id] == want, doc_id


def test_model_counts_match_hand_hashing(spark, tmp_path):
    d, rows = _planted(spark, tmp_path)
    model = {r["bucket"]: r for r in doc_quality_classifier_model(spark, d).collect()}
    assert len(model) <= QC_BUCKETS

    want: dict[int, list[int]] = {}
    tg = tb = 0
    for doc_id, text, *_ in rows:
        good = doc_id < 100  # planted: good docs pass the heuristic
        for w in text.lower().split(" "):
            b = _bucket(w)
            e = want.setdefault(b, [0, 0])
            e[0 if good else 1] += 1
            if good:
                tg += 1
            else:
                tb += 1
    assert set(model) == set(want)
    for b, (cg, cb) in want.items():
        assert (model[b]["cg"], model[b]["cb"]) == (cg, cb), b
        # fixed-point llr: same left-assoc combination in Python floats
        llr = math.floor(
            (
                math.log(float(cg + 1))
                - math.log(float(tg + QC_BUCKETS))
                - math.log(float(cb + 1))
                + math.log(float(tb + QC_BUCKETS))
            )
            * QC_SCALE
            + 0.5
        )
        assert model[b]["llr_x1e6"] == llr, b


def test_classifier_separates_planted_tiers(spark, tmp_path):
    d, _ = _planted(spark, tmp_path)
    out = {r["doc_id"]: r for r in doc_quality_classifier(spark, d).collect()}
    good_scores = [r["score_x1e6"] for i, r in out.items() if i < 100]
    bad_scores = [r["score_x1e6"] for i, r in out.items() if i >= 100]
    # disjoint vocabularies -> complete separation, 100% agreement
    assert min(good_scores) > max(bad_scores)
    for i, r in out.items():
        assert r["pred_good"] == r["label_good"] == (1 if i < 100 else 0), i


def test_filter_report_counts(spark, tmp_path):
    d, _ = _planted(spark, tmp_path, n_good=8, n_bad=5)
    rep = {r["source"]: r for r in corpus_quality_filter(spark, d).collect()}
    assert rep["srcg"]["n_docs"] == 8
    assert rep["srcg"]["n_admitted"] == 8
    assert rep["srcg"]["n_agree"] == 8
    assert rep["srcb"]["n_docs"] == 5
    assert rep["srcb"]["n_rejected"] == 5
    assert rep["srcb"]["n_agree"] == 5


def test_model_is_session_cached(spark, tmp_path):
    d, _ = _planted(spark, tmp_path)
    m1 = shared_quality_model(spark, d)
    m2 = shared_quality_model(spark, d)
    assert m1[0] is m2[0] and m1[1] is m2[1]


def test_single_class_corpus_still_scores(spark, tmp_path):
    # all-bad corpus: Laplace smoothing keeps priors and llr finite
    rows = [(i, _bad_text(i), "en", "srcb", 0) for i in range(6)]
    d = _docs_dir(spark, tmp_path, rows)
    out = doc_quality_classifier(spark, d).collect()
    assert len(out) == 6
    for r in out:
        assert r["label_good"] == 0
        assert r["pred_good"] in (0, 1)
        assert isinstance(r["score_x1e6"], int)


def test_scoring_plan_broadcasts_model(spark):
    # the model join must be a broadcast, never a shuffled join
    df = doc_quality_classifier(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_curated_corpus_is_the_intersection_of_its_gates(spark):
    # set algebra against the component queries on the real corpus
    sf = "/root/testdata/sf0.001"
    curated = {
        r["doc_id"]: r
        for r in REGISTRY["curated_training_corpus"].builder(spark, sf).collect()
    }
    admitted = {
        r["doc_id"]
        for r in REGISTRY["doc_quality_classifier"].builder(spark, sf).collect()
        if r["pred_good"] == 1
    }
    keepers = {
        r["doc_id"]
        for r in REGISTRY["doc_fuzzy_dedup_keepers"].builder(spark, sf).collect()
        if r["keeper"] == r["doc_id"]
    }
    contaminated = {
        r["doc_id"]
        for r in REGISTRY["doc_contamination_screen"].builder(spark, sf).collect()
    }
    want = {
        d
        for d in admitted & keepers
        if d % 100 != 0 and d not in contaminated
    }
    assert set(curated) == want
    assert all(r["split"] in ("train", "val", "test") for r in curated.values())
    assert all(r["n_tokens"] > 0 for r in curated.values())
