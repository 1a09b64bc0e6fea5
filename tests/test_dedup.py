"""Unit tests for operators/dedup.py on tiny in-memory corpora —
the oracle equivalence tests live in test_oracle.py (registry)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash,
    simhash_dup_pairs,
    winnow_fingerprints,
    word_shingles,
)

DOC = (
    "the quick brown fox jumps over the lazy dog and runs far away home "
    "while the cat sleeps on the warm mat near the door"
)
DOC_EDITED = DOC.replace("runs far away home", "runs very far away")
DOC_OTHER = (
    "completely different text about spark engines and columnar storage "
    "formats with adaptive query execution and shuffle partitioning maybe"
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, DOC), (2, DOC), (3, DOC_EDITED), (4, DOC_OTHER)],
        ["doc_id", "text"],
    )


def test_word_shingles_count(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    got = {r.shingle for r in word_shingles(df, "doc_id", "text", n=3).collect()}
    assert got == {"a b c", "b c d"}


def test_minhash_finds_exact_and_near_dups(corpus):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(corpus, "doc_id", "text").collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs agree on every component
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5  # small edit stays a dup
    assert not any(4 in p for p in pairs)  # unrelated doc pairs with nothing


def test_simhash_identical_docs_equal_unrelated_far(corpus):
    sig = {r.doc_id: r.simhash for r in simhash(corpus, "doc_id", "text").collect()}
    assert sig[1] == sig[2]
    assert 0 <= sig[1] < 2**32
    ham14 = bin(sig[1] ^ sig[4]).count("1")
    assert ham14 > 5  # unrelated docs must not look like near-dups


def test_simhash_banded_matches_brute_force(spark):
    # 40 synthetic docs; banded candidate search must reproduce the
    # all-pairs result exactly for max_hamming < bands.
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(30))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = simhash(df, "doc_id", "text").cache()
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_dup_pairs(sig, "doc_id", max_hamming=5, bands=8).collect()
    }
    a, b = sig.alias("a"), sig.alias("b")
    hd = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hd.alias("hamming"),
        )
        .filter(F.col("hamming") <= 5)
        .collect()
    }
    assert banded == brute


def test_simhash_banded_rejects_unsound_threshold(corpus):
    sig = simhash(corpus, "doc_id", "text")
    with pytest.raises(ValueError):
        simhash_dup_pairs(sig, "doc_id", max_hamming=8, bands=8)


def test_winnow_fingerprints_overlap_tracks_similarity(corpus):
    fps = winnow_fingerprints(corpus, "doc_id", "text").collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] == by_doc[2]  # identical text → identical fingerprint set
    near = len(by_doc[1] & by_doc[3]) / len(by_doc[1] | by_doc[3])
    far = len(by_doc[1] & by_doc[4]) / len(by_doc[1] | by_doc[4])
    assert near > 0.4
    assert far == 0.0


@pytest.mark.parametrize("cap", [1_000_000, 0])
def test_dedup_keepers_resolves_clusters(spark, cap):
    """Pairs forming a chain, a triangle, and a singleton must resolve
    to min-id keepers per connected component — identically on BOTH
    execution paths (cap high → driver union-find; cap 0 → distributed
    pointer-doubling loop)."""
    from clickhouse_build_spark.operators.dedup import dedup_keepers

    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        ["id_a", "id_b"],
    )
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20]], ["doc_id"])
    got = {
        r.doc_id: r.keeper
        for r in dedup_keepers(pairs, ids, driver_edge_cap=cap).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20}


@pytest.mark.parametrize("cap", [1_000_000, 0])
def test_dedup_keepers_long_chain_converges(spark, cap):
    """A 41-node path graph (diameter 40) must fully converge to keeper
    0 on both paths — the distributed loop's pointer-doubling covers
    diameters far past its round budget (2^10)."""
    from clickhouse_build_spark.operators.dedup import dedup_keepers

    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a: long, id_b: long")
    ids = spark.range(41).withColumnRenamed("id", "doc_id")
    ks = {r.keeper for r in dedup_keepers(pairs, ids, driver_edge_cap=cap).collect()}
    assert ks == {0}


def test_dedup_keepers_on_planted_corpus(spark):
    """End-to-end: minhash pairs on the real corpus -> keepers; every
    planted dup pair must share a keeper, and survivors is docs minus
    the duplicate partners."""
    from clickhouse_build_spark.catalog import load_tables
    from clickhouse_build_spark.operators.dedup import dedup_keepers, minhash_lsh_pairs
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE)["documents"]
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    keepers = dedup_keepers(pairs, docs.select("doc_id"))
    k = {r.doc_id: r.keeper for r in keepers.collect()}
    for r in pairs.collect():
        assert k[r.id_a] == k[r.id_b], (r.id_a, r.id_b)
    n_docs = docs.count()
    n_survivors = len(set(k.values()))
    n_dup_partners = sum(1 for d, kp in k.items() if kp != d)
    assert n_survivors == n_docs - n_dup_partners


class TestDuplicateTokenSpans:
    """ExactSubstr-style span detection on planted duplicates."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_planted_shared_span_is_found_and_merged(self, spark):
        from clickhouse_build_spark.operators.dedup import (
            duplicate_token_spans,
        )

        shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
        df = self._df(
            spark,
            [
                (1, f"intro one two {shared} tail1 x y"),
                (2, f"{shared} completely different ending here"),
                (3, "no overlap at all in this document text"),
            ],
        )
        spans = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
            for r in duplicate_token_spans(df, "doc_id", "text", l=5).collect()
        }
        # doc 1: shared tokens occupy positions 4-9; two overlapping
        # 5-gram hits (pos 4, 5) merge into ONE maximal span
        assert spans[1] == (4, 9, 6)
        # doc 2: same six tokens at positions 1-6
        assert spans[2] == (1, 6, 6)
        assert 3 not in spans

    def test_within_doc_repeat_is_not_flagged(self, spark):
        from clickhouse_build_spark.operators.dedup import (
            duplicate_token_spans,
        )

        rep = "p q r s t"
        df = self._df(
            spark,
            [
                (1, f"{rep} filler {rep} more filler words"),
                (2, "another unrelated doc body with enough tokens"),
            ],
        )
        # the 5-gram repeats WITHIN doc 1 only — count(DISTINCT doc)
        # is 1, so nothing is a cross-document duplicate
        assert duplicate_token_spans(df, "doc_id", "text", l=5).count() == 0

    def test_disjoint_spans_stay_separate(self, spark):
        from clickhouse_build_spark.operators.dedup import (
            duplicate_token_spans,
        )

        s1 = "a1 a2 a3 a4 a5"
        s2 = "b1 b2 b3 b4 b5"
        df = self._df(
            spark,
            [
                (1, f"{s1} gapword other filler {s2} trailing bits"),
                (2, f"{s1} then something else entirely {s2}"),
            ],
        )
        rows = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_token_spans(df, "doc_id", "text", l=5).collect()
        )
        assert [r for r in rows if r[0] == 1] == [(1, 1, 5), (1, 9, 13)]
        assert [r for r in rows if r[0] == 2] == [(2, 1, 5), (2, 10, 14)]


def test_scrub_removes_exactly_the_stats_span_tokens(spark):
    """Cross-query invariant: doc_span_scrubbed's kept count equals
    total - dup_tokens from doc_dup_span_stats for every flagged doc,
    and untouched docs keep every token."""
    from clickhouse_build_spark.plans.dedup import (
        doc_dup_span_stats,
        doc_span_scrubbed,
    )

    sf = "/root/testdata/sf0.001"
    stats = {
        r["doc_id"]: (r["total_toks"], r["dup_tokens"])
        for r in doc_dup_span_stats(spark, sf).collect()
    }
    scrubbed = {
        r["doc_id"]: (r["total_toks"], r["kept_toks"])
        for r in doc_span_scrubbed(spark, sf).collect()
    }
    assert stats, "sf0.001 should contain duplicated spans"
    for doc_id, (total, dup) in stats.items():
        assert scrubbed[doc_id] == (total, total - dup)
    for doc_id, (total, kept) in scrubbed.items():
        if doc_id not in stats:
            assert kept == total


def test_simhash_clusters_and_pair_cap(spark):
    """r15 (VERDICT #6): the cluster summary collapses identical
    signatures before any pairwise work (linear output), and the pair
    form refuses loudly once the bucket-derived candidate bound
    exceeds pair_cap — never a silent quadratic emission."""
    import pytest as _pytest

    from clickhouse_build_spark.operators.dedup import (
        simhash_clusters,
        simhash_dup_pairs,
    )

    # 5 docs on 3 distinct signatures; sigs 0b0000 and 0b0001 are
    # within hamming 1; 0b1111111111 is hamming 10/9 from them — far
    rows = [(1, 0), (2, 0), (3, 0), (4, 1), (5, 0b1111111111)]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    # default: exact-signature summary only (linear at any scale)
    got = {
        r["simhash"]: (r["rep_id"], r["n_members"])
        for r in simhash_clusters(sig, "doc_id").collect()
    }
    assert got == {0: (1, 3), 1: (4, 1), 0b1111111111: (5, 1)}
    # near_links=True adds the distinct-signature hamming counts
    # (small-corpus analysis mode)
    got = {
        r["simhash"]: (r["rep_id"], r["n_members"], r["n_near_sigs"])
        for r in simhash_clusters(
            sig, "doc_id", max_hamming=5, bands=8, bits=32,
            near_links=True,
        ).collect()
    }
    assert got == {0: (1, 3, 1), 1: (4, 1, 1), 0b1111111111: (5, 1, 0)}

    # degenerate corpus: every doc identical signature -> candidate
    # bound n*(n-1)/2 per band; a tiny cap refuses loudly
    many = spark.createDataFrame(
        [(i, 7) for i in range(200)], "doc_id long, simhash long"
    )
    with _pytest.raises(ValueError, match="signature-degenerate"):
        simhash_dup_pairs(many, "doc_id", max_hamming=5, pair_cap=1000)
    # the clusters path handles the same corpus with ONE output row
    c = simhash_clusters(many, "doc_id").collect()
    assert len(c) == 1 and c[0]["n_members"] == 200
    # under the cap the pair set is unchanged by the guard
    few = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0b1111111111)], "doc_id long, simhash long"
    )
    pairs = simhash_dup_pairs(
        few, "doc_id", max_hamming=5, pair_cap=10**6
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_simhash_pair_cap_env_accepts_scientific(spark, monkeypatch):
    """r16: the refusal message names the raise as CHB_SIMHASH_PAIR_CAP
    and operators write it the natural way ('2e9') — the env parse
    must accept scientific notation (int('2e9') is a ValueError; an
    sf1 bench run failed exactly here)."""
    from clickhouse_build_spark.plans.registry import REGISTRY

    monkeypatch.setenv("CHB_SIMHASH_PAIR_CAP", "2e9")
    df = REGISTRY["doc_simhash_dup_pairs"].builder(
        spark, "/root/testdata/sf0.001"
    )
    assert df.count() >= 0


def test_minhash_kernel_forms_agree(corpus):
    """The explode+groupBy signatures (batch LSH path) and the per-row
    array-expression kernel (streaming admission path) must stay
    value-identical — the contract that lets minhash_lsh_pairs pick the
    multi-consumer-friendly explode form while streaming keeps the
    shuffle-free one (r17)."""
    from clickhouse_build_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_text,
    )

    per_row = {
        r.doc_id: list(r.sig)
        for r in minhash_signatures_text(corpus, "doc_id", "text").collect()
    }
    exploded = {
        r.doc_id: list(r.sig)
        for r in minhash_signatures(
            word_shingles(corpus, "doc_id", "text", n=3, distinct=False),
            "doc_id",
        ).collect()
    }
    assert per_row == exploded and len(per_row) == 4
