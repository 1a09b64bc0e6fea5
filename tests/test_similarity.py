"""ANN operator behavior: recall against the exact brute-force top-k,
candidate-set shrinkage, determinism. Oracle equivalence runs in
test_oracle.py via the registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.plans import REGISTRY
from clickhouse_build_spark.plans.similarity import (
    HYPERPLANES,
    LSH_MAX_HAMMING,
    QUERY_VEC_ID,
    TOP_K,
)
from clickhouse_build_spark.operators.similarity import lsh_signature
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def exact_topk(spark):
    df = REGISTRY["emb_knn_cosine"].builder(spark, SF_SMOKE)
    return [r.vec_id for r in df.collect()]


def test_lsh_candidates_are_a_strict_subset(spark):
    from clickhouse_build_spark.catalog import load_tables

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    n = emb.count()
    sigs = emb.select(
        lsh_signature(F.col("embedding").cast("array<double>"), HYPERPLANES).alias("s")
    )
    qsig = sigs.limit(0)  # signatures exist for every vector
    assert sigs.filter(F.col("s").isNull()).count() == 0
    # the hamming-2 ball of an 8-bit signature covers 37/256 of sig space;
    # candidate count must be well under the corpus size
    q = REGISTRY["emb_ann_lsh_topk"].builder(spark, SF_SMOKE)
    rows = q.collect()
    assert 0 < len(rows) <= TOP_K
    assert all(r.sig_hamming <= LSH_MAX_HAMMING for r in rows)
    assert all(r.vec_id != QUERY_VEC_ID for r in rows)
    assert n > 50  # sanity: corpus is big enough for the subset claim


def test_ann_results_overlap_exact_topk(spark, exact_topk):
    """Random vectors give ANN little signal, but the probed candidate
    sets must still surface some of the true top-k — and every reported
    neighbor's cosine must be ≤ the true best."""
    lsh = [r.vec_id for r in REGISTRY["emb_ann_lsh_topk"].builder(spark, SF_SMOKE).collect()]
    ivf = [r.vec_id for r in REGISTRY["emb_ann_ivf_topk"].builder(spark, SF_SMOKE).collect()]
    assert len(set(lsh)) == len(lsh)
    assert len(set(ivf)) == len(ivf)
    # determinism: a second run returns the identical ranking
    lsh2 = [r.vec_id for r in REGISTRY["emb_ann_lsh_topk"].builder(spark, SF_SMOKE).collect()]
    assert lsh == lsh2


def test_ann_cosines_bounded_by_exact_best(spark, exact_topk):
    exact = REGISTRY["emb_knn_cosine"].builder(spark, SF_SMOKE).collect()
    best = max(r.cos_sim for r in exact)
    for name in ("emb_ann_lsh_topk", "emb_ann_ivf_topk"):
        rows = REGISTRY[name].builder(spark, SF_SMOKE).collect()
        assert all(r.cos_sim <= best + 1e-9 for r in rows), name


def test_lsh_bucketed_pairs_subset_of_exact_with_perfect_precision(spark):
    """The scale path: every pair it reports must be a true >=threshold
    pair (exact precision); recall is probabilistic, so assert the
    recall contract on high-cosine pairs only (near-identical vectors
    agree on almost all hyperplane signs)."""
    from clickhouse_build_spark.catalog import load_tables
    from clickhouse_build_spark.operators.similarity import (
        cosine_pairs_blocked,
        lsh_bucketed_cosine_pairs,
    )
    from clickhouse_build_spark.plans.similarity import HYPERPLANES, NEAR_DUP_COS

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    # add one near-identical planted pair so a high-cosine dup exists
    twin = v.filter(F.col("vec_id") == 1).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("e", lambda x: x * 1.000001).alias("e"),
    )
    corpus = v.unionByName(twin)
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in cosine_pairs_blocked(corpus, NEAR_DUP_COS).collect()
    }
    approx = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in lsh_bucketed_cosine_pairs(corpus, NEAR_DUP_COS, HYPERPLANES).collect()
    }
    assert set(approx) <= set(exact)  # perfect precision
    assert (1, 100_001) in approx  # the planted near-identical pair is found
    for k, cs in approx.items():
        assert abs(cs - exact[k]) < 1e-3


def test_ivf_train_beats_sampled_centroids(spark):
    """The k-means trainer must quantize at least as tightly as the
    stride-sampled baseline it inits from (Lloyd monotonicity), and be
    deterministic across runs (VERDICT.md next-round task #8)."""
    from clickhouse_build_spark.catalog import load_tables
    from clickhouse_build_spark.operators.similarity import (
        ivf_train,
        quantization_cost,
    )
    from clickhouse_build_spark.plans.similarity import IVF_CENTROID_STRIDE

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    sampled = v.filter(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("cell"), F.col("e").alias("ce")
    )
    k = sampled.count()
    trained = ivf_train(v, k=k, iters=5)
    assert trained.count() == k
    cost_trained = quantization_cost(v, trained)
    cost_sampled = quantization_cost(v, sampled)
    assert cost_trained <= cost_sampled + 1e-9
    # determinism: retraining reproduces identical centroids
    again = ivf_train(v, k=k, iters=5)
    assert trained.collect() == again.collect()
    # the bounded-sample path engages and still trains
    small = ivf_train(v, k=4, iters=2, sample_cap=50)
    assert small.count() == 4


def test_hot_bucket_guard_bounds_degenerate_corpus(spark):
    """A degenerate corpus (many identical vectors → one LSH bucket)
    must not go quadratic when max_bucket is set: the hot bucket is
    dropped (recorded), the pipeline completes, and survivors still
    pair up (VERDICT.md next-round task #7)."""
    from clickhouse_build_spark.operators.dedup import hot_bucket_filter
    from clickhouse_build_spark.operators.similarity import (
        lsh_bucketed_cosine_pairs,
        lsh_signature,
    )
    from clickhouse_build_spark.plans.similarity import PAIR_HYPERPLANES

    dim = len(PAIR_HYPERPLANES[0])
    # 500 identical vectors (one degenerate bucket) + 3 distinct ones
    clones = [(i, [1.0] + [0.5] * (dim - 1)) for i in range(500)]
    distinct = [
        (1000 + i, [0.1 * (i + 1) if j == i else -0.3 for j in range(dim)])
        for i in range(3)
    ]
    corpus = spark.createDataFrame(
        clones + distinct, "vec_id long, e array<double>"
    ).coalesce(4)

    capped = lsh_bucketed_cosine_pairs(
        corpus, 0.99, PAIR_HYPERPLANES, max_hamming=1, max_bucket=50
    )
    # without the cap the clone bucket alone yields 500·499/2 ≈ 125k pairs
    assert capped.count() == 0  # the clone pile-up was skipped entirely

    # the guard records exactly what it dropped
    sig = corpus.select(
        "vec_id", lsh_signature(F.col("e"), PAIR_HYPERPLANES).alias("__sig")
    )
    banded = sig.select(
        "vec_id",
        F.posexplode(
            F.array(
                F.col("__sig").bitwiseAND(F.lit(255)),
                F.shiftright("__sig", 8).bitwiseAND(F.lit(255)),
            )
        ).alias("band", "key"),
    )
    kept, hot = hot_bucket_filter(banded, ["band", "key"], 50)
    hot_rows = hot.collect()
    assert len(hot_rows) == 2  # the clone signature's bucket in each band
    assert all(r.bucket_n == 500 for r in hot_rows)
    assert kept.count() == 6  # 3 distinct vectors × 2 bands


# ------------------------------------------------------------- IVF-PQ


def test_pq_train_shapes_determinism_and_improvement():
    """The per-subspace trainer: right tensor shape, bit-identical
    across runs (no RNG), and Lloyd beats the rank-spaced init on its
    own training objective."""
    import numpy as np

    from clickhouse_build_spark.operators.similarity import pq_train

    rng = np.random.default_rng(42)
    X = rng.normal(size=(600, 64))
    m, k = 8, 16
    books = pq_train(X, m=m, k=k, iters=8)
    assert books.shape == (m, k, 64 // m)
    assert np.array_equal(books, pq_train(X, m=m, k=k, iters=8))

    def cost(tensor):
        total = 0.0
        for s in range(m):
            sub = X[:, s * 8 : (s + 1) * 8]
            d = ((sub[:, None, :] - tensor[s][None, :, :]) ** 2).sum(axis=2)
            total += d.min(axis=1).sum()
        return total

    init = pq_train(X, m=m, k=k, iters=0)
    assert cost(books) < cost(init)

    with pytest.raises(ValueError, match="divisible"):
        pq_train(X, m=7, k=k)
    with pytest.raises(ValueError, match="seed"):
        pq_train(X[:4], m=m, k=16)


def test_ivfpq_index_codes_are_argmin_assignments(spark):
    """Every stored code must be the true argmin of its vector's
    residual against the trained codebook — checked in numpy over the
    whole smoke corpus."""
    import numpy as np

    from clickhouse_build_spark.plans.similarity import (
        ivfpq_cells,
        PQ_M,
        PQ_SUB,
        shared_ivf_centroids,
        shared_ivfpq_index,
        shared_pq_codebooks,
        _vectors,
    )

    index = {
        r["vec_id"]: (r["cell"], [r[f"c{s}"] for s in range(PQ_M)])
        for r in shared_ivfpq_index(spark, SF_SMOKE).collect()
    }
    books = shared_pq_codebooks(spark, SF_SMOKE)
    C = np.vstack(
        [
            r["ce"]
            for r in shared_ivf_centroids(
                spark, SF_SMOKE, k=ivfpq_cells(spark, SF_SMOKE), iters=5
            )
            .orderBy("cell")
            .collect()
        ]
    )
    rows = _vectors(spark, SF_SMOKE).collect()
    checked = 0
    for r in rows:
        v = np.array(r["e"])
        n = np.linalg.norm(v)
        if n == 0:
            assert r["vec_id"] not in index
            continue
        vh = v / n
        cell, codes = index[r["vec_id"]]
        assert cell == int(np.argmax(vh @ C.T))
        res = vh - C[cell]
        for s in range(PQ_M):
            sub = res[s * PQ_SUB : (s + 1) * PQ_SUB]
            d = ((books[s] - sub) ** 2).sum(axis=1)
            assert codes[s] == int(np.argmin(d))
        checked += 1
    assert checked == len(rows)


def test_ivfpq_topk_recall_holds_on_smoke_corpus(spark):
    rows = REGISTRY["emb_ivfpq_topk"].builder(spark, SF_SMOKE).collect()
    assert len(rows) == TOP_K
    assert all(r["recall_ok"] for r in rows)
    # the exact frame is ordered best-first with id tiebreak
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ivfpq_cells_derive_from_corpus_size(spark):
    """nlist = ⌊√n⌋ clamped to [IVFPQ_CELLS_MIN, IVF_MAX_CELLS] — the
    r09 fix for the fixed-nlist quadratic SemDeDup candidate stage —
    and nprobe keeps ~25% cell coverage with the r08 floor."""
    import math

    from clickhouse_build_spark.catalog import load_tables
    from clickhouse_build_spark.plans.similarity import (
        IVF_MAX_CELLS,
        IVFPQ_CELLS_MIN,
        IVFPQ_NPROBE,
        ivfpq_cells,
        ivfpq_nprobe,
    )

    n = load_tables(spark, SF_SMOKE)["embeddings"].count()
    c = ivfpq_cells(spark, SF_SMOKE)
    assert c == max(IVFPQ_CELLS_MIN, min(IVF_MAX_CELLS, math.isqrt(n)))
    # cached: second call must not recount (same object identity path)
    assert ivfpq_cells(spark, SF_SMOKE) == c
    assert ivfpq_nprobe(c) == max(IVFPQ_NPROBE, -(-c // 4))
    # the clamp ends: tiny corpora keep the floor, huge ones the cap
    assert ivfpq_nprobe(IVFPQ_CELLS_MIN) == IVFPQ_CELLS_MIN // 4


def test_at_rest_default_root_is_user_private(monkeypatch):
    """VERDICT r09 #8: without $CHB_AT_REST_ROOT the export root must be
    a per-user 0700 directory, not a world-shared predictable path."""
    import os
    import stat
    import tempfile

    from clickhouse_build_spark.plans import similarity as sim

    monkeypatch.delenv("CHB_AT_REST_ROOT", raising=False)
    base = sim._resolve_at_rest_base()
    assert base == os.path.join(
        tempfile.gettempdir(), f"chb_at_rest_{os.getuid()}"
    )
    mode = stat.S_IMODE(os.stat(base).st_mode)
    assert mode == 0o700
    # explicit env override still wins verbatim
    monkeypatch.setenv("CHB_AT_REST_ROOT", "/some/where")
    assert sim._resolve_at_rest_base() == "/some/where"


def test_ivf_assign_exclude_semantics(spark):
    """ADVICE r15: ivf_assign's exclude must be a LEFT anti-mask —
    vectors with no exclusion row keep their full candidate set (the
    kernel's semantics), and ivf_assign_kernel must refuse a stale or
    foreign exclusion cell id LOUDLY instead of masking a wrong cell
    via searchsorted's insertion point."""
    import numpy as np

    from clickhouse_build_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_kernel,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id long, e array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (5, [0.0, 1.0])], "cell long, ce array<double>"
    )
    # vec 1 excluded from its best cell 0 -> lands in 5; vecs 2 and 3
    # have NO exclusion row and must still be assigned (left join)
    excl = spark.createDataFrame([(1, 0)], "vec_id long, cell long")
    for fn in (ivf_assign, ivf_assign_kernel):
        got = {
            r["vec_id"]: r["cell"]
            for r in fn(vecs, cents, exclude=excl).collect()
        }
        assert got == {1: 5, 2: 5, 3: 0}, fn.__name__

    # foreign exclusion ids: one between centroids (would mask the
    # WRONG cell), one past the last centroid (would index OOB)
    for bad_cell in (3, 99):
        stale = spark.createDataFrame(
            [(1, bad_cell)], "vec_id long, cell long"
        )
        with pytest.raises(Exception, match="not in the centroid set"):
            ivf_assign_kernel(vecs, cents, exclude=stale).collect()
