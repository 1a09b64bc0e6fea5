"""Distributed Lloyd k-means: argmin correctness of the final
assignment, objective monotonicity across iterations, and structural
bounds. Cross-engine exactness is covered by the registered oracles in
test_oracle.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.plans.kmeans import (
    KM_ITERS,
    KM_K,
    _init_centroid_arrays,
    _lloyd_step,
    _qv,
    emb_kmeans_assign,
    emb_kmeans_centroids,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def trained(spark):
    cent = emb_kmeans_centroids(spark, SF_SMOKE).collect()
    assign = emb_kmeans_assign(spark, SF_SMOKE).collect()
    return cent, assign


def test_structural_bounds(spark, trained):
    cent, assign = trained
    clusters = {r.cluster for r in cent}
    assert clusters <= set(range(KM_K))
    dims = {r.d for r in cent}
    assert min(dims) == 1
    # one assignment per vector, to a surviving cluster
    assert len({r.vec_id for r in assign}) == len(assign)
    assert {r.cluster for r in assign} <= clusters


def test_assignment_is_argmin_against_prior_centroids(spark, trained):
    """The final assignment must be the exact argmin over the
    iteration-(N-1) centroids it was computed against — re-derived
    here with integer numpy on the same quantized coordinates."""
    _, assign = trained
    qv = _qv(spark, SF_SMOKE)
    dim = len(qv.select("q").head()[0])
    centa = _init_centroid_arrays(spark, SF_SMOKE, qv)
    for _ in range(KM_ITERS - 1):
        _, centa = _lloyd_step(qv, centa, dim)

    C = {r.cluster: np.array(r.cq, dtype=np.int64) for r in centa.collect()}
    V = {r.vec_id: np.array(r.q, dtype=np.int64) for r in qv.collect()}

    cids = sorted(C)
    for r in assign:
        dists = [(int(((V[r.vec_id] - C[c]) ** 2).sum()), c) for c in cids]
        best = min(dists)
        assert (best[1], best[0]) == (r.cluster, r.dist), r.vec_id


def test_columnwise_update_matches_numpy_mean(spark):
    """r18: the centroid update is ONE column-wise groupBy (no
    posexplode / second collect shuffle) — pin its output against the
    definitional floor-of-integer-mean computed in numpy from the same
    iteration's assignments."""
    qv = _qv(spark, SF_SMOKE)
    dim = len(qv.select("q").head()[0])
    centa = _init_centroid_arrays(spark, SF_SMOKE, qv)
    assign, newcenta = _lloyd_step(qv, centa, dim)
    A = assign.select("vec_id", "cluster", "q").collect()
    by_cluster: dict[int, list[np.ndarray]] = {}
    for r in A:
        by_cluster.setdefault(r.cluster, []).append(
            np.array(r.q, dtype=np.int64)
        )
    got = {r.cluster: list(r.cq) for r in newcenta.collect()}
    assert set(got) == set(by_cluster)
    for c, vecs in by_cluster.items():
        s = np.sum(vecs, axis=0, dtype=np.int64)
        exp = np.floor(s.astype(np.float64) / len(vecs)).astype(np.int64)
        assert got[c] == exp.tolist(), c


def test_objective_non_increasing(spark):
    """Lloyd's objective never increases; the x1e6 fixed-point floor
    perturbs means by <1 unit in ~5e5, so allow that relative slack."""
    qv = _qv(spark, SF_SMOKE)
    dim = len(qv.select("q").head()[0])
    centa = _init_centroid_arrays(spark, SF_SMOKE, qv)
    prev = None
    for _ in range(KM_ITERS):
        assign, centa = _lloyd_step(qv, centa, dim)
        total = assign.agg(F.sum("dist")).first()[0]
        if prev is not None:
            assert total <= prev * 1.000001, (total, prev)
        prev = total


def test_ann_chain_probes_trained_cells(spark):
    """The served top-k must come only from the query's nearest trained
    cells, and every hit must genuinely beat the excluded cells'
    vectors — re-derived against the trained centroid vectors."""
    import numpy as np

    from clickhouse_build_spark.plans.kmeans import (
        KM_NPROBE,
        emb_ann_kmeans_topk,
        kmeans_centroid_vectors,
    )
    from clickhouse_build_spark.plans.similarity import QUERY_VEC_ID, _vectors

    hits = emb_ann_kmeans_topk(spark, SF_SMOKE).collect()
    assert 0 < len(hits) <= 10
    cents = {r.cell: np.array(r.ce) for r in kmeans_centroid_vectors(spark, SF_SMOKE).collect()}
    q = np.array(
        _vectors(spark, SF_SMOKE)
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .first()
        .e
    )
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    ranked = sorted(cents, key=lambda c: (-cos(cents[c], q), c))
    probed = set(ranked[:KM_NPROBE])
    assert {r.cell for r in hits} <= probed
    assert all(hits[i].cos_sim >= hits[i + 1].cos_sim for i in range(len(hits) - 1))
