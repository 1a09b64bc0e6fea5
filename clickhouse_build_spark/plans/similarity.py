"""Similarity-search queries over ``embeddings`` (driver-mandated
extension surface): brute-force cosine top-k baseline, label centroids,
all-pairs near-dup, and the two bucketed ANN paths from
``operators/similarity.py`` (random-hyperplane LSH and IVF-Flat) wired
to exact DuckDB oracles.

All vector math uses built-in higher-order functions (``zip_with`` +
``aggregate``) on double-cast arrays — JVM-side, no Python. The ANN
structures hash with deterministic md5-derived hyperplanes / sampled
centroids, so the oracle checks the approximate indexes *exactly*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.operators.similarity import (
    cosine,
    lsh_topk_batch,
    cosine_pairs_blocked,
    dot,
    ivf_assign,
    ivf_assign_kernel,
    ivf_topk,
    ivf_train,
    lsh_bucketed_cosine_pairs,
    lsh_topk,
    random_hyperplanes,
)
from clickhouse_build_spark.plans.registry import query

QUERY_VEC_ID = 0
TOP_K = 10
DIM = 64
NEAR_DUP_COS = 0.4
LSH_NBITS = 8
LSH_MAX_HAMMING = 2
IVF_CENTROID_STRIDE = 50  # vec_id % stride == 0 → sampled centroid
# Cap the id-sampled cell count: without it centroids grow LINEARLY
# with the corpus (stride sampling) and the nearest-cell assignment
# goes quadratic — measured 14.7x wall at 10x data in the sf1
# rehearsal. 128 cells ≈ inactive below ~6.4k vectors (oracle sf0.01
# = 10 cells and bench sf0.1 = 100 cells are unchanged) and bounds
# assignment to n×128 above it. Proper nlist would be ~sqrt(n); a cap
# keeps the untrained variant deterministic AND SQL-reproducible.
IVF_MAX_CELLS = 128
IVF_NPROBE = 3
# Pair-mining signature family: 16 bits / hamming ≤ 1 → 2 bands of 8
# bits, 256 bucket keys per band — bucket occupancy stays ~n/256 as the
# corpus grows, vs 4 keys/band if the 8-bit top-k family were banded.
PAIR_NBITS = 16
PAIR_MAX_HAMMING = 1

HYPERPLANES = random_hyperplanes(DIM, LSH_NBITS)
PAIR_HYPERPLANES = random_hyperplanes(DIM, PAIR_NBITS)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _sig_sql(vec_expr: str, planes: list[list[float]] | None = None) -> str:
    """nbits-bit LSH signature as a SQL expression (literal hyperplanes)."""
    return (
        "("
        + " + ".join(
            f"CASE WHEN list_dot_product({vec_expr}, {_plane_sql(p)}) > 0 "
            f"THEN {2**i} ELSE 0 END"
            for i, p in enumerate(planes if planes is not None else HYPERPLANES)
        )
        + ")::BIGINT"
    )


@query(
    "emb_knn_cosine",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    scored AS (
      SELECT e.vec_id, e.label,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))) AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, round(cos_sim, 4) AS cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
    tags=("similarity", "knn", "cosine"),
)
def emb_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against one query vector — the exact ANN
    baseline.

    Scale: the query vector broadcasts (one row); scoring is a single
    map-only pass over the corpus and the top-k plans as
    TakeOrderedAndProject — no global sort, no shuffle of the corpus.
    For batch-of-queries × corpus at 100 TB, use the LSH-bucketed
    variant in ``operators/similarity.py`` to avoid the full cross
    product.
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    vecs = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    q = vecs.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("qe"))
    return (
        vecs.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("e"), F.col("qe")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "emb_label_centroids",
    oracle="""
    SELECT label, CAST(i AS INTEGER) AS dim,
           round(avg(CAST(embedding[CAST(i AS BIGINT)] AS DOUBLE)), 4) + 0 AS centroid_val
    FROM embeddings, range(1, 65) t(i)
    GROUP BY 1, 2
    """,
    tags=("similarity", "centroid", "vector-agg"),
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long form (label, dim, mean value) — the
    coarse-quantizer training step of an IVF index.

    Scale: posexplode fans each vector to 64 rows, then a plain grouped
    avg — partial aggregation makes the shuffle |labels|×64 rows
    regardless of corpus size.
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .select("label", (F.col("pos") + 1).alias("dim"), F.col("col"))
        .groupBy("label", "dim")
        # `+ 0` normalizes IEEE negative zero so both engines emit +0.0
        .agg((F.round(F.avg("col"), 4) + F.lit(0)).alias("centroid_val"))
    )


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


# Session-scoped trained-index artifact (same pattern as the dedup
# artifacts, plans/dedup.py): a production system trains the IVF coarse
# quantizer at ingest and every ANN query probes the SAME index —
# re-running Lloyd per query models the wrong pipeline. Keyed on
# (applicationId, sf_dir, k, iters); the centroid frame is k rows, so
# the persist is trivial at any scale and a standalone driver run
# rebuilds it transparently.
_IVF_INDEX: dict[tuple[str, str, int, int], DataFrame] = {}


def shared_ivf_centroids(
    spark: SparkSession, sf_dir: str, k: int, iters: int
) -> DataFrame:
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> DataFrame:
        from pyspark import StorageLevel

        return ivf_train(_vectors(spark, sf_dir), k=k, iters=iters).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    key = (spark.sparkContext.applicationId, sf_dir, k, iters)
    return session_artifact(_IVF_INDEX, key, build)


@query(
    "emb_near_dup_cosine",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_cos_sql('a.e', 'b.e')}, 4) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_cos_sql('a.e', 'b.e')} >= {NEAR_DUP_COS}
    """,
    tags=("similarity", "near-dup", "cosine", "quadratic-by-design"),
)
def emb_near_dup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.4) — the exact
    all-pairs verifier for embedding-space dedup, computed as a
    BLAS-blocked broadcast product (``cosine_pairs_blocked``): ~100×
    faster than a per-pair HOF dot at this scale.

    Scale: the broadcast side is size-guarded; past the bound the plan
    is LSH-prefilter (hyperplane signature buckets) with this exact
    kernel per bucket — two vectors at high cosine agree on most
    hyperplane signs, so same-bucket candidates capture them without
    the n² join.
    """
    return cosine_pairs_blocked(_vectors(spark, sf_dir), NEAR_DUP_COS)


@query(
    "emb_lsh_bucketed_cosine_pairs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    sig AS (
      SELECT vec_id, e, {_sig_sql('e', PAIR_HYPERPLANES)} AS s FROM v
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_cos_sql('a.e', 'b.e')}, 4) AS cos_sim
    FROM sig a JOIN sig b ON a.vec_id < b.vec_id
    WHERE bit_count(xor(a.s, b.s)) <= {PAIR_MAX_HAMMING}
      AND {_cos_sql('a.e', 'b.e')} >= {NEAR_DUP_COS}
    """,
    tags=("similarity", "near-dup", "lsh", "scale-path"),
)
def emb_lsh_bucketed_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB near-dup path: LSH-banded candidate generation
    (16-bit hyperplane signatures, pigeonhole bands for hamming ≤ 1),
    exact cosine only on candidates — no corpus broadcast, no n² join.
    This is the documented scale successor to ``emb_near_dup_cosine``'s
    bounded broadcast kernel.

    The oracle recomputes the identical signatures from the same literal
    hyperplanes and brute-forces the (hamming ≤ 1 ∧ cos ≥ t) pair set —
    the banded plan must reproduce it exactly (banding is lossless for
    hamming ≤ bands − 1 by pigeonhole).

    Scale: the band self-join shuffles 16-byte (id, sig) rows bucketed
    256 ways per band; vectors join back only for deduped candidates.
    ``max_bucket`` (unset here to stay oracle-exact) guards degenerate
    buckets.
    """
    return lsh_bucketed_cosine_pairs(
        _vectors(spark, sf_dir),
        NEAR_DUP_COS,
        PAIR_HYPERPLANES,
        max_hamming=PAIR_MAX_HAMMING,
    )


@query(
    "emb_fuzzy_dedup_keepers",
    oracle=f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE {_cos_sql('a.e', 'b.e')} >= {NEAR_DUP_COS}
    ),
    edges AS (
      SELECT va AS src, vb AS dst FROM p
      UNION
      SELECT vb AS src, va AS dst FROM p
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS vec_id, least(src, min(dst)) AS keeper
      FROM reach GROUP BY src
    )
    SELECT v.vec_id, COALESCE(c.keeper, v.vec_id) AS keeper
    FROM v LEFT JOIN comp c USING (vec_id)
    """,
    # quadratic-output (r14, VERDICT r13 #2): compute is LSH-bucketed
    # (the salted ladder measures the CC family sublinear, 3.2× at 10×
    # rows) but on CLONE-replicated corpora (make_sf1_full) the true
    # near-dup PAIR OUTPUT grows ~c² per clone cluster — an output
    # property of that corpus, not an engine term. The in-record
    # adjudication exempts the row from naive sf1 linearity gates.
    tags=("similarity", "dedup", "keepers", "pipeline", "quadratic-output"),
)
def emb_fuzzy_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-space fuzzy dedup, end to end: cosine near-dup pairs
    (cos ≥ NEAR_DUP_COS) → connected components → per-vector keeper —
    the semantic twin of ``doc_fuzzy_dedup_keepers``'s lexical pipeline,
    sharing the same pointer-doubling min-label operator.

    Scale: pairs come from the guarded blocked kernel here (small
    corpus); past the broadcast bound the LSH-bucketed pair generator
    (``emb_lsh_bucketed_cosine_pairs``) feeds the identical keeper
    operator — components only ever see the edge list, never vectors.
    Oracle: DuckDB recursive-CTE transitive closure over the same
    all-pairs cosine edges."""
    from clickhouse_build_spark.operators.dedup import dedup_keepers

    v = _vectors(spark, sf_dir)
    pairs = cosine_pairs_blocked(v, NEAR_DUP_COS).select(
        F.col("vec_a").alias("id_a"), F.col("vec_b").alias("id_b")
    )
    return dedup_keepers(pairs, v.select("vec_id"), id_col="vec_id").orderBy(
        "vec_id"
    )


@query(
    "emb_ann_lsh_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    sig AS (
      SELECT vec_id, e, {_sig_sql('e')} AS s FROM v
    ),
    q AS (
      SELECT e AS qe, {_sig_sql('e')} AS qs FROM v WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT vec_id,
           round({_cos_sql('e', 'qe')}, 4) AS cos_sim,
           bit_count(xor(s, qs)) AS sig_hamming
    FROM sig, q
    WHERE vec_id <> {QUERY_VEC_ID} AND bit_count(xor(s, qs)) <= {LSH_MAX_HAMMING}
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
    tags=("similarity", "ann", "lsh"),
)
def emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: 8-bit signatures, probe
    hamming radius ≤ 2, exact cosine re-rank of the candidates.

    Scale: the corpus-side filter is an integer popcount per vector
    (signatures precomputable at ingest and storable as a column); the
    exact cosine runs only on the ~(probed/2^nbits) surviving fraction.
    The oracle recomputes the identical index in SQL — the approximate
    structure itself is checked, not just sampled.
    """
    v = _vectors(spark, sf_dir)
    corpus = v.filter(F.col("vec_id") != QUERY_VEC_ID)
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("qe"))
    return lsh_topk(
        corpus, q, HYPERPLANES, k=TOP_K, max_hamming=LSH_MAX_HAMMING
    )


@query(
    "emb_ann_ivf_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    c AS (
      SELECT vec_id AS cell, e AS ce FROM v
      WHERE vec_id % {IVF_CENTROID_STRIDE} = 0
        AND vec_id < {IVF_CENTROID_STRIDE * IVF_MAX_CELLS}
    ),
    q AS (
      SELECT e AS qe FROM v WHERE vec_id = {QUERY_VEC_ID}
    ),
    assigned AS (
      SELECT vec_id, e, cell FROM (
        SELECT v.vec_id, v.e, c.cell,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_cos_sql('v.e', 'c.ce')} DESC, c.cell
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT cell FROM c, q
      ORDER BY {_cos_sql('ce', 'qe')} DESC, cell
      LIMIT {IVF_NPROBE}
    )
    SELECT a.vec_id, a.cell, round({_cos_sql('a.e', 'qe')}, 4) AS cos_sim
    FROM assigned a JOIN probe USING (cell), q
    WHERE a.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
    tags=("similarity", "ann", "ivf"),
)
def emb_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF-Flat: deterministic sampled centroids
    (vec_id % 50 == 0, CAPPED at IVF_MAX_CELLS cells), nearest-centroid
    cell assignment, probe the 3 nearest cells, exact top-k inside them.

    Scale: the cell cap bounds assignment to n x 128 cosines at any
    corpus size (uncapped stride sampling grew cells linearly with the
    corpus → quadratic assignment, the sf1 rehearsal's one red flag);
    assignment is one broadcast-join pass; with the inverted file
    partitioned by cell on disk the probe prunes to nprobe partitions.
    """
    v = _vectors(spark, sf_dir)
    centroids = v.filter(
        (F.col("vec_id") % IVF_CENTROID_STRIDE == 0)
        & (F.col("vec_id") < IVF_CENTROID_STRIDE * IVF_MAX_CELLS)
    ).select(F.col("vec_id").alias("cell"), F.col("e").alias("ce"))
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("qe"))
    assigned = ivf_assign(v.filter(F.col("vec_id") != QUERY_VEC_ID), centroids)
    return ivf_topk(assigned, centroids, q, k=TOP_K, nprobe=IVF_NPROBE)


# Recall floor for the trained IVF index. The driver's embeddings are
# near-random (max query cosine ~0.37 at sf0.01), so nearest neighbors
# scatter across cells and perfect recall needs probing every cell;
# measured: 7/10 at nprobe=3, 8/10 at nprobe=4..8, 10/10 at nprobe=16.
# The bound is a machinery-regression tripwire (trainer/assign/probe),
# not an ANN-quality claim about random data: nprobe=4 with floor 0.7
# leaves one-hit slack on both sides.
IVF_RECALL_FLOOR = 0.7
IVF_TRAINED_NPROBE = 4
# Coarse-cell count for the IVF-Flat trained index (distinct from the
# corpus-scaled IVFPQ nlist — this row pins the small-k trainer path).
# The artifact is WARMED by build_ivfpq_index so the query row measures
# steady-state serving, not first-touch training (VERDICT r09 #10).
IVF_TRAINED_CELLS = 16


@query(
    "emb_ann_ivf_trained_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    scored AS (
      SELECT e.vec_id,
             {_cos_sql('CAST(e.embedding AS DOUBLE[])', 'q.qe')} AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, round(cos_sim, 4) AS cos_sim, TRUE AS recall_ok
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def emb_ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat with the PRODUCTION coarse quantizer: spherical k-means
    (``ivf_train``, deterministic bounded sample + Lloyd) instead of the
    stride-sampled corpus rows. Same assignment/probe plan as
    ``emb_ann_ivf_topk`` — only the centroid frame differs.

    The Lloyd trainer is iterative and not SQL-expressible, so the
    oracle checks a RECALL BOUND instead of the ANN rows (VERDICT r03
    "next" #6): the frame returns the *exact* KNN top-k (DuckDB
    recomputes it independently) plus ``recall_ok`` — whether the
    trained index recovered ≥ {IVF_RECALL_FLOOR:.0%} of that exact
    top-k. The hits count is computed in-plan (1-row aggregate,
    broadcast) — no driver-side action.

    Scale: training collects only the capped sample; everything else is
    the broadcast assign + nprobe-pruned probe of the sampled twin. The
    trained centroids come from the session's index artifact
    (:func:`shared_ivf_centroids`) — trained once per corpus, probed by
    every consumer, exactly as a production index lifecycle works."""
    import math

    v = _vectors(spark, sf_dir)
    centroids = shared_ivf_centroids(
        spark, sf_dir, k=IVF_TRAINED_CELLS, iters=5
    )
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("qe"))
    corpus = v.filter(F.col("vec_id") != QUERY_VEC_ID)
    assigned = ivf_assign(corpus, centroids)
    ann = ivf_topk(
        assigned, centroids, q, k=TOP_K, nprobe=IVF_TRAINED_NPROBE
    ).select("vec_id")
    exact = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("e"), F.col("qe")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )
    hits = exact.join(ann, "vec_id").agg(F.count("*").alias("n_hits"))
    floor = math.ceil(IVF_RECALL_FLOOR * TOP_K)
    return exact.crossJoin(F.broadcast(hits)).select(
        "vec_id", "cos_sim", (F.col("n_hits") >= floor).alias("recall_ok")
    )


QUANT_BITS_MAX = 127  # int8 symmetric range


@query(
    "emb_normalize_quantize",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm
      FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings)
    )
    SELECT vec_id, label,
           CAST(floor(nrm * 10000 + 0.5) AS BIGINT) AS norm_x10k,
           array_to_string(list_transform(e,
             x -> CAST(floor(x / nrm * {QUANT_BITS_MAX} + 0.5) AS BIGINT)),
             ',') AS q8,
           CAST(list_sum(list_transform(e,
             x -> CAST(floor(abs(x / nrm * {QUANT_BITS_MAX}
                    - floor(x / nrm * {QUANT_BITS_MAX} + 0.5)) * 1000000 + 0.5)
                  AS BIGINT))) AS BIGINT) AS quant_err_x1e6
    FROM n
    WHERE nrm > 0
    """,
    tags=("similarity", "embedding", "quantization", "pipeline"),
)
def emb_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding normalization + int8 symmetric scalar quantization —
    the storage/transfer compression step before an embedding corpus is
    indexed (4× smaller than float32, 8× smaller than the double
    working form). Emits the L2 norm (×10⁴, integerized), the
    ','-joined int8 codes (string, not array — the driver canonicalizer
    rejects list columns), and the total absolute quantization error
    per vector, integerized PER ELEMENT (×10⁶) before the sum so the
    reduction is order-independent across engines.

    Scale: pure per-row array math (zip_with/aggregate/transform), no
    shuffle, no Python; the quantized string is ~3 bytes/dim.
    """
    v = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    nrm = F.sqrt(dot(F.col("e"), F.col("e")))
    scaled = lambda x: x / F.col("nrm") * QUANT_BITS_MAX  # noqa: E731
    code = lambda x: F.floor(scaled(x) + 0.5)  # noqa: E731
    return (
        v.withColumn("nrm", nrm)
        .filter(F.col("nrm") > 0)
        .select(
            "vec_id",
            "label",
            F.floor(F.col("nrm") * 10000 + 0.5).cast("long").alias("norm_x10k"),
            F.array_join(
                F.transform("e", lambda x: code(x).cast("long").cast("string")),
                ",",
            ).alias("q8"),
            F.aggregate(
                F.transform(
                    "e",
                    lambda x: F.floor(
                        F.abs(scaled(x) - code(x)) * 1_000_000 + 0.5
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("quant_err_x1e6"),
        )
    )


BATCH_QUERY_MAX_ID = 5  # vec_id 0..4 are the serving batch


@query(
    "emb_ann_lsh_topk_batch",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    sig AS (
      SELECT vec_id, e, {{sig}} AS s FROM v
    ),
    q AS (
      SELECT vec_id AS query_id, e AS qe, {{sig}} AS qs
      FROM v WHERE vec_id < {BATCH_QUERY_MAX_ID}
    ),
    ranked AS (
      SELECT q.query_id, sig.vec_id,
             round({{cos}}, 4) AS cos_sim,
             bit_count(xor(sig.s, q.qs)) AS sig_hamming,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY round({{cos}}, 4) DESC, sig.vec_id
             ) AS rn
      FROM sig, q
      WHERE sig.vec_id <> q.query_id
        AND bit_count(xor(sig.s, q.qs)) <= {LSH_MAX_HAMMING}
    )
    SELECT query_id, vec_id, cos_sim, sig_hamming
    FROM ranked WHERE rn <= {TOP_K}
    """.replace("{sig}", _sig_sql("e")).replace(
        "{cos}", _cos_sql("sig.e", "q.qe")
    ),
    tags=("similarity", "ann", "lsh", "batch-serving"),
)
def emb_ann_lsh_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN serving: LSH top-k for a batch of query vectors
    (vec_id 0-4) in ONE plan — broadcast query signatures, map-side
    popcount prefilter, exact cosine re-rank, per-query row_number
    top-k. The single-query twin (``emb_ann_lsh_topk``) verifies the
    index; this verifies the serving shape retrieval actually runs.

    Scale: corpus work is |corpus|·|Q| integer popcounts with NO
    shuffle before the per-query top-k window (|Q| partitions of
    hamming survivors only); signatures are ingest-precomputable.
    """
    v = _vectors(spark, sf_dir)
    queries = v.filter(F.col("vec_id") < BATCH_QUERY_MAX_ID).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    return lsh_topk_batch(
        v,
        queries,
        HYPERPLANES,
        k=TOP_K,
        max_hamming=LSH_MAX_HAMMING,
        # queries ARE corpus rows here, sharing the vec_id space — the
        # one case where self-exclusion is correct.
        exclude_self=True,
    )


# ---------------------------------------------- product quantization
#
# The 100 TB embedding-store compression step: 64-dim vectors → 8
# one-byte codes (8 subvectors × 16-entry codebooks) + reconstruction
# error. Codebooks are deterministic corpus rows (vec_id % 25 == 0,
# 16 entries) so DuckDB reproduces the whole assignment; a production
# trainer would k-means each subspace exactly like ivf_train and stay
# outside the oracle surface. Distances are written as EXPLICIT
# left-associated per-element sums so Spark and DuckDB execute the
# identical IEEE double expression — argmin ties then break by code.
PQ_M = 8  # subvectors
PQ_SUB = DIM // PQ_M  # dims per subvector
PQ_K = 16  # codes per subvector
PQ_CODE_STRIDE = 25


def _pq_dist_terms(s: int, elem: str, a_col: str = "e", b_col: str = "ce") -> str:
    """L2^2 of subvector ``s`` as an explicit left-assoc sum; ``elem``
    formats one element access, e.g. 'element_at({col},{j})' or
    '{col}[{j}]'; ``a_col``/``b_col`` name the two vector columns (the
    LUT builders pass a_col='qe')."""
    terms = []
    for j in range(s * PQ_SUB + 1, (s + 1) * PQ_SUB + 1):
        a = elem.format(col=a_col, j=j)
        b = elem.format(col=b_col, j=j)
        terms.append(f"(({a})-({b}))*(({a})-({b}))")
    return " + ".join(terms)


@query(
    "emb_pq_codes",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    cb AS (
      SELECT vec_id // {PQ_CODE_STRIDE} AS code, e AS ce FROM v
      WHERE vec_id % {PQ_CODE_STRIDE} = 0
        AND vec_id < {PQ_CODE_STRIDE * PQ_K}
    ),
    dists AS (
      SELECT vec_id, code,
             {", ".join(f"({_pq_dist_terms(s, '{col}[{j}]')}) AS d{s}" for s in range(PQ_M))}
      FROM v, cb
    ),
    mins AS (
      SELECT vec_id,
             {", ".join(f"min(struct_pack(d := d{s}, c := code)) AS m{s}" for s in range(PQ_M))}
      FROM dists GROUP BY vec_id
    )
    SELECT vec_id,
           concat_ws(',', {", ".join(f"CAST(m{s}.c AS VARCHAR)" for s in range(PQ_M))}) AS pq_codes,
           CAST(floor(({" + ".join(f"m{s}.d" for s in range(PQ_M))}) * 1000000 + 0.5) AS BIGINT)
             AS recon_err_x1e6
    FROM mins
    """,
    tags=("similarity", "embedding", "quantization", "pq", "ann"),
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization of the embedding corpus: each 64-dim vector
    compressed to 8 four-bit codes (argmin subvector codebook entry,
    ties to the lower code) plus the total reconstruction error — the
    IVF-PQ storage layout that makes billion-vector ANN fit in memory
    (codes are 4 bytes/vector vs 256 for float32).

    Scale: the 16-row codebook broadcasts; assignment is one
    broadcast cross join (n x 16 rows, never vector x vector) and ONE
    shuffle (the per-vector argmin aggregate). Distance expressions
    are explicit per-element arithmetic kept in whole-stage codegen —
    and written in the same left-associated order as the oracle SQL,
    so both engines produce bit-identical doubles.
    """
    v = _vectors(spark, sf_dir)
    cb = v.filter(
        (F.col("vec_id") % PQ_CODE_STRIDE == 0)
        & (F.col("vec_id") < PQ_CODE_STRIDE * PQ_K)
    ).select(
        (F.col("vec_id") / PQ_CODE_STRIDE).cast("int").alias("code"),
        F.col("e").alias("ce"),
    )
    pairs = v.crossJoin(F.broadcast(cb))
    dists = pairs.select(
        "vec_id",
        "code",
        *[
            F.expr(_pq_dist_terms(s, "element_at({col},{j})")).alias(f"d{s}")
            for s in range(PQ_M)
        ],
    )
    mins = dists.groupBy("vec_id").agg(
        *[
            F.min(F.struct(F.col(f"d{s}").alias("d"), F.col("code").alias("c"))).alias(
                f"m{s}"
            )
            for s in range(PQ_M)
        ]
    )
    codes = F.concat_ws(
        ",", *[F.col(f"m{s}.c").cast("string") for s in range(PQ_M)]
    )
    err_expr = " + ".join(f"m{s}.d" for s in range(PQ_M))
    return mins.select(
        "vec_id",
        codes.alias("pq_codes"),
        F.expr(f"CAST(floor(({err_expr}) * 1000000 + 0.5) AS BIGINT)").alias(
            "recon_err_x1e6"
        ),
    )


def _pq_oracle_codes_cte() -> str:
    """The code-assignment CTEs shared by the PQ oracles (v → cb →
    dists → mins), verbatim from the emb_pq_codes oracle."""
    return f"""
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    cb AS (
      SELECT vec_id // {PQ_CODE_STRIDE} AS code, e AS ce FROM v
      WHERE vec_id % {PQ_CODE_STRIDE} = 0
        AND vec_id < {PQ_CODE_STRIDE * PQ_K}
    ),
    dists AS (
      SELECT vec_id, code,
             {", ".join(f"({_pq_dist_terms(s, '{col}[{j}]')}) AS d{s}" for s in range(PQ_M))}
      FROM v, cb
    ),
    mins AS (
      SELECT vec_id,
             {", ".join(f"min(struct_pack(d := d{s}, c := code)) AS m{s}" for s in range(PQ_M))}
      FROM dists GROUP BY vec_id
    )"""


@query(
    "emb_pq_adc_topk",
    oracle=f"""
    WITH {_pq_oracle_codes_cte()},
    q AS (SELECT e AS qe FROM v WHERE vec_id = {QUERY_VEC_ID}),
    lut AS (
      SELECT code,
             {", ".join(f"({_pq_dist_terms(s, '{col}[{j}]', a_col='qe')}) AS q{s}" for s in range(PQ_M))}
      FROM cb, q
    )
    SELECT m.vec_id,
           CAST(floor(({" + ".join(f"l{s}.q{s}" for s in range(PQ_M))}) * 1000000 + 0.5)
                AS BIGINT) AS adc_dist_x1e6
    FROM mins m
    {" ".join(f"JOIN lut l{s} ON l{s}.code = m.m{s}.c" for s in range(PQ_M))}
    WHERE m.vec_id <> {QUERY_VEC_ID}
    ORDER BY adc_dist_x1e6 ASC, m.vec_id
    LIMIT {TOP_K}
    """,
    tags=("similarity", "ann", "pq", "adc", "top-k"),
)
def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-compressed corpus —
    the FAISS IVF-PQ scan: the query vector is NOT quantized; each
    corpus vector's approximate distance is the sum of 8 lookup-table
    entries indexed by its codes, so scanning n vectors costs n x 8
    table lookups instead of n x 64 float ops.

    Scale: the LUT is PQ_K rows (computed once against the broadcast
    query vector); the scan is the code frame joined to the broadcast
    LUT per subvector — at 100 TB the code frame is the 4-byte-per-
    vector index that replaces the raw embeddings, and the top-k plans
    as TakeOrderedAndProject. Distances reuse the explicit
    left-associated arithmetic, so the oracle reproduces every double
    bit-for-bit.
    """
    v = _vectors(spark, sf_dir)
    cb = v.filter(
        (F.col("vec_id") % PQ_CODE_STRIDE == 0)
        & (F.col("vec_id") < PQ_CODE_STRIDE * PQ_K)
    ).select(
        (F.col("vec_id") / PQ_CODE_STRIDE).cast("int").alias("code"),
        F.col("e").alias("ce"),
    )
    pairs = v.crossJoin(F.broadcast(cb))
    dists = pairs.select(
        "vec_id",
        "code",
        *[
            F.expr(_pq_dist_terms(s, "element_at({col},{j})")).alias(f"d{s}")
            for s in range(PQ_M)
        ],
    )
    mins = dists.groupBy("vec_id").agg(
        *[
            F.min(F.struct(F.col(f"d{s}").alias("d"), F.col("code").alias("c"))).alias(
                f"m{s}"
            )
            for s in range(PQ_M)
        ]
    )
    # LUT COMPUTED ON THE DRIVER: the codebook is 16 corpus rows by
    # construction (and the query vector is one of them — vec_id 0 is a
    # stride row), so ONE bounded collect feeds a pure-Python LUT
    # build. The arithmetic is an explicit left-associated loop over
    # the same per-element terms _pq_dist_terms generates — Python
    # floats ARE IEEE doubles evaluated in program order, so every LUT
    # entry is bit-identical to the SQL oracle's l{s}.q{s} and the
    # hash-compared adc distances are unaffected. (A persist()'d Spark
    # LUT leaked a cached frame per invocation — ADVICE r05 — and even
    # the collected-frame variant spent a Spark job on a 16-row
    # crossJoin this closed form doesn't need.)
    cb_rows = {
        r["vec_id"] // PQ_CODE_STRIDE: r["e"]
        for r in v.filter(
            (F.col("vec_id") % PQ_CODE_STRIDE == 0)
            & (F.col("vec_id") < PQ_CODE_STRIDE * PQ_K)
        ).collect()
    }
    qe = cb_rows[QUERY_VEC_ID // PQ_CODE_STRIDE]
    lut_rows = []
    for code in range(PQ_K):
        ce = cb_rows[code]
        for s in range(PQ_M):
            acc = 0.0
            for j in range(s * PQ_SUB, (s + 1) * PQ_SUB):
                d = qe[j] - ce[j]
                acc = acc + d * d  # left-assoc, matches _pq_dist_terms
            lut_rows.append((code, s, acc))
    lut = spark.createDataFrame(lut_rows, "code int, s int, qd double")
    # ADC scan as ONE broadcast join (the emb_ivfpq_topk shape,
    # measured ~4× faster than eight chained per-subspace joins): fan
    # each vector's codes out to (subspace, code) rows, join the
    # long-form LUT, sum per vector. The addition ORDER is specified
    # by the plan itself — collect the (s, qd) terms, array_sort (s is
    # unique per vector, so this is subspace order), then a left-fold
    # `aggregate` — so the FP sum is q0+q1+…+q7 regardless of how the
    # engine partitions or partially aggregates the 8 fan-out rows
    # (ADVICE r06: the previous grouped sum(qd) only matched the
    # oracle's left-associated order by an implementation accident).
    codes_long = mins.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id",
        F.posexplode(
            F.array(*[F.col(f"m{s}.c") for s in range(PQ_M)])
        ).alias("s", "code"),
    )
    return (
        codes_long.join(F.broadcast(lut), ["s", "code"])
        .groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("s", "qd"))
            ).alias("terms")
        )
        .select(
            "vec_id",
            F.expr(
                "CAST(floor(aggregate(terms, CAST(0.0 AS DOUBLE),"
                " (acc, t) -> acc + t.qd) * 1000000 + 0.5) AS BIGINT)"
            ).alias("adc_dist_x1e6"),
        )
        .orderBy(F.asc("adc_dist_x1e6"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# ------------------------------------------------------------- IVF-PQ
#
# The production billion-vector layout the ANN family has been building
# toward (FAISS IndexIVFPQ): vectors are coarse-quantized to trained
# IVF cells, the RESIDUAL (v̂ − centroid) is PQ-encoded with per-subspace
# k-means codebooks, and a query ADC-scans only the nprobe probed
# cells' code lists. Both trainers are iterative (not SQL-expressible),
# so the oracle checks the recall bound against independent exact KNN —
# the emb_ann_ivf_trained_topk pattern.
#
# nlist SCALES WITH THE CORPUS (r09, VERDICT r08 #1): a fixed cell
# count makes SemDeDup's within-cell candidate join Σ|cell|² =
# n²/nlist — quadratic in corpus size. The FAISS guidance nlist ≈ √n
# restores the published n^1.5 bound; :func:`ivfpq_cells` derives
# ⌊√n⌋ clamped to [IVFPQ_CELLS_MIN, IVFPQ_MAX_CELLS] from one count()
# per (session, corpus), and EVERY consumer of the trained coarse
# quantizer (codebook trainer, encoder, probes, query path) threads
# the same derived value. The semdedup oracles need no nlist constant
# at all — they read the trained cell assignment from the at-rest
# export, so the derivation is invisible to them; the ivfpq_topk
# oracle is a recall bound against exact KNN, equally nlist-free.
IVFPQ_CELLS_MIN = 16
# TOP-LEVEL cell cap (r13; re-scoped r14): bounds the broadcast
# centroid tensor (4096×64 f32 ≈ 1 MB) and the driver Lloyd step. The
# old shared IVF_MAX_CELLS=128 clamp made Σ|cell|² quadratic past
# n=16k (measured: probe2 53.6× at 10× rows on the r13 scale ladder).
# r14 removes the residual √n-freeze entirely: the cap no longer
# limits SemDeDup's candidate cells, because each top-level cell is
# SPLIT into ⌈|cell|/SEMDEDUP_CELL_ROWS⌉ sub-cells (two-level coarse
# quantization — operators/similarity.py:train_subcells), so candidate
# mass is Σ|subcell|² ≈ n·SEMDEDUP_CELL_ROWS — linear at any corpus
# size. The ADC/topk query path keeps the flat top level (its cost is
# nprobe-fractional, never quadratic).
IVFPQ_MAX_CELLS = 4096
# Target sub-cell occupancy for SemDeDup's within-cell candidate join.
# Below it (every top-level cell ≤ this many rows — all shipped test
# SFs) the split is a no-op (subcell 0 everywhere) and plans are
# bit-identical to the single-level layout; above it, occupancy stays
# ~constant so candidate mass grows linearly. The dial trades within-
# cell recall (bigger = more) against per-cell pair cost.
SEMDEDUP_CELL_ROWS = 64
# Query-time probe depth keeps a CONSTANT COVERAGE FRACTION as nlist
# grows (nprobe = max(4, ⌈nlist/4⌉) ≈ 25% of cells): recall against the
# exact top-k stays statistically flat while candidate count per query
# still drops as cells shrink. At production scale the fraction is the
# operator's recall/latency dial; the floor below is a machinery
# tripwire, not an ANN-quality claim (see IVFPQ_RECALL_FLOOR).
IVFPQ_NPROBE = 4

_IVFPQ_NLIST: dict[tuple[str, str], int] = {}


def ivfpq_cells(spark: SparkSession, sf_dir: str) -> int:
    """Corpus-derived coarse cell count: ⌊√n⌋ clamped to
    [{IVFPQ_CELLS_MIN}, IVFPQ_MAX_CELLS]. One count() per (session,
    corpus), cached alongside the other trained artifacts.

    The TRAINED index's cap is {IVFPQ_MAX_CELLS}, not the untrained
    variant's IVF_MAX_CELLS=128 (that cap exists for SQL
    reproducibility of the stride-sampled centroids, which the trained
    path doesn't need — its oracle re-derives from the exported index).
    The r13 scale ladder measured the 128 clamp reverting SemDeDup's
    candidate mass to n²/128 past n=16k: Σc² grew 99.5× at 10× rows
    (312.8M vs 3.14M pairs, probe2 wall 53.6× vs the n^1.5 bound's
    31.6×). r14: the cap is no longer a SemDeDup ceiling at all —
    past it (and past target occupancy before it) the level-2 split
    (:func:`shared_subcell_centroids`) keeps candidate cells at
    ~SEMDEDUP_CELL_ROWS rows each, so this value only sizes the
    broadcast tensor ({IVFPQ_MAX_CELLS}×64 floats ≈ 1 MB)."""
    import math

    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> int:
        n = load_tables(spark, sf_dir)["embeddings"].count()
        return max(IVFPQ_CELLS_MIN, min(IVFPQ_MAX_CELLS, math.isqrt(n)))

    key = (spark.sparkContext.applicationId, sf_dir)
    return session_artifact(_IVFPQ_NLIST, key, build)


def ivfpq_nprobe(cells: int) -> int:
    """Probe depth for the ADC query path at a given nlist — constant
    ~25% cell coverage with a floor of {IVFPQ_NPROBE}."""
    return max(IVFPQ_NPROBE, -(-cells // 4))
# 8-bit codebooks (FAISS's default) — 4-bit codes measured near-random
# ADC rankings on this corpus (near-random embeddings are close to
# incompressible; 2-5/10 raw ADC hits). The PQ trainer's sample is
# capped at 256 samples/code, the FAISS training-size guidance.
IVFPQ_K = 256
IVFPQ_TRAIN_CAP = IVFPQ_K * 256
# ADC is a CANDIDATE ranking, not the final one: the query exact-
# re-ranks the ADC top-REFINE candidates (FAISS IndexRefineFlat),
# which converts ~0.3 raw-ADC recall into ~0.7-0.9 at REFINE=5·k.
IVFPQ_REFINE = 50
# Recall floor for the full chain at nprobe=4/16 cells. The cap is the
# coarse stage (trained-IVF twin measures 8/10 at this nprobe); refine
# recovers most of what ADC mis-ranks — measured 7/10 (sf0.001), 8/10
# (sf0.01), 9/10 (sf0.1). Floor 0.5 leaves two-hit slack; it is a
# machinery-regression tripwire, not an ANN-quality claim about random
# data (see IVF_RECALL_FLOOR's rationale).
IVFPQ_RECALL_FLOOR = 0.5

_PQ_BOOKS: dict[tuple[str, str], object] = {}
_IVFPQ_INDEX: dict[tuple[str, str], str] = {}  # at-rest parquet dirs
# Rank-2 coarse assignment handoff from the index build to the probe
# build (r17): keyed (applicationId, sf_dir); populated ONLY when this
# session ran the index encode (a warm at-rest index skips the build
# and the probe path falls back to its exclusion kernel).
_IVFPQ_RANK2: dict[tuple[str, str], DataFrame] = {}

# At-rest root for the IVFPQ index exports (r08; hardened r09 per
# ADVICE). The oracle SQL is a STATIC string, so the index must land at
# a path DuckDB can glob without knowing sf_dir: one subdirectory per
# corpus (md5 of its sf_dir), every row carrying two corpus
# discriminators (row count + an order-free integer fingerprint of the
# embeddings) that the oracle recomputes from its own `embeddings` view
# to select exactly the matching export.
#
# r09 hardening (ADVICE r08 medium):
# - The root is overridable via $CHB_AT_REST_ROOT (read at import, the
#   oracle strings are generated from the resolved value).
# - A CODE-VERSION HASH (md5 of this module + the operator kernels)
#   namespaces every export: a prior code version's exports live under
#   a different version dir and can never glob into this version's
#   oracle, so cross-version determinism is no longer assumed.
# - Publication is ATOMIC: builds write to a .staging sibling (outside
#   the oracle's glob) and os.rename() into place — a concurrent
#   same-version session either wins the rename or discards its
#   identical staging copy; readers never observe a half-written or
#   mode-overwrite-truncated export.
# - Stale version dirs are EVICTED (best-effort, >6h old) at build
#   time, restoring the pre-r08 cleanup discipline.
import hashlib as _hashlib
import os as _os


def _at_rest_code_version() -> str:
    """md5 over the source files whose code determines export content —
    editing either one re-namespaces the at-rest exports."""
    import clickhouse_build_spark.operators.similarity as _ops

    h = _hashlib.md5()
    for p in (__file__, _ops.__file__):
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def _resolve_at_rest_base() -> str:
    """At-rest export root. $CHB_AT_REST_ROOT wins verbatim; the
    DEFAULT is a per-user 0700 directory under the system tempdir
    (VERDICT r09 #8 — a world-shared predictable /tmp path could be
    pre-created/poisoned by another local user). The default dir is
    created eagerly with restrictive perms so no other user can claim
    the name first with looser ones."""
    env = _os.environ.get("CHB_AT_REST_ROOT")
    if env:
        return env
    import tempfile

    uid = _os.getuid() if hasattr(_os, "getuid") else "u"
    base = _os.path.join(tempfile.gettempdir(), f"chb_at_rest_{uid}")
    try:
        _os.makedirs(base, mode=0o700, exist_ok=True)
        _os.chmod(base, 0o700)
    except OSError:
        pass
    return base


_AT_REST_BASE = _resolve_at_rest_base()
_AT_REST_VERSION = _at_rest_code_version()
IVFPQ_AT_REST_ROOT = f"{_AT_REST_BASE}/{_AT_REST_VERSION}/ivfpq"


def _ivfpq_export_dir(sf_dir: str) -> str:
    return _os.path.join(
        IVFPQ_AT_REST_ROOT, _hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )


def _newest_mtime(path: str) -> float:
    """Newest mtime anywhere under ``path`` — a version dir's OWN mtime
    is its creation time (new exports only touch deeper levels), so
    liveness must look at the tree (review r09)."""
    newest = _os.path.getmtime(path)
    for root, dirs, files in _os.walk(path):
        for name in dirs + files:
            try:
                newest = max(
                    newest, _os.path.getmtime(_os.path.join(root, name))
                )
            except OSError:
                pass
    return newest


def _evict_stale_versions() -> None:
    """Best-effort removal of at-rest version dirs other than the
    current code version whose entire TREE is untouched for >6h — old
    enough that no live session is reading or writing them."""
    import shutil
    import time

    try:
        entries = _os.listdir(_AT_REST_BASE)
    except OSError:
        return
    for name in entries:
        if name == _AT_REST_VERSION:
            continue
        p = _os.path.join(_AT_REST_BASE, name)
        try:
            if time.time() - _newest_mtime(p) > 6 * 3600:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass


def _export_matches_corpus(
    spark: SparkSession, path: str, n: int, fp: int
) -> bool:
    """Does the existing export at ``path`` carry the live corpus's
    discriminators? Every row embeds (n_corpus, fp_corpus), so one row
    decides. Unreadable/empty exports count as stale."""
    try:
        r = (
            spark.read.parquet(path)
            .select("n_corpus", "fp_corpus")
            .first()
        )
        return r is not None and (r[0], r[1]) == (n, fp)
    except Exception:
        return False


def _publish_atomic(write, final_path: str, is_current=None) -> None:
    """Write an export via ``write(staging_path)`` then atomically
    rename into ``final_path``. Staging lives under a .staging sibling
    so the oracle's ``{root}/*/cell=*`` glob never sees it.

    If another same-version session already published, the existing
    export wins ONLY when ``is_current`` confirms it still describes
    the live corpus — a corpus REGENERATED at an unchanged sf_dir path
    (same md5 subdir, same code version) must REPLACE the stale export,
    because the engine reads the export unfiltered (only the DuckDB
    oracle filters on the embedded discriminators; review r09). A
    replacement failure raises rather than silently serving stale
    codes."""
    import shutil

    _evict_stale_versions()
    # r18: a current-at-rest export short-circuits the write — the
    # OUTCOME is identical to losing the rename race below (the
    # existing export wins whenever ``is_current`` confirms it), but a
    # warm session skips the redundant staging write + churn. The
    # staleness rule is unchanged: anything ``is_current`` rejects (or
    # when no check is supplied, any existing path) still goes through
    # the write-and-replace path.
    if (
        is_current is not None
        and _os.path.isdir(final_path)
        and is_current(final_path)
    ):
        try:
            _os.utime(f"{_AT_REST_BASE}/{_AT_REST_VERSION}")
        except OSError:
            pass
        return
    parent = _os.path.dirname(final_path)
    staging = _os.path.join(
        parent,
        ".staging",
        f"{_os.path.basename(final_path)}-{_os.getpid()}",
    )
    write(staging)
    _os.makedirs(parent, exist_ok=True)
    try:
        _os.rename(staging, final_path)
    except OSError:
        if is_current is not None and not is_current(final_path):
            shutil.rmtree(final_path, ignore_errors=True)
            _os.rename(staging, final_path)  # loud on failure
        else:
            shutil.rmtree(staging, ignore_errors=True)
    # keep the version tree's liveness visible to other sessions'
    # eviction scans
    try:
        _os.utime(f"{_AT_REST_BASE}/{_AT_REST_VERSION}")
    except OSError:
        pass


# Order-free corpus fingerprint: per-row integer (first embedding
# element, fixed-point 1e6) weighted by vec_id+1, integer-summed — both
# engines evaluate it bit-identically in any order.
_CORPUS_FP_SQL = (
    "sum((vec_id + 1) * CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000"
    " + 0.5) AS BIGINT))"
)


def shared_pq_codebooks(spark: SparkSession, sf_dir: str):
    """Trained per-subspace PQ codebooks for the corpus's coarse
    residuals — the (m, k, dim/m) tensor, trained once per (session,
    sf_dir) on the same bounded driver sample the coarse quantizer
    uses. Production trains this at index-build time; every encode and
    every query LUT reads the same tensor."""
    from clickhouse_build_spark.operators.similarity import (
        ivfpq_train_from_sample,
    )
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build():
        cent = shared_ivf_centroids(
            spark, sf_dir, k=ivfpq_cells(spark, sf_dir), iters=5
        )
        return ivfpq_train_from_sample(
            _vectors(spark, sf_dir),
            cent,
            m=PQ_M,
            k=IVFPQ_K,
            sample_cap=IVFPQ_TRAIN_CAP,
        )

    key = (spark.sparkContext.applicationId, sf_dir)
    return session_artifact(_PQ_BOOKS, key, build)


def _normalize(v: DataFrame) -> DataFrame:
    """L2-normalize a (vec_id, e) frame, dropping zero vectors."""
    nrm = F.sqrt(dot(F.col("e"), F.col("e")))
    return (
        v.withColumn("__n", nrm)
        .filter(F.col("__n") > 0)
        .select(
            "vec_id",
            F.transform("e", lambda x: x / F.col("__n")).alias("e"),
        )
    )


def _unit_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalized nonzero vectors — the exact frame the index build
    coarse-assigns, factored out so probe assignment (r08 nprobe>1)
    reproduces the index's rank-1 cell BIT-IDENTICALLY (cosine is
    scale-invariant mathematically but not in FP; both paths must
    normalize the same way before scoring)."""
    return _normalize(_vectors(spark, sf_dir))


def _ivfpq_encode(
    spark: SparkSession,
    sf_dir: str,
    vectors: DataFrame,
    top2: bool = False,
) -> DataFrame:
    """Encode a (vec_id, e) frame against the corpus's TRAINED
    artifacts (coarse centroids + residual codebooks) → (vec_id, cell,
    c0..c7). Shared by the index build and incremental append — the
    appended rows' codes are bit-identical to what a full re-encode
    would produce because both run this exact kernel against the same
    trained tensors. Coarse assignment happens here (one vectorized
    kernel pass over the input frame, ADVICE r14: no caller has a
    precomputed assignment to share at encode time — the index IS
    what first materializes rank 1).

    ``top2`` (r17): ride the runner-up coarse cell (``cell2``) through
    the encode output — computed for free from the assignment kernel's
    existing score matrix, so the index build can hand the probe
    builder its rank-2 pass (see :func:`shared_ivfpq_probes`)."""
    import numpy as np
    import pandas as pd

    cent = shared_ivf_centroids(
        spark, sf_dir, k=ivfpq_cells(spark, sf_dir), iters=5
    )
    books = shared_pq_codebooks(spark, sf_dir)
    unit = _normalize(vectors)
    assigned = ivf_assign_kernel(unit, cent, top2=top2)
    res = assigned.join(F.broadcast(cent), "cell").select(
        "vec_id",
        "cell",
        *(["cell2"] if top2 else []),
        F.zip_with("e", "ce", lambda x, y: x - y).alias("res"),
    )
    bc = spark.sparkContext.broadcast(np.asarray(books, dtype=np.float64))

    def encode(batches):
        bks = bc.value  # (PQ_M, k, PQ_SUB)
        for pdf in batches:
            if not len(pdf):
                continue
            R = np.vstack(pdf["res"].values)
            out = {
                "vec_id": pdf["vec_id"].values,
                "cell": pdf["cell"].values,
            }
            if top2:
                out["cell2"] = pdf["cell2"].values
            codes = [
                np.empty(len(pdf), dtype=np.int32) for _ in range(PQ_M)
            ]
            # direct (x − c)² form in bounded chunks: bit-identical
            # to the test reference, ≤ chunk×k×sub temp floats
            for lo in range(0, len(pdf), 1024):
                hi = min(lo + 1024, len(pdf))
                for s in range(PQ_M):
                    sub = R[lo:hi, s * PQ_SUB : (s + 1) * PQ_SUB]
                    d = ((sub[:, None, :] - bks[s][None, :, :]) ** 2).sum(-1)
                    codes[s][lo:hi] = d.argmin(1)
            for s in range(PQ_M):
                out[f"c{s}"] = codes[s]
            yield pd.DataFrame(out)

    schema = (
        "vec_id long, cell long, "
        + ("cell2 long, " if top2 else "")
        + ", ".join(f"c{s} int" for s in range(PQ_M))
    )
    return res.mapInPandas(encode, schema)


def _corpus_discriminators(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    emb = load_tables(spark, sf_dir)["embeddings"]
    d = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "sum((vec_id + 1) * CAST(floor(CAST(element_at(embedding, 1)"
            " AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
        ).alias("fp"),
    ).collect()[0]
    return int(d["n"]), int(d["fp"])


_SUBCELLS: dict[tuple[str, str], object] = {}
_SUBCELL_NONE = object()  # session_artifact can't cache a None value



def shared_subcell_centroids(spark: SparkSession, sf_dir: str):
    """Level-2 coarse quantizer (r14, VERDICT r13 #1): per-top-cell
    sub-centroids targeting ``SEMDEDUP_CELL_ROWS`` occupancy, or None
    when every top-level cell is already under target (all shipped
    test SFs — the split only activates at scale). Trained ONCE per
    (session, corpus) from the same unit-normalized frame every other
    consumer scores, so index build, probe table and incremental
    append assign sub-cells bit-identically. The frame is ~n/target
    rows; consumers only ever equi-join it on ``cell``."""
    from clickhouse_build_spark.operators.similarity import train_subcells
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build():
        cent = shared_ivf_centroids(
            spark, sf_dir, k=ivfpq_cells(spark, sf_dir), iters=5
        )
        assigned = ivf_assign_kernel(_unit_vectors(spark, sf_dir), cent)
        sub = train_subcells(
            assigned, cent, target_rows=SEMDEDUP_CELL_ROWS
        )
        if sub is None:
            return _SUBCELL_NONE
        return sub.localCheckpoint(eager=True)

    key = (spark.sparkContext.applicationId, sf_dir)
    got = session_artifact(_SUBCELLS, key, build)
    return None if got is _SUBCELL_NONE else got


def _with_subcell(
    spark: SparkSession, sf_dir: str, assigned: DataFrame
) -> DataFrame:
    """Add the level-2 ``subcell`` column to a (vec_id, cell, ...)
    frame. Single-level corpora get the literal 0 — the exact pre-r14
    layout, no extra join or shuffle in the plan."""
    from clickhouse_build_spark.operators.similarity import subcell_assign

    subcent = shared_subcell_centroids(spark, sf_dir)
    if subcent is None:
        return assigned.withColumn("subcell", F.lit(0).cast("long"))
    sub = subcell_assign(
        assigned.join(_unit_vectors(spark, sf_dir), "vec_id"), subcent
    )
    return assigned.join(sub, ["vec_id", "cell"])


def shared_ivfpq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-rest IVF-PQ index: (vec_id, cell, c0..c7) — one 8-bit
    code per subspace per vector (IVFPQ_K=256 codebooks; the 4-bit
    layout is the separate emb_pq_codes family) plus its coarse cell,
    built ONCE per (session, sf_dir) and probed by every query. This is
    the frame that replaces raw embeddings at 100 TB (8 bytes/vector vs
    256 for float32), and it genuinely lands AT REST as
    cell-partitioned parquet (r07 — previously an in-memory persist
    with a "would partition by cell" note): a probe's nprobe pruning is
    REAL partition pruning, visible as a PartitionFilters clause in
    ``emb_ivfpq_topk``'s scan.

    Encode plan: unit-normalize (cosine ranking ⇔ L2 on the sphere, the
    FAISS normalize-then-L2 recipe), coarse-assign via one broadcast
    pass, subtract the broadcast centroid, then a vectorized
    Arrow-batched argmin over the broadcast codebook tensor — the whole
    encode is SHUFFLE-FREE and emits one narrow row per vector.
    (VERDICT r06 note #5: the previous plan cross-joined the 256-row
    codebook frame — a 256× row inflation through a grouped argmin —
    which is exactly what dominates an index build at 10⁹ vectors; the
    kernel computes the same argmin per 1024-row numpy chunk, matching
    the per-subspace reference computation in tests/test_similarity.py
    code-for-code.)

    r08: the export path is DETERMINISTIC per corpus
    (:func:`_ivfpq_export_dir`) and each row carries the corpus
    discriminators (``n_corpus``, ``fp_corpus``), so the
    ``emb_semdedup_keepers`` DuckDB oracle can ``read_parquet()`` the
    trained cell assignment — the index is data, not code. Consumers
    see the pre-r08 schema (vec_id, cell, c0..c7); ``cell`` is cast
    back to long after the read because hive partition inference
    returns int (ADVICE r07)."""
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> str:
        codes = _ivfpq_encode(
            spark, sf_dir, _vectors(spark, sf_dir), top2=True
        )
        # The codes feed up to three branches (subcell scoring, the
        # final write, and the rank-2 probe handoff below) — freeze
        # them so the encode kernel runs once.
        codes = codes.localCheckpoint(eager=True)
        # r17: the encode kernel's score matrix yields the runner-up
        # coarse cell for free; stash it for shared_ivfpq_probes so a
        # same-session probe build skips re-reading and re-scoring the
        # whole corpus (bit-identical to its exclusion-kernel pass —
        # same S, same masked argmax). Session-scoped lazy plan over
        # the checkpoint: no result caching across processes.
        app_id = spark.sparkContext.applicationId
        # evict stale-session entries (ADVICE r17): a long-lived
        # process that recreates SparkSessions must not leak
        # checkpoint-backed frames of dead sessions
        for k in [k for k in _IVFPQ_RANK2 if k[0] != app_id]:
            del _IVFPQ_RANK2[k]
        _IVFPQ_RANK2[(app_id, sf_dir)] = codes.select(
            "vec_id", F.col("cell2").alias("cell")
        )
        codes = codes.drop("cell2")
        codes = _with_subcell(spark, sf_dir, codes)
        # Corpus discriminators stamped onto every row (one tiny agg +
        # collect of a single 2-column row): the static-SQL oracle globs
        # ALL exports under IVFPQ_AT_REST_ROOT and selects this corpus's
        # by recomputing (n, fp) from its own embeddings view.
        n, fp = _corpus_discriminators(spark, sf_dir)
        # cast: F.lit() types a small Python int as INT32, so exports
        # from small corpora would drift from big-fp corpora and break
        # the oracle's cross-export glob (DuckDB unifies on first file)
        codes = codes.select(
            "*",
            F.lit(n).cast("long").alias("n_corpus"),
            F.lit(fp).cast("long").alias("fp_corpus"),
        )
        path = _ivfpq_export_dir(sf_dir)
        _publish_atomic(
            # Cluster by the partition key before the partitioned write
            # (guide §6 output sizing): partitionBy alone makes every
            # input task write a file per cell it happens to hold, so a
            # fanned-out encode stage would shatter each cell into
            # task-count shards; one hash shuffle on ``cell`` keeps the
            # export at one well-sized file per cell at any scale.
            lambda staging: codes.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(staging),
            path,
            is_current=lambda p: _export_matches_corpus(spark, p, n, fp),
        )
        return path

    key = (spark.sparkContext.applicationId, sf_dir)
    path = session_artifact(_IVFPQ_INDEX, key, build)
    # Consumers get the pre-export schema back: cell re-cast to long
    # (hive partition-column inference yields int — ADVICE r07 type-drift
    # trap), discriminator columns dropped. ``subcell`` (r14) rides
    # along for the SemDeDup candidate join; ADC consumers ignore it.
    return spark.read.parquet(path).select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        "subcell",
        *[f"c{s}" for s in range(PQ_M)],
    )


def append_to_ivfpq_index(
    spark: SparkSession, sf_dir: str, new_vectors: DataFrame
) -> int:
    """Incremental index maintenance (r08 capstone): add vectors to the
    at-rest IVFPQ index WITHOUT retraining — the FAISS ``add()``
    lifecycle. The new (vec_id, e double array) rows are coarse-assigned
    and PQ-encoded against the corpus's EXISTING trained centroids and
    codebooks (the shared :func:`_ivfpq_encode` kernel, so their codes
    are bit-identical to a full re-encode), then appended to the
    cell-partitioned export — each new row lands in exactly its cell's
    directory; no existing file is touched.

    This is how a production index absorbs a days's ingest between
    retrains: train-rarely / encode-on-arrival. Quantization quality
    for the appended rows is bounded by how well the trained cells
    cover them (the standard drift trade — retrain cadence is the
    operator's dial). Returns the number of rows appended. Caller
    contract: vec_ids not already indexed; duplicates are collapsed by
    index readers' DISTINCT but waste space.
    """
    # Force the base index (and its export) to exist first.
    shared_ivfpq_index(spark, sf_dir)
    codes = _ivfpq_encode(spark, sf_dir, new_vectors)
    if shared_subcell_centroids(spark, sf_dir) is not None:
        codes = codes.localCheckpoint(eager=True)
    # level-2 assignment scores the NEW vectors' unit frame against the
    # existing trained sub-centroids — same no-retrain lifecycle
    subcent = shared_subcell_centroids(spark, sf_dir)
    if subcent is None:
        codes = codes.withColumn("subcell", F.lit(0).cast("long"))
    else:
        from clickhouse_build_spark.operators.similarity import subcell_assign

        sub = subcell_assign(
            codes.select("vec_id", "cell").join(
                _normalize(new_vectors), "vec_id"
            ),
            subcent,
        )
        codes = codes.join(sub, ["vec_id", "cell"])
    n, fp = _corpus_discriminators(spark, sf_dir)
    codes = codes.select(
        "*",
        F.lit(n).cast("long").alias("n_corpus"),
        F.lit(fp).cast("long").alias("fp_corpus"),
    ).localCheckpoint(eager=True)
    appended = codes.count()
    codes.repartition("cell").write.mode("append").partitionBy(
        "cell"
    ).parquet(_ivfpq_export_dir(sf_dir))
    return appended


@query(
    "emb_ivfpq_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    scored AS (
      SELECT e.vec_id,
             {_cos_sql('CAST(e.embedding AS DOUBLE[])', 'q.qe')} AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, round(cos_sim, 4) AS cos_sim, TRUE AS recall_ok
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
    tags=("similarity", "ann", "ivf", "pq", "adc", "index"),
)
def emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN search, the full production composition: trained
    coarse cells (:func:`shared_ivf_centroids`) + trained per-subspace
    residual codebooks (:func:`shared_pq_codebooks`) + the at-rest code
    index (:func:`shared_ivfpq_index`), queried FAISS-style — rank
    cells by centroid↔query cosine, build one ADC lookup table per
    probed cell from the QUERY's residual (q̂ − centroid), scan only the
    probed cells' codes (n×8 table lookups, no corpus vector math), and
    exact-refine the ADC top-{IVFPQ_REFINE} candidates against their
    raw vectors (FAISS IndexRefineFlat — {IVFPQ_REFINE} cosines total).

    Both trainers are iterative, so the oracle checks the RECALL BOUND
    (VERDICT r03 pattern): the frame returns the exact KNN top-k —
    DuckDB recomputes it independently — plus ``recall_ok``, whether
    the IVF-PQ index recovered ≥ {IVFPQ_RECALL_FLOOR:.0%} of it.

    Scale: the LUT is nprobe×16 rows (collected — bounded at any
    corpus size — and re-broadcast as a literal frame into the eight
    per-subspace joins); the index scan prunes to nprobe cells (cell
    partition pruning at rest); top-k plans as TakeOrderedAndProject.
    """
    import math

    import numpy as np

    v = _vectors(spark, sf_dir)
    nlist = ivfpq_cells(spark, sf_dir)
    nprobe = ivfpq_nprobe(nlist)
    cent = shared_ivf_centroids(spark, sf_dir, k=nlist, iters=5)
    books = shared_pq_codebooks(spark, sf_dir)
    index = shared_ivfpq_index(spark, sf_dir)
    # Everything query-side is driver-sized: the query vector (one row,
    # parquet-pushed-down), the centroid frame (nlist ≤ IVF_MAX_CELLS rows) and
    # the codebook tensor are all bounded at any corpus size — so cell
    # ranking and the per-probed-cell ADC LUT (nprobe × k rows) are
    # computed in numpy and shipped back as ONE literal broadcast frame
    # instead of a chain of tiny Spark jobs (the serving hot path does
    # exactly this: LUT construction is microseconds against an index
    # of any size).
    qe = np.array(
        v.filter(F.col("vec_id") == QUERY_VEC_ID).select("e").collect()[0]["e"]
    )
    qh = qe / np.linalg.norm(qe)
    C = np.vstack([r["ce"] for r in cent.orderBy("cell").collect()])
    cell_cos = C @ qh
    probe_cells = np.lexsort((np.arange(len(C)), -cell_cos))[:nprobe]
    lut_rows = [
        (
            int(c),
            s,
            int(code),
            float(
                (
                    (books[s][code] - (qh - C[c])[s * PQ_SUB : (s + 1) * PQ_SUB])
                    ** 2
                ).sum()
            ),
        )
        for c in probe_cells
        for s in range(PQ_M)
        for code in range(books.shape[1])
    ]
    lut = spark.createDataFrame(lut_rows, "cell long, s int, code int, qd double")
    q = spark.createDataFrame(
        [([float(x) for x in qe],)], "qe array<double>"
    )
    # ADC scan as ONE broadcast join: fan each indexed vector out to its
    # 8 (subspace, code) rows, hash-join the long-form LUT, sum partial
    # distances per vector. Measured 4.4× faster than eight chained
    # per-subspace broadcast joins (fewer stages), and the fan-out rows
    # stay inside their input partition, so the per-vector FP sum is
    # map-side, in row order, deterministic. nprobe pruning happens
    # TWICE by design: the explicit cell predicate below reaches the
    # cell-partitioned at-rest index as REAL partition pruning (the
    # scan lists only nprobe of the cell directories — this is the
    # whole point of the at-rest layout), and the LUT inner join
    # enforces the same set semantically.
    codes_long = (
        index.filter(
            F.col("cell").isin([int(c) for c in probe_cells])
            & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select(
            "vec_id",
            "cell",
            F.posexplode(
                F.array(*[F.col(f"c{s}") for s in range(PQ_M)])
            ).alias("s", "code"),
        )
    )
    cand = (
        codes_long.join(F.broadcast(lut), ["cell", "s", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd").alias("__adc"))
        .orderBy(F.asc("__adc"), F.asc("vec_id"))
        .limit(IVFPQ_REFINE)
        .select("vec_id")
    )
    corpus = v.filter(F.col("vec_id") != QUERY_VEC_ID)
    # refine: exact-re-rank the ADC candidates against the raw vectors
    # (FAISS IndexRefineFlat) — a broadcast id-join of REFINE rows, then
    # REFINE exact cosines; the corpus itself is never re-scanned
    ann = (
        corpus.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("e"), F.col("qe")), 4).alias("__cos"),
        )
        .orderBy(F.desc("__cos"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id")
    )
    exact = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("e"), F.col("qe")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )
    hits = exact.join(ann, "vec_id").agg(F.count("*").alias("n_hits"))
    floor = math.ceil(IVFPQ_RECALL_FLOOR * TOP_K)
    return exact.crossJoin(F.broadcast(hits)).select(
        "vec_id", "cos_sim", (F.col("n_hits") >= floor).alias("recall_ok")
    )


# ----------------------------------------------------- SemDeDup (r07)
#
# Semantic dedup routed through the at-rest IVFPQ index's coarse cells
# (VERDICT r06 "next" #6). The published operator this implements is
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
# embeddings, compute pairwise similarity only WITHIN each cluster, and
# drop above-threshold members. Within-cluster is the operator's
# DEFINITION, not an approximation budget — production semantic dedup
# accepts the cross-cluster miss in exchange for turning an O(n²) pair
# scan into Σ per-cell O(|cell|²) with cells that shrink as k grows.
#
# Honesty note (measured, this corpus): the directive's stronger bar —
# cell-candidate keepers IDENTICAL to the all-pairs/LSH path on real
# sf0.1 data — is not achievable at NEAR_DUP_COS=0.4: the embeddings
# are near-random (no cos ≥ 0.5 mass beyond 14 pairs at sf0.1), and
# only ~24% of cos ≥ 0.4 pairs share their top-1 of 16 trained cells
# (~61% share a top-2 probe). That is a property of the data, not the
# plan — at 0.4 the pair geometry is nowhere near the cell diameter.
# r08, measured through the OPERATOR (ivfpq_cell_cosine_pairs, refined
# pair recall vs the exact all-pairs set): nprobe=1 → 0.258 (sf0.001) /
# 0.356 (sf0.01); nprobe=2 → 0.697 / 0.678, with the nprobe=1 pair set
# a strict subset of nprobe=2 and precision 1 at both depths
# (tests/test_semdedup.py::test_nprobe2_recall_gain re-asserts the
# subset/precision contract; the recall row is re-measured here).
# The equality the directive asks for DOES hold where it mathematically
# can: on tight duplicate clusters (the case semantic dedup exists
# for), every cluster lands in one cell and the keeper assignment is
# bit-identical to the exact all-pairs path AND the LSH-banded path —
# proven in tests/test_semdedup.py on a planted corpus. On real data
# the tests pin the refinement contract instead: candidate pairs are a
# SUBSET of the exact pair set (precision 1 — the refine is exact
# cosine), so semdedup clusters always refine exact-path clusters.


# Multi-probe SemDeDup (r08, VERDICT r07 #5): assign each vector to its
# top-SEMDEDUP_NPROBE cells and union the per-cell self-joins. The
# probe table lands at rest like the code index so the nprobe=2 keeper
# query is fully oracle-checkable.
SEMDEDUP_NPROBE = 2
# Versioned like the code index (r09): see the IVFPQ_AT_REST_ROOT note.
IVFPQ_PROBES_AT_REST_ROOT = f"{_AT_REST_BASE}/{_AT_REST_VERSION}/ivfpq_probes"
_IVFPQ_PROBES: dict[tuple[str, str, int], str] = {}


def shared_ivfpq_probes(
    spark: SparkSession, sf_dir: str, nprobe: int = SEMDEDUP_NPROBE
) -> DataFrame:
    """At-rest multi-probe assignment (vec_id, cell, probe_rank ≤
    nprobe) against the SAME trained coarse centroids the code index
    uses; rank 1 equals the index's cell bit-identically (both paths
    score the :func:`_unit_vectors` frame — pytest-pinned in
    tests/test_semdedup.py). Export layout mirrors the code index:
    deterministic per-corpus subdir + (n_corpus, fp_corpus)
    discriminator columns, partitioned by cell."""
    import hashlib
    import os

    from clickhouse_build_spark.operators.similarity import ivf_assign_probes
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> str:
        unit = _unit_vectors(spark, sf_dir)
        subcent = shared_subcell_centroids(spark, sf_dir)
        if nprobe == SEMDEDUP_NPROBE:
            # r14: rank 1 IS the at-rest index's (cell, subcell) —
            # bit-identical by the pinned contract and already built
            # by the index consumers, so the only scoring here is the
            # rank-2 "next-best cell" pass (one narrow bounded argmax
            # with the index cells as a broadcast exclusion). The
            # previous plan re-scored ALL ranks through a collect_list
            # whose shuffle carried every scored struct — the r14
            # ladder's probe2 wall.
            from clickhouse_build_spark.operators.similarity import (
                ivf_assign_kernel,
                subcell_assign,
            )

            cent = shared_ivf_centroids(
                spark, sf_dir, k=ivfpq_cells(spark, sf_dir), iters=5
            )
            idx = shared_ivfpq_index(spark, sf_dir).select(
                "vec_id", "cell", "subcell"
            )
            rank1 = idx.select(
                "vec_id", "cell", "subcell",
                F.lit(1).alias("probe_rank"),
            )
            # r17: when THIS session built the index, its encode pass
            # already produced the runner-up cell from the same score
            # matrix (bit-identical to the exclusion kernel — same S,
            # same masked first-max argmax); consume the handoff and
            # skip re-reading + re-scoring the corpus. A warm at-rest
            # index leaves no handoff → the exclusion pass runs as
            # before.
            r2_pre = _IVFPQ_RANK2.get(
                (spark.sparkContext.applicationId, sf_dir)
            )
            if r2_pre is not None:
                r2 = r2_pre.select(
                    "vec_id", "cell", F.lit(2).alias("probe_rank")
                )
            else:
                r2 = ivf_assign_kernel(
                    unit, cent, exclude=idx.select("vec_id", "cell")
                ).select(
                    "vec_id", "cell", F.lit(2).alias("probe_rank")
                )
            if subcent is None:
                rank2 = r2.withColumn("subcell", F.lit(0).cast("long"))
            else:
                if r2_pre is None:
                    # freeze the n narrow rank-2 rows: they feed both
                    # the subcell scoring and the final join (the
                    # handoff frame is already checkpoint-backed)
                    r2 = r2.localCheckpoint(eager=True)
                sub = subcell_assign(r2.join(unit, "vec_id"), subcent)
                rank2 = r2.join(sub, ["vec_id", "cell"])
            probes = rank1.unionByName(
                rank2.select("vec_id", "cell", "subcell", "probe_rank")
            )
        else:
            cent = shared_ivf_centroids(
                spark, sf_dir, k=ivfpq_cells(spark, sf_dir), iters=5
            )
            probes = ivf_assign_probes(unit, cent, nprobe=nprobe)
            if subcent is None:
                probes = probes.withColumn(
                    "subcell", F.lit(0).cast("long")
                )
            else:
                from clickhouse_build_spark.operators.similarity import (
                    subcell_assign,
                )

                probes = probes.localCheckpoint(eager=True)
                sub = subcell_assign(probes.join(unit, "vec_id"), subcent)
                probes = probes.join(sub, ["vec_id", "cell"])
        emb = load_tables(spark, sf_dir)["embeddings"]
        d = emb.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "sum((vec_id + 1) * CAST(floor(CAST(element_at(embedding, 1)"
                " AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
            ).alias("fp"),
        ).collect()[0]
        probes = probes.select(
            "*",
            F.lit(int(d["n"])).cast("long").alias("n_corpus"),
            F.lit(int(d["fp"])).cast("long").alias("fp_corpus"),
        )
        # nprobe level FIRST so an oracle glob rooted at .../np{n} never
        # unions exports built with a different probe depth
        path = os.path.join(
            IVFPQ_PROBES_AT_REST_ROOT,
            f"np{nprobe}",
            hashlib.md5(sf_dir.encode()).hexdigest()[:12],
        )
        _publish_atomic(
            # same pre-write cell clustering as the index export
            lambda staging: probes.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(staging),
            path,
            is_current=lambda p: _export_matches_corpus(
                spark, p, int(d["n"]), int(d["fp"])
            ),
        )
        return path

    key = (spark.sparkContext.applicationId, sf_dir, nprobe)
    path = session_artifact(_IVFPQ_PROBES, key, build)
    return spark.read.parquet(path).select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        "subcell",
        "probe_rank",
    )


def ivfpq_cell_cosine_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = NEAR_DUP_COS,
    nprobe: int = 1,
) -> DataFrame:
    """Within-cell exact-cosine pairs over the at-rest IVFPQ index:
    candidates are generated by an equi-join on the coarse cell id —
    at scale the index is partitioned BY CELL, so this join is
    partition-local (each cell's code list joins itself; no all-pairs
    shuffle, no vector ever joins a vector until a candidate id-pair
    exists). Refine fetches the two raw vectors by key and keeps exact
    cos ≥ threshold, mirroring emb_near_dup_cosine's output shape.

    ``nprobe`` > 1 (r08) unions the per-probe equi-joins via the
    at-rest probe table (:func:`shared_ivfpq_probes`): a pair is a
    candidate when the two vectors share ANY probed cell; pairs sharing
    two cells are deduped before the refine."""
    if nprobe <= 1:
        idx = shared_ivfpq_index(spark, sf_dir).select(
            "vec_id", "cell", "subcell"
        )
    else:
        idx = shared_ivfpq_probes(spark, sf_dir, nprobe=nprobe).select(
            "vec_id", "cell", "subcell"
        )
    # r14: candidates share the LEVEL-2 cell — (cell, subcell) — so the
    # per-cell quadratic term is bounded by SEMDEDUP_CELL_ROWS at any
    # corpus size (single-level corpora carry subcell=0 everywhere and
    # the join degenerates to the plain cell equi-join).
    cand = (
        idx.alias("a")
        .join(idx.alias("b"), ["cell", "subcell"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
    )
    if nprobe > 1:
        cand = cand.dropDuplicates(["vec_a", "vec_b"])
    v = _vectors(spark, sf_dir)
    # Precompute each vector's norm ONCE (n rows) instead of per
    # candidate pair (r18, VERDICT r17 #3 "reuse the norms" — the same
    # rule lsh_bucketed_cosine_pairs already applies): the cosine
    # expression sits in both the filter and the projection, so the
    # interpreted ‖a‖/‖b‖ folds ran FOUR times per candidate while the
    # dot ran twice. dot/(na·nb) below is the identical float
    # expression tree — dot(a,a) per vector, sqrt, product, divide —
    # so values are bit-for-bit unchanged (A/B verified: 178k
    # candidates at sf0.1, result sets identical, 3.8→1.5 s).
    nrm = F.sqrt(dot(F.col("e"), F.col("e")))
    va = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        nrm.alias("__na"),
    )
    vb = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        nrm.alias("__nb"),
    )
    c = dot(F.col("ea"), F.col("eb")) / (F.col("__na") * F.col("__nb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .filter(c >= threshold)
        .select("vec_a", "vec_b", F.round(c, 4).alias("cos_sim"))
    )


def _semdedup_keepers_oracle(root: str = IVFPQ_AT_REST_ROOT) -> str:
    """Full DuckDB re-derivation of SemDeDup (r08 — closes the last
    rows-only registry entry): the trained cell assignment is READ FROM
    THE AT-REST INDEX (``read_parquet`` over the deterministic export,
    selected by the corpus discriminators), so the only non-SQL step —
    the iterative quantizer — enters as data; candidate pairs
    (within-cell self-join), the exact-cosine refine and the
    recursive-CTE keeper closure are all recomputed in SQL, mirroring
    ``plans/dedup.py:_keepers_oracle``. With ``root`` pointed at the
    multi-probe export the same SQL verifies the nprobe>1 variant (the
    candidate DISTINCT collapses pairs sharing two probed cells)."""
    return f"""
    WITH RECURSIVE emb_d AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    disc AS (
      SELECT count(*) AS n, {_CORPUS_FP_SQL} AS fp FROM embeddings
    ),
    idx AS (
      SELECT DISTINCT i.vec_id, i.cell, i.subcell
      FROM read_parquet('{root}/*/cell=*/*.parquet',
                        hive_partitioning = 1, union_by_name = 1) i, disc
      WHERE i.n_corpus = disc.n AND i.fp_corpus = disc.fp
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM idx a JOIN idx b ON a.cell = b.cell AND a.subcell = b.subcell
                           AND a.vec_id < b.vec_id
    ),
    sem_pairs AS (
      SELECT c.vec_a, c.vec_b
      FROM cand c
      JOIN emb_d a ON a.vec_id = c.vec_a
      JOIN emb_d b ON b.vec_id = c.vec_b
      WHERE {_cos_sql('a.e', 'b.e')} >= {NEAR_DUP_COS}
    ),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM sem_pairs
      UNION
      SELECT vec_b AS src, vec_a AS dst FROM sem_pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS vec_id, least(src, min(dst)) AS keeper
      FROM reach GROUP BY src
    )
    SELECT v.vec_id, COALESCE(c.keeper, v.vec_id) AS keeper
    FROM embeddings v LEFT JOIN comp c USING (vec_id)
    """


@query(
    "emb_semdedup_keepers",
    # r08: full hash oracle (was the one rows-only registry entry
    # through r07). The at-rest index export makes the trained cell
    # assignment readable data; everything downstream of it is exact
    # SQL. The planted-cluster / precision-1 contracts remain pinned by
    # tests/test_semdedup.py.
    oracle=_semdedup_keepers_oracle(),
    tags=("similarity", "dedup", "semdedup", "ivfpq", "keepers", "pipeline"),
)
def emb_semdedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic dedup within the trained IVFPQ coarse cells —
    cell-pruned candidate join on the at-rest code index, exact-cosine
    refine at NEAR_DUP_COS, then the identical pointer-doubling keeper
    operator every other dedup pipeline feeds
    (``operators/dedup.py:dedup_keepers``).

    Scale: this is the production semantic-dedup layout for 10⁹+
    vectors — the candidate join is per-cell (partition pruning; cells
    bound the quadratic term), the index build is amortized by
    ``build_ivfpq_index``, and components only ever see the id-pair
    edge list. See the module-level SemDeDup note for the measured
    within-cell recall contract on this corpus.
    """
    from clickhouse_build_spark.operators.dedup import dedup_keepers

    v = _vectors(spark, sf_dir)
    pairs = ivfpq_cell_cosine_pairs(spark, sf_dir, NEAR_DUP_COS).select(
        F.col("vec_a").alias("id_a"), F.col("vec_b").alias("id_b")
    )
    return dedup_keepers(pairs, v.select("vec_id"), id_col="vec_id").orderBy(
        "vec_id"
    )


@query(
    "emb_semdedup_probe2_keepers",
    oracle=_semdedup_keepers_oracle(
        root=f"{IVFPQ_PROBES_AT_REST_ROOT}/np{SEMDEDUP_NPROBE}"
    ),
    tags=("similarity", "dedup", "semdedup", "ivfpq", "nprobe", "keepers"),
)
def emb_semdedup_probe2_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with multi-probe candidates (r08, VERDICT r07 #5):
    each vector joins its top-{SEMDEDUP_NPROBE} coarse cells (at-rest
    probe table, :func:`shared_ivfpq_probes`), so near-dup pairs that
    straddle a cell boundary become candidates — measured through the
    operator on this corpus, refined-pair recall vs the exact all-pairs
    set rises from 0.26–0.36 (nprobe=1) to ~0.68–0.70 (nprobe=2), at
    precision 1 (module note). Refine and keeper assignment
    are identical to ``emb_semdedup_keepers``; the oracle re-derives
    everything from the probe export in SQL.

    Scale: candidate generation stays an equi-join on ``cell`` over a
    cell-partitioned table — nprobe multiplies rows per cell (Σ|cell|²
    grows ×nprobe²/nlist-ish), the standard recall/cost dial."""
    from clickhouse_build_spark.operators.dedup import dedup_keepers

    v = _vectors(spark, sf_dir)
    pairs = ivfpq_cell_cosine_pairs(
        spark, sf_dir, NEAR_DUP_COS, nprobe=SEMDEDUP_NPROBE
    ).select(F.col("vec_a").alias("id_a"), F.col("vec_b").alias("id_b"))
    return dedup_keepers(pairs, v.select("vec_id"), id_col="vec_id").orderBy(
        "vec_id"
    )
