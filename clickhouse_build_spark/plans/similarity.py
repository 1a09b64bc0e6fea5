"""Similarity-search queries over ``embeddings`` (driver-mandated
extension surface: brute-force cosine top-k baseline + label centroids).

The scale path (LSH-bucketed ANN) lives in ``operators/similarity.py``;
these exact queries are its ground truth. All vector math uses built-in
higher-order functions (``zip_with`` + ``aggregate``) on double-cast
arrays — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.registry import query

QUERY_VEC_ID = 0
TOP_K = 10


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate — sequential left-to-right sum,
    matching the oracle's list_dot_product evaluation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


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
