"""Okapi BM25 full-text ranking over ``documents`` — the lexical
retrieval stage of a data-curation / RAG pipeline (Robertson & Walker,
SIGIR 1994; the idf variant is Lucene's non-negative form).

ClickHouse ships this surface as its full-text index + ranking path
(``hasToken``/text-index searches feeding a relevance ORDER BY); the
reference's MergeTree-centric target makes lexical search a first-class
dashboard idiom, so the engine needs a ranked-retrieval analogue. It is
also the standard pre-filter in front of the embedding ANN family
(``plans/similarity.py``): BM25 candidates → vector re-rank.

Spark-first design — BM25 is pure relational algebra:

- **Corpus statistics are one aggregate**: N (docs) and total token
  length (for avgdl) come from a single 1-row frame that broadcasts;
  df per query term comes from the term-frequency frame itself, so the
  corpus is scanned ONCE.
- **Scoring is integer-exact across engines**: the per-(doc, term)
  BM25 contribution is ONE shared expression string evaluated by both
  Spark and DuckDB with identical program order (IEEE +,*,/ are
  correctly rounded, so given bit-equal ``ln`` the chain is bit-equal;
  the ≤1-ulp ``ln`` sits behind ``floor(x*1e6+0.5)`` — the fixed-point
  recipe proven by the quality/perplexity families). The per-document
  score is then a pure INTEGER sum — addition-order-free.
- **Top-k is a total order**: (score DESC, doc_id ASC) — doc_id is
  unique, so the LIMIT boundary can never flap between engines.

Scale (100 TB): the explode is codegen fan-out filtered to the query's
own terms BEFORE any shuffle (a handful of rows per matching doc); tf
aggregation is map-side combined on (doc_id, term); df and the corpus
scalars are tiny broadcast frames; the final top-k is
``TakeOrderedAndProject`` — no global sort materializes. Nothing is
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.registry import query

# Okapi constants (the universal defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_SCALE = 1_000_000
# A rare term ('dup' marks planted clone docs), a mid-df term and a
# high-df term — the idf spread is what makes the ranking non-trivial.
BM25_TERMS = ("dup", "vector", "batch")
BM25_TOPK = 10


def _bm25_term_expr(tf: str, dl: str, df: str, n_docs: str, total_len: str) -> str:
    """The per-(doc, term) BM25 contribution in x1e6 fixed point. ONE
    string shared by both engines:

    ``idf * tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)`` with
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Lucene's form, always
    positive) and ``avgdl = total_len/N`` folded in as
    ``k1*b*dl*N/total_len`` so every input stays an exact integer.
    """
    k1_1b = round(BM25_K1 * (1.0 - BM25_B), 10)  # 0.3
    k1_b = round(BM25_K1 * BM25_B, 10)  # 0.9
    k1p1 = round(BM25_K1 + 1.0, 10)  # 2.2
    idf = (
        f"ln(1.0 + ((CAST({n_docs} - {df} AS DOUBLE) + 0.5)"
        f" / (CAST({df} AS DOUBLE) + 0.5)))"
    )
    denom = (
        f"(CAST({tf} AS DOUBLE) + {k1_1b}"
        f" + ((({k1_b} * CAST({dl} AS DOUBLE)) * CAST({n_docs} AS DOUBLE))"
        f" / CAST({total_len} AS DOUBLE)))"
    )
    return (
        f"CAST(floor((({idf} * (CAST({tf} AS DOUBLE) * {k1p1})) / {denom})"
        f" * {BM25_SCALE}.0 + 0.5) AS BIGINT)"
    )


def bm25_scores(docs: DataFrame, terms: tuple[str, ...] = BM25_TERMS) -> DataFrame:
    """(doc_id, n_terms, score_x1e6) for every document matching at
    least one query term. Works on any documents-shaped frame."""
    toks = F.split(F.lower(F.col("text")), " ")
    base = docs.filter(F.length("text") > 0).select(
        "doc_id", toks.alias("toks")
    ).select("doc_id", F.size("toks").alias("dl"), "toks")
    # ONE pass over the corpus: the scalars aggregate the same frame the
    # term explode reads (Spark reuses the scan via the shuffle files).
    scal = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("w"))
        .filter(F.col("w").isin(list(terms)))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    dft = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    per_term = (
        tf.join(F.broadcast(dft), "w")
        .join(F.broadcast(scal))
        .select(
            "doc_id",
            F.expr(
                _bm25_term_expr("tf", "dl", "df", "n_docs", "total_len")
            ).alias("s"),
        )
    )
    return per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("s").alias("score_x1e6"),
    )


_BM25_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks
  FROM documents WHERE length(text) > 0
),
b2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base),
scal AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_len
  FROM b2
),
tok AS (SELECT doc_id, dl, UNNEST(toks) AS w FROM b2),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf, MIN(dl) AS dl
  FROM tok WHERE w IN ({', '.join(repr(t) for t in BM25_TERMS)})
  GROUP BY doc_id, w
),
dft AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
sc AS (
  SELECT doc_id,
         {_bm25_term_expr('tf', 'dl', 'df', 'n_docs', 'total_len')} AS s
  FROM tf JOIN dft USING (w) CROSS JOIN scal
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(s) AS BIGINT) AS score_x1e6
  FROM sc GROUP BY doc_id
)
SELECT doc_id, n_terms, score_x1e6
FROM per
ORDER BY score_x1e6 DESC, doc_id
LIMIT {BM25_TOPK}
"""


@query("doc_bm25_topk", _BM25_ORACLE, tags=("retrieval", "text"))
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by Okapi BM25 for the fixed query
    ``dup vector batch`` — lexical ranked retrieval as pure relational
    algebra, integer-exact against the DuckDB oracle."""
    docs = load_tables(spark, sf_dir)["documents"]
    scored = bm25_scores(docs)
    return scored.orderBy(
        F.desc("score_x1e6"), F.asc("doc_id")
    ).limit(BM25_TOPK)


# ------------------------------------------------- hybrid fusion (r10)

# Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
# the standard hybrid-retrieval combiner — rank-based, so the lexical
# and vector arms need no score calibration. Contributions are INTEGER
# (10^9 DIV (60 + rank)), so fusion is exact across engines.
RRF_K = 60
RRF_POOL = 50
RRF_TOPK = 10
RRF_CONTRIB_NUM = 1_000_000_000


def _rrf_contrib(rank: str) -> str:
    """Integer RRF contribution — same string for both engines (DuckDB
    // and Spark DIV both truncate positive integers)."""
    return f"({RRF_CONTRIB_NUM} DIV ({RRF_K} + {rank}))"


_RRF_ORACLE_BM25_CTE = _BM25_ORACLE[: _BM25_ORACLE.rfind("SELECT doc_id")]


def _rrf_oracle() -> str:
    from clickhouse_build_spark.plans.similarity import (
        QUERY_VEC_ID,
        _cos_sql,
    )

    contrib_l = _rrf_contrib("r_lex").replace(" DIV ", " // ")
    contrib_v = _rrf_contrib("r_vec").replace(" DIV ", " // ")
    return f"""
{_RRF_ORACLE_BM25_CTE.rstrip()},
lex AS (
  SELECT doc_id, CAST(row_number() OVER (
           ORDER BY score_x1e6 DESC, doc_id) AS BIGINT) AS r_lex
  FROM (SELECT doc_id, score_x1e6 FROM per
        ORDER BY score_x1e6 DESC, doc_id LIMIT {RRF_POOL})
),
q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
cos AS (
  SELECT e.vec_id AS doc_id,
         CAST(floor({_cos_sql('CAST(e.embedding AS DOUBLE[])', 'q.qe')}
              * 1000000 + 0.5) AS BIGINT) AS cos_x1e6
  FROM embeddings e, q
  WHERE e.vec_id <> {QUERY_VEC_ID}
),
vec AS (
  SELECT doc_id, CAST(row_number() OVER (
           ORDER BY cos_x1e6 DESC, doc_id) AS BIGINT) AS r_vec
  FROM (SELECT doc_id, cos_x1e6 FROM cos
        ORDER BY cos_x1e6 DESC, doc_id LIMIT {RRF_POOL})
),
fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         COALESCE(lex.r_lex, 0) AS r_lex,
         COALESCE(vec.r_vec, 0) AS r_vec,
         CAST((CASE WHEN lex.r_lex IS NULL THEN 0
                    ELSE {contrib_l} END)
            + (CASE WHEN vec.r_vec IS NULL THEN 0
                    ELSE {contrib_v} END) AS BIGINT) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT doc_id, r_lex, r_vec, rrf
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {RRF_TOPK}
"""


@query("doc_hybrid_rrf_topk", _rrf_oracle(), tags=("retrieval", "hybrid", "ann"))
def doc_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with exact
    embedding-cosine ranking by reciprocal-rank fusion — the standard
    two-arm RAG retrieval stage, composed entirely from this engine's
    existing operators (``bm25_scores`` + the shared left-associated
    cosine) and integer-exact against the DuckDB re-derivation.

    Scale: each arm is a ``TakeOrderedAndProject`` top-{RRF_POOL}
    (no global sort); the rank windows run over those CONSTANT-bounded
    pools, so the partition-less window touches ≤{RRF_POOL} rows by
    construction. Fusion is a full outer join of two ≤{RRF_POOL}-row
    frames. Nothing here grows with the corpus except the two arm
    scans themselves."""
    from pyspark.sql import Window

    from clickhouse_build_spark.plans.similarity import (
        QUERY_VEC_ID,
        _vectors,
        cosine,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    lex_pool = (
        bm25_scores(docs)
        .orderBy(F.desc("score_x1e6"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score_x1e6"), F.asc("doc_id")))
        .cast("long")
        .alias("r_lex"),
    )
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe")
    )
    vec_pool = (
        v.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.floor(cosine(F.col("e"), F.col("qe")) * 1_000_000 + 0.5)
            .cast("long")
            .alias("cos_x1e6"),
        )
        .orderBy(F.desc("cos_x1e6"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    vec = vec_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_x1e6"), F.asc("doc_id")))
        .cast("long")
        .alias("r_vec"),
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("r_lex", F.lit(0)).alias("r_lex"),
        F.coalesce("r_vec", F.lit(0)).alias("r_vec"),
        (
            F.when(
                F.col("r_lex").isNull(), F.lit(0).cast("long")
            ).otherwise(F.expr(_rrf_contrib("r_lex")))
            + F.when(
                F.col("r_vec").isNull(), F.lit(0).cast("long")
            ).otherwise(F.expr(_rrf_contrib("r_vec")))
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK)
