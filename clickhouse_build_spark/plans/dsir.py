"""DSIR — Data Selection via Importance Resampling over ``documents``
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023, arXiv:2302.03169).

DSIR is the standard recipe for skewing a raw crawl toward a trusted
target domain without training a model: fit two bag-of-hashed-ngram
distributions (target vs raw), weight every raw document by its log
importance ratio, and Gumbel-top-k sample without replacement. This
module re-expresses the whole recipe Spark-first, completing the
quality-filter triptych: discriminative NB (``plans/quality.py``),
generative LM (``plans/perplexity.py``), and distribution-matching
importance weights (here).

- **Features are hashed bigrams** into ``DSIR_BUCKETS`` buckets with
  the portable md5 family — the paper's own hashing trick, and the same
  boundedness argument as the LM: the feature table never exceeds
  ``DSIR_BUCKETS`` rows at ANY corpus size, so it broadcasts at 100 TB.
- **Training is two grouped counts over ONE corpus scan** (the target
  counts are a filtered aggregation of the same bigram frame), plus a
  1-row totals frame; the per-bucket log ratio
  ``ln(ct+1) - ln(Tt+B) - ln(cr+1) + ln(Tr+B)`` (add-1 smoothed) is
  integerized per feature row (``floor(x*1e6+0.5)``, the ln-chain
  written ONCE and evaluated left-associated by both engines), so every
  per-document weight is a pure INTEGER sum — addition-order-free and
  hash-exact against DuckDB.
- **Sampling is Gumbel-top-k** exactly as the paper prescribes, made
  reproducible: the per-doc Gumbel noise ``-ln(-ln(u))`` draws ``u``
  from the portable hash of ``doc_id`` (u ∈ (0,1], never 0), is
  integerized to the same x1e6 fixed point, and the top
  ``max(1, n//5)`` documents by ``weight + gumbel`` are selected with a
  (key DESC, doc_id ASC) total order — the LIMIT boundary cannot flap.

Scale (100 TB): the bigram fan-out is codegen (no Python); both count
aggregations are map-side combined into a ≤B key space; the feature
table is O(B) integers and broadcasts; scoring is one more map-side-
combined integer sum keyed by doc. The exact top-20% rank uses a global
sort of (doc, weight) rows — at petabyte scale the production path is
an approximate weight threshold (``percentile_approx``) + boundary
refinement, which this plan degrades to without changing the scoring
side; the exact rank is kept here because the oracle pins exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.registry import query

DSIR_BUCKETS = 4096
DSIR_HASH_SEED = "dsir"
DSIR_GUMBEL_SEED = "dsir-g"
DSIR_SCALE = 1_000_000
# Target domain: the English subset stands in for the paper's trusted
# corpus (Wikipedia/books); raw = the whole documents table.
DSIR_TARGET_LANG = "en"
# Gumbel uniform granularity: u = (h % 1e6 + 1) / (1e6 + 1) ∈ (0, 1).
_GUMBEL_MOD = 1_000_000


def _bucket_sql_duck(w1: str, w2: str) -> str:
    from clickhouse_build_spark.operators.dedup import portable_hash_sql

    bigram = f"{w1} || ' ' || {w2}"
    return f"({portable_hash_sql(bigram, DSIR_HASH_SEED)} % {DSIR_BUCKETS})"


def _llr_expr(ct: str, cr: str, tt: str, tr: str) -> str:
    """Per-bucket log importance ratio in x1e6 fixed point — ONE string
    evaluated left-associated by both engines (the quality/perplexity
    fixed-point recipe)."""
    return (
        f"CAST(floor(((((ln(CAST({ct} + 1 AS DOUBLE))"
        f" - ln(CAST({tt} + {DSIR_BUCKETS} AS DOUBLE)))"
        f" - ln(CAST({cr} + 1 AS DOUBLE)))"
        f" + ln(CAST({tr} + {DSIR_BUCKETS} AS DOUBLE)))"
        f" * {DSIR_SCALE}.0) + 0.5) AS BIGINT)"
    )


def _gumbel_expr(hash_sql: str) -> str:
    """Reproducible Gumbel(0,1) noise in x1e6 fixed point from a
    portable integer hash. The composed ln∘ln keeps ≥2e3 fixed-point
    units of slack from the 0.5 rounding boundary in the worst case
    (u → 1 ⇒ |outer-ln error| ≈ ulp/1e-6 ≈ 2e-10 ⇒ 2e-4 units)."""
    u = f"(CAST(({hash_sql} % {_GUMBEL_MOD}) + 1 AS DOUBLE) / {_GUMBEL_MOD + 1}.0)"
    return (
        f"CAST(floor(((0.0 - ln((0.0 - ln({u})))) * {DSIR_SCALE}.0) + 0.5)"
        f" AS BIGINT)"
    )


def doc_bigram_dsir_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, b) — one row per adjacent token pair, bucketed
    into the DSIR feature space. Codegen fan-out, no Python."""
    from clickhouse_build_spark.operators.dedup import portable_hash

    toks = F.split(F.lower(F.col("text")), " ")
    d2 = (
        docs.filter(F.length("text") > 0)
        .select("doc_id", "lang", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    return d2.select("doc_id", "lang", F.explode(pairs).alias("bgram")).select(
        "doc_id",
        "lang",
        F.pmod(portable_hash(F.col("bgram"), DSIR_HASH_SEED), DSIR_BUCKETS).alias(
            "b"
        ),
    )


_DSIR_FEATURES: dict[tuple[str, str], DataFrame] = {}


def shared_dsir_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained importance-weight table (b, llr_x1e6), built once
    per (session, sf_dir): ≤DSIR_BUCKETS rows, persisted, broadcast by
    every consumer — the same train-once lifecycle as the LM and
    quality models."""
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> DataFrame:
        from pyspark import StorageLevel

        bg = doc_bigram_dsir_buckets(load_tables(spark, sf_dir)["documents"])
        cr = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
        ct = (
            bg.filter(F.col("lang") == DSIR_TARGET_LANG)
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("ct"))
        )
        joined = cr.join(ct, "b", "left").select(
            "b", F.coalesce("ct", F.lit(0)).alias("ct"), "cr"
        )
        tot = joined.agg(
            F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
        )
        feat = (
            joined.join(F.broadcast(tot))
            .select(
                "b",
                F.expr(_llr_expr("ct", "cr", "tt", "tr")).alias("llr_x1e6"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        return feat

    key = (spark.sparkContext.applicationId, sf_dir)
    return session_artifact(_DSIR_FEATURES, key, build)


_DSIR_WEIGHTS: dict[tuple[str, str], DataFrame] = {}


def shared_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scored per-document weight frame (doc_id, lang, n_feats,
    weight_x1e6), built once per (session, sf_dir) and persisted
    (VERDICT r17 #6): ``doc_dsir_importance`` IS this frame and
    ``doc_dsir_sample`` keys off it, so the corpus-wide bigram
    explode+score pass runs once per session instead of once per
    consumer — the same train-once lifecycle as the feature table,
    LM and quality models. One row per document (weights, not
    documents), MEMORY_AND_DISK so big corpora spill instead of OOM."""
    from pyspark import StorageLevel

    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> DataFrame:
        docs = load_tables(spark, sf_dir)["documents"]
        feat = shared_dsir_features(spark, sf_dir)
        return dsir_weights(doc_bigram_dsir_buckets(docs), feat).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    key = (spark.sparkContext.applicationId, sf_dir)
    return session_artifact(_DSIR_WEIGHTS, key, build)


def dsir_weights(bg: DataFrame, feat: DataFrame) -> DataFrame:
    """(doc_id, lang, n_feats, weight_x1e6) — broadcast-join the
    feature table, one integer grouped sum per document. Every bucket
    a raw document produces exists in the raw counts by construction,
    so the join is inner (a frozen-model scorer over NOVEL documents
    would LEFT-join + coalesce, as the LM backoff does)."""
    return (
        bg.join(F.broadcast(feat), "b")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("llr_x1e6").alias("weight_x1e6"),
        )
    )


# ---------------------------------------------------------------- oracles

def _dsir_weights_cte() -> str:
    bucket = _bucket_sql_duck("toks[i]", "toks[i+1]")
    return f"""
  d2 AS (
    SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
    FROM documents
    WHERE length(text) > 0
      AND len(string_split(lower(text), ' ')) >= 2
  ),
  bg AS (
    SELECT doc_id, lang,
           UNNEST(list_transform(range(1, len(toks)), i -> {bucket})) AS b
    FROM d2
  ),
  cr AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM bg GROUP BY b),
  ct AS (
    SELECT b, CAST(count(*) AS BIGINT) AS ct FROM bg
    WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
  ),
  cnts AS (
    SELECT cr.b, COALESCE(ct.ct, 0) AS ct, cr.cr
    FROM cr LEFT JOIN ct USING (b)
  ),
  tot AS (
    SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
    FROM cnts
  ),
  feat AS (
    SELECT b, {_llr_expr('ct', 'cr', 'tt', 'tr')} AS llr_x1e6
    FROM cnts CROSS JOIN tot
  ),
  per AS (
    SELECT g.doc_id, MIN(g.lang) AS lang,
           CAST(count(*) AS BIGINT) AS n_feats,
           CAST(sum(f.llr_x1e6) AS BIGINT) AS weight_x1e6
    FROM bg g JOIN feat f USING (b)
    GROUP BY g.doc_id
  )"""


_WEIGHTS_ORACLE = f"""
WITH {_dsir_weights_cte()}
SELECT doc_id, lang, n_feats, weight_x1e6 FROM per
"""


@query("doc_dsir_importance", _WEIGHTS_ORACLE, tags=("dsir", "quality"))
def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR log importance weight (target = the English
    subset, raw = the whole corpus) — hashed-bigram distribution match,
    integer-exact against the DuckDB oracle."""
    return shared_dsir_weights(spark, sf_dir)


def _gumbel_duck() -> str:
    from clickhouse_build_spark.operators.dedup import portable_hash_sql

    return _gumbel_expr(portable_hash_sql("doc_id", DSIR_GUMBEL_SEED))


def _gumbel_spark() -> str:
    from clickhouse_build_spark.operators.dedup import portable_hash_spark_sql

    return _gumbel_expr(portable_hash_spark_sql("doc_id", DSIR_GUMBEL_SEED))


_SAMPLE_ORACLE = f"""
WITH {_dsir_weights_cte()},
keyed AS (
  SELECT doc_id, lang, weight_x1e6,
         weight_x1e6 + {_gumbel_duck()} AS key_x1e6
  FROM per
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY key_x1e6 DESC, doc_id) AS rk,
         count(*) OVER () AS n_docs
  FROM keyed
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(weight_x1e6) AS BIGINT) AS sum_weight_x1e6,
       CAST(min(key_x1e6) AS BIGINT) AS min_key_x1e6
FROM ranked
WHERE rk <= GREATEST(1, n_docs // 5)
GROUP BY lang
"""


# Boundary-slice margins for the distributed Gumbel-top-k (r10, VERDICT
# r09 #5): the approx quantiles are anchors only — runtime guards prove
# the slice brackets the k-th tuple, else the plan degrades to the
# exact global rank (correctness never rests on the sketch).
_DSIR_RATE = 0.2
_DSIR_MARGIN = 0.005


# key-value histogram bucketing for the top-k bracket: floor division
# keeps bucket order monotone in the key (SQL DIV truncates toward
# zero and would fold negatives); the key space is x1e6 fixed-point
# log-weights, so range/width stays a few thousand buckets
_DSIR_BUCKET_WIDTH = 1 << 14
_DSIR_MAX_HIST_ROWS = 200_000


def _dsir_top_k(keyed: DataFrame) -> DataFrame:
    """Exact top-``max(1, n//5)`` rows of ``keyed`` by
    ``(key_x1e6 DESC, doc_id ASC)`` — DISTRIBUTED (VERDICT r09 #5).

    r12 form: ONE histogram pass (map-side-combined count per
    floor(key/2^14) bucket, a bounded driver pull — the key space is
    fixed-point log-weights so the histogram is a few thousand rows,
    guarded by ``_DSIR_MAX_HIST_ROWS``) locates the k-th boundary
    bucket EXACTLY; whole buckets above it are kept with no ranking,
    and only the single boundary bucket is ranked via sort-limit
    (TakeOrderedAndProject) for the residual. Replaces the r10
    persist + percentile_approx + threshold-count guards (two extra
    full passes after the leak fix, 1.85x on the quiet bench) with
    exact arithmetic — no sketch, no guard fallback for ordinary data,
    no cached blocks. A pathological key range (histogram overflow)
    falls back to the exact global rank, keeping the result identical.

    100 TB: one map-side-combined agg + a top-(residual) over one
    bucket (~1/thousands of the corpus); widen the bucket width if the
    key range grows.
    """
    W = _DSIR_BUCKET_WIDTH
    kb = F.floor(F.col("key_x1e6") / W).cast("long")
    # Enforce the bound BEFORE materializing on the driver (ADVICE
    # r12): limit(+1) caps the pull at the guard size; an overflowed
    # histogram (len > MAX) takes the exact-global-rank fallback
    # without ever holding the full histogram driver-side.
    hist = (
        keyed.groupBy(kb.alias("kb"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .limit(_DSIR_MAX_HIST_ROWS + 1)
        .collect()
    )
    if not hist:
        return keyed.limit(0)
    if len(hist) <= _DSIR_MAX_HIST_ROWS:
        n = sum(r["cnt"] for r in hist)
        k = max(1, n // 5)
        cum = 0
        b_star, residual = None, 0
        for r in sorted(hist, key=lambda r: -r["kb"]):
            if cum + r["cnt"] >= k:
                b_star, residual = r["kb"], k - cum
                break
            cum += r["cnt"]
        sure = keyed.filter(kb > b_star)
        if residual == 0:
            return sure
        boundary = (
            keyed.filter(kb == b_star)
            .orderBy(F.desc("key_x1e6"), F.asc("doc_id"))
            .limit(residual)
        )
        return sure.unionByName(boundary)
    # histogram overflow (pathological key range): exact global rank
    # (n re-derived with a count — the truncated histogram can't sum it)
    n = keyed.count()
    k = max(1, n // 5)
    w = Window.orderBy(F.desc("key_x1e6"), F.asc("doc_id"))
    return (
        keyed.select("*", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


@query("doc_dsir_sample", _SAMPLE_ORACLE, tags=("dsir", "quality"))
def doc_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k importance resample (top 20% of the corpus by
    ``weight + Gumbel`` with hash-seeded reproducible noise), reported
    as per-language sample composition — the paper's sampling step,
    deterministic and oracle-exact. Selection is the distributed
    bracket-and-rank of :func:`_dsir_top_k`, not a global window."""
    per = shared_dsir_weights(spark, sf_dir)
    keyed = per.select(
        "doc_id",
        "lang",
        "weight_x1e6",
        (F.col("weight_x1e6") + F.expr(_gumbel_spark())).alias("key_x1e6"),
    )
    kept = _dsir_top_k(keyed)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("weight_x1e6").alias("sum_weight_x1e6"),
        F.min("key_x1e6").alias("min_key_x1e6"),
    )
