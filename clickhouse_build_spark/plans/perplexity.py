"""Bigram language-model perplexity filtering over ``documents`` — the
CCNet-style LM-quality stage of a pretraining pipeline (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", arXiv:1911.00359).

CCNet's production recipe scores every document with a small language
model trained on trusted text and buckets the corpus into
head/middle/tail perplexity bands; the tail is dropped and the bands
drive sampling. This module re-expresses that recipe Spark-first,
alongside the Naive Bayes classifier (``plans/quality.py``) it
complements: the classifier is *discriminative* (good vs bad labels),
the LM is *generative* (how natural is this text under the corpus's
own token statistics) — production pipelines run both.

- **The model is a hashed bigram LM**: tokens hash into
  ``PPL_BUCKETS`` buckets with the portable md5 family
  (``operators/dedup.py:portable_hash``), so the conditional table is
  bounded at ``PPL_BUCKETS²`` rows at ANY corpus size — the hashing
  trick that makes "broadcast the model" legal at 100 TB.
- **Training is two grouped aggregations** (bigram counts, then
  left-context totals derived FROM the bigram counts — the corpus is
  never re-scanned), both map-side combined over a ≤B² key space.
- **Scoring is a broadcast join + one integer grouped sum**: each
  bigram's Laplace-smoothed negative log-likelihood is integerized per
  model row (``floor(x*1e6+0.5)``; the ln∘± chain is ONE shared
  expression string both engines evaluate left-associated), so the
  per-document total is a pure INTEGER sum — addition-order-free, and
  hash-exact against the DuckDB oracle at every SF.
- **Unseen bigrams back off** to the left-context-only likelihood
  (``ln(c1+B) - ln(0+1)``) via LEFT join + coalesce — batch-side the
  same corpus trains and scores so every bigram exists, but the
  streaming admission path (novel documents against a frozen model)
  needs the backoff, mirroring the quality family's ADVICE-r07 fix.
- **Banding** (``head`` / ``middle`` / ``tail``) uses fixed
  average-NLL-per-bigram thresholds in x1e6 fixed point — CCNet cuts
  on LM perplexity exactly this way (its thresholds are per-language
  constants chosen offline, as here).

Reference parity note: the reference (an LLM-migration CLI,
``/root/reference/src/main.py``) has no analogue; this family is part
of the driver-mandated LLM-data-pipeline surface ("quality scoring" —
SURVEY.md §2 text-analysis extension), the trained-LM counterpart to
``plans/quality.py``.

Scale (100 TB): the bigram explode is codegen fan-out (no Python);
training shuffles partial counts, not tokens (map-side combine into a
≤B² key space); the model is O(B²) integers and broadcasts; scoring
adds one more map-side-combined integer sum keyed by doc. Nothing
driver-side ever exceeds the bucket-pair count; no ``collect``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.registry import query

# Hashed-vocabulary size for the bigram conditional table (B² rows max;
# production would use 2^16+ buckets — the synthetic corpus vocabulary
# is ~60 words, so 64 buckets already give a near-collision-free table).
PPL_BUCKETS = 64
PPL_HASH_SEED = "ppl"
PPL_SCALE = 1_000_000
# Fixed head/middle/tail cuts on avg NLL per bigram (x1e6 nats): the
# corpus distribution spans ~[3.07, 3.60]e6; these cuts land ~20-30%
# head and a non-empty tail at every SF (probed at sf0.001/0.01/0.1).
PPL_HEAD_X1E6 = 3_250_000
PPL_TAIL_X1E6 = 3_325_000


def _bucket_col(w):
    from clickhouse_build_spark.operators.dedup import portable_hash

    return F.pmod(portable_hash(w, PPL_HASH_SEED), PPL_BUCKETS)


def _bucket_sql(expr: str) -> str:
    from clickhouse_build_spark.operators.dedup import portable_hash_sql

    # the md5-derived hash is non-negative, so % == pmod
    return f"({portable_hash_sql(expr, PPL_HASH_SEED)} % {PPL_BUCKETS})"


def _nll_expr(c1: str, c12: str) -> str:
    """Laplace-smoothed negative log-likelihood of one bigram given its
    left context, integerized to x1e6 fixed point. ONE string evaluated
    by both engines: given bit-equal ``ln`` of integer-valued doubles,
    the subtraction and scaling are bit-equal (IEEE, program order)."""
    return (
        f"CAST(floor((ln(CAST({c1} + {PPL_BUCKETS} AS DOUBLE))"
        f" - ln(CAST({c12} + 1 AS DOUBLE)))"
        f" * {PPL_SCALE}.0 + 0.5) AS BIGINT)"
    )


def _backoff_expr(c1: str) -> str:
    """NLL of an unseen bigram (c12 = 0, so the ``- ln(1)`` term is
    exactly 0 and is elided): left-context-only backoff. COALESCE keeps
    even an unseen LEFT context scoring (c1 → 0)."""
    return (
        f"CAST(floor(ln(CAST(COALESCE({c1}, 0) + {PPL_BUCKETS} AS DOUBLE))"
        f" * {PPL_SCALE}.0 + 0.5) AS BIGINT)"
    )


# Shared oracle CTE prefix: per-document bigram bucket pairs. DuckDB
# lists are 1-based and range(a, b) is half-open, so i spans 1..len-1
# — identical to the Spark side's sequence(1, size-1) with element_at.
_BG_SQL = f"""
  d2 AS (
    SELECT doc_id, source, string_split(lower(text), ' ') AS toks
    FROM documents
    WHERE length(text) > 0
      AND len(string_split(lower(text), ' ')) >= 2
  ),
  bg0 AS (
    SELECT doc_id, source,
           UNNEST(list_transform(range(1, len(toks)),
             i -> struct_pack(b1 := {_bucket_sql('toks[i]')},
                              b2 := {_bucket_sql('toks[i+1]')}))) AS pr
    FROM d2
  ),
  bg AS (SELECT doc_id, source, pr.b1 AS b1, pr.b2 AS b2 FROM bg0)"""

_MODEL_SQL = f"""
  c12 AS (
    SELECT b1, b2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
  ),
  c1 AS (
    SELECT b1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1
  ),
  model AS (
    SELECT m.b1, m.b2, m.c12, {_nll_expr('u.c1', 'm.c12')} AS nll_x1e6
    FROM c12 m JOIN c1 u USING (b1)
  )"""

_SCORE_SQL = f"""
  sc AS (
    SELECT g.doc_id, MIN(g.source) AS source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(COALESCE(m.nll_x1e6, {_backoff_expr('u.c1')}))
                AS BIGINT) AS nll_sum_x1e6
    FROM bg g
    LEFT JOIN model m USING (b1, b2)
    LEFT JOIN c1 u USING (b1)
    GROUP BY g.doc_id
  ),
  scored AS (
    SELECT doc_id, source, n_bigrams, nll_sum_x1e6,
           CAST(floor(CAST(nll_sum_x1e6 AS DOUBLE) / n_bigrams) AS BIGINT)
             AS avg_nll_x1e6
    FROM sc
  )"""


def doc_bigram_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, source, b1, b2) — one row per adjacent token pair, for
    any documents-shaped frame (batch table or a streaming micro-batch).
    The pair fan-out is a codegen ``transform(sequence(...))`` + explode
    — no Python, no shuffle."""
    toks = F.split(F.lower(F.col("text")), " ")
    d2 = (
        docs.filter(F.length("text") > 0)
        .select("doc_id", "source", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
    )
    return d2.select("doc_id", "source", F.explode(pairs).alias("pr")).select(
        "doc_id",
        "source",
        _bucket_col(F.col("pr.w1")).alias("b1"),
        _bucket_col(F.col("pr.w2")).alias("b2"),
    )


_LM_MODEL: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def shared_lm_model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The trained bigram LM, built once per (session, sf_dir): the
    ≤B²-row (b1, b2, c12, nll_x1e6) conditional table plus the ≤B-row
    left-context totals frame — train-once / broadcast-everywhere, the
    same lifecycle as the quality model and the IVF/PQ artifacts."""
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> tuple[DataFrame, DataFrame]:
        from pyspark import StorageLevel

        bg = doc_bigram_buckets(load_tables(spark, sf_dir)["documents"])
        c12 = bg.groupBy("b1", "b2").agg(F.count(F.lit(1)).alias("c12"))
        c1 = c12.groupBy("b1").agg(F.sum("c12").alias("c1")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        model = (
            c12.join(F.broadcast(c1), "b1")
            .select(
                "b1",
                "b2",
                "c12",
                F.expr(_nll_expr("c1", "c12")).alias("nll_x1e6"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        return model, c1

    key = (spark.sparkContext.applicationId, sf_dir)
    return session_artifact(_LM_MODEL, key, build)


def score_perplexity(
    bg: DataFrame, model: DataFrame, c1: DataFrame
) -> DataFrame:
    """(doc_id, source, n_bigrams, nll_sum_x1e6, avg_nll_x1e6) for a
    bigram-bucket frame against a trained LM — broadcast-join the
    conditional table, back off unseen bigrams through the left-context
    totals, ONE integer grouped sum per doc. The average divides two
    exactly-representable integers and floors, so both engines agree
    bit-for-bit."""
    nll = F.coalesce(F.col("nll_x1e6"), F.expr(_backoff_expr("c1")))
    per = (
        bg.join(F.broadcast(model.select("b1", "b2", "nll_x1e6")), ["b1", "b2"], "left")
        .join(F.broadcast(c1), "b1", "left")
        .select("doc_id", "source", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.min("source").alias("source"),
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll").alias("nll_sum_x1e6"),
        )
    )
    avg = F.floor(
        F.col("nll_sum_x1e6").cast("double") / F.col("n_bigrams")
    ).cast("long")
    return per.select(
        "doc_id", "source", "n_bigrams", "nll_sum_x1e6", avg.alias("avg_nll_x1e6")
    )


def score_all_documents(
    docs: DataFrame, model: DataFrame, c1: DataFrame
) -> DataFrame:
    """Admission-gate scoring with TOTAL coverage: scoreable documents
    (≥2 tokens) go through :func:`score_perplexity`; degenerate ones
    (empty text or a single token — no bigram evidence exists) still
    get a row, with ``n_bigrams = 0``, zero sum and NULL average, so
    the gate can route them by explicit policy instead of silently
    passing them unscored. The batch queries keep the scoreable-only
    frame (their oracles mirror the ≥2-token filter); the STREAMING
    gate must use this one."""
    scored = score_perplexity(doc_bigram_buckets(docs), model, c1)
    toks = F.split(F.lower(F.col("text")), " ")
    degenerate = (
        docs.select("doc_id", "source", toks.alias("toks"))
        .filter(F.size("toks") < 2)
        .select(
            "doc_id",
            "source",
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(0).cast("long").alias("nll_sum_x1e6"),
            F.lit(None).cast("long").alias("avg_nll_x1e6"),
        )
    )
    return scored.unionByName(degenerate)


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    model, c1 = shared_lm_model(spark, sf_dir)
    bg = doc_bigram_buckets(load_tables(spark, sf_dir)["documents"])
    return score_perplexity(bg, model, c1)


def _band_col():
    # built lazily: Column construction needs an active session
    return (
        F.when(F.col("avg_nll_x1e6") < PPL_HEAD_X1E6, F.lit("head"))
        .when(F.col("avg_nll_x1e6") < PPL_TAIL_X1E6, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )

_BAND_SQL = f"""CASE WHEN avg_nll_x1e6 < {PPL_HEAD_X1E6} THEN 'head'
         WHEN avg_nll_x1e6 < {PPL_TAIL_X1E6} THEN 'middle'
         ELSE 'tail' END"""


@query(
    "doc_lm_bigram_model",
    oracle=f"""
    WITH {_BG_SQL},
    {_MODEL_SQL}
    SELECT b1, b2, c12, nll_x1e6 FROM model ORDER BY b1, b2
    """,
    tags=("text", "quality", "perplexity", "training", "pipeline"),
)
def doc_lm_bigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained bigram LM itself: per (left, right) hashed-bucket
    pair, the bigram count and the fixed-point smoothed NLL — training
    verified end-to-end (counts are pure integers; the NLL is the one
    shared fixed-point expression).

    Scale: one shuffle over a ≤B² key space with map-side combine; the
    left-context totals derive from the counts, never a second corpus
    scan.
    """
    model, _ = shared_lm_model(spark, sf_dir)
    return model.select("b1", "b2", "c12", "nll_x1e6")


@query(
    "doc_lm_perplexity",
    oracle=f"""
    WITH {_BG_SQL},
    {_MODEL_SQL},
    {_SCORE_SQL}
    SELECT doc_id, source, n_bigrams, nll_sum_x1e6, avg_nll_x1e6
    FROM scored ORDER BY doc_id
    """,
    tags=("text", "quality", "perplexity", "pipeline"),
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM score: bigram count, total fixed-point NLL, and
    average NLL per bigram (the perplexity exponent, in x1e6 nats) —
    CCNet's ranking statistic, hash-exact because every step after the
    per-model-row ``ln`` is integer arithmetic.

    Scale: broadcast model join + one map-side-combined integer sum
    keyed by doc_id.
    """
    return _scored(spark, sf_dir)


@query(
    "corpus_perplexity_bands",
    oracle=f"""
    WITH {_BG_SQL},
    {_MODEL_SQL},
    {_SCORE_SQL}
    SELECT source, {_BAND_SQL} AS band,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(min(avg_nll_x1e6) AS BIGINT) AS min_avg_nll_x1e6,
           CAST(max(avg_nll_x1e6) AS BIGINT) AS max_avg_nll_x1e6
    FROM scored
    GROUP BY source, band
    ORDER BY source, band
    """,
    tags=("text", "quality", "perplexity", "filter", "pipeline"),
)
def corpus_perplexity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail banding rolled up per source: how many
    documents each source contributes to each perplexity band, with the
    band's observed NLL range — the report a corpus curator reads
    before deciding sampling rates (tail = candidates to drop).

    Scale: the banding is a projection over the scored frame; the
    rollup key space is |sources| × 3.
    """
    return (
        _scored(spark, sf_dir)
        .select("source", _band_col().alias("band"), "avg_nll_x1e6")
        .groupBy("source", "band")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.min("avg_nll_x1e6").alias("min_avg_nll_x1e6"),
            F.max("avg_nll_x1e6").alias("max_avg_nll_x1e6"),
        )
    )
