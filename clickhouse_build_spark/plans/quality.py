"""Trained quality classifier over ``documents`` — the model-based
filtering stage of a pretraining pipeline (CCNet / fastText-style).

Every production corpus runs a *trained* quality scorer between the
cheap heuristics (``doc_quality_scores``) and sampling: label a seed
set, train a token-likelihood model, score everything, keep what the
model admits. This module distills the repo's existing heuristic rules
into a multinomial Naive Bayes over hashed token buckets — the
fastText hashing-trick layout — entirely with built-in Spark SQL:

- **Labeling** is weak supervision from the ``doc_quality_scores``
  basis (length band, stopword ratio, symbol ratio), written as pure
  INTEGER cross-multiplications (``stop_hits*100 >= 3*n_tokens``) so
  both engines agree bit-for-bit with no FP in the label.
- **Training** is ONE grouped aggregation: explode tokens, hash each
  into one of ``QC_BUCKETS`` buckets with the portable md5 family
  (``operators/dedup.py:portable_hash``), count per (bucket, label).
  The bucket space bounds the model at any corpus size — the hashing
  trick is exactly what makes "collect the model" legal at 100 TB.
- **The model broadcasts**: ≤``QC_BUCKETS`` rows of integer counts
  plus a fixed-point log-likelihood-ratio column. Scoring is a map:
  explode, broadcast-join the model, one integer grouped SUM per doc.
- **Fixed-point log-likelihoods** keep the oracle exact: counts are
  integers on both engines; each llr is integerized per bucket
  (``floor(x*1e6+0.5)``) with the ln/± combination written as ONE
  shared expression string evaluated left-associated by both engines,
  so the only cross-engine surface is ``ln`` of exactly-representable
  integer-valued doubles (both engines ≤1 ulp; a flip would need the
  true value within ~1e-8 of a .5 boundary in x1e6 units — checked by
  the oracle gate at every SF). The per-doc score is then a pure
  INTEGER sum of llr values — addition-order-free by construction.

Reference parity note: the reference (an LLM-migration CLI) has no
analogue; this family is part of the driver-mandated LLM-data-pipeline
surface ("quality scoring" — SURVEY.md §2 text-analysis extension),
extended from heuristic to trained per VERDICT r06 "Next round" #1.

Scale (100 TB): training is a single shuffle whose key space is
``QC_BUCKETS × 2`` with map-side combine — partial counts, not tokens,
cross the wire. The model is O(buckets) regardless of corpus size and
broadcasts. Scoring adds exactly one more shuffle (the per-doc integer
sum, map-side combined). Nothing driver-side ever exceeds the bucket
count; no ``collect`` anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.registry import query

# Hashed-vocabulary size (the fastText hashing trick, scaled to the
# synthetic corpus's ~60-word vocabulary; production would use 2^20+).
QC_BUCKETS = 64
# Seed-label thresholds, from the doc_quality_scores basis: admit the
# 20..1000-token band with stopword ratio >= 3% and symbol ratio <= 10%.
QC_STOP = ("the", "a", "of", "and", "to")
QC_STOP_BP = 3  # stop_hits/n_tokens >= QC_STOP_BP/100
QC_SYM_BP = 1  # sym_chars/n_chars <= QC_SYM_BP/10
QC_LEN_LO, QC_LEN_HI = 20, 1000
QC_HASH_SEED = "qcls"
QC_SCALE = 1_000_000


def _bucket_col(w):
    from clickhouse_build_spark.operators.dedup import portable_hash

    return F.pmod(portable_hash(w, QC_HASH_SEED), QC_BUCKETS)


def _bucket_sql(expr: str) -> str:
    from clickhouse_build_spark.operators.dedup import portable_hash_sql

    # the md5-derived hash is non-negative, so % == pmod
    return f"({portable_hash_sql(expr, QC_HASH_SEED)} % {QC_BUCKETS})"


def _llr_expr(cg: str, tg: str, cb: str, tb: str) -> str:
    """Laplace-smoothed log-likelihood ratio of one bucket, integerized
    to x1e6 fixed point. ONE string evaluated by both engines: the ±
    chain is left-associated identically, so given bit-equal ``ln``
    results the arithmetic is bit-equal (IEEE doubles, program order).
    """
    return (
        f"CAST(floor((ln(CAST({cg} + 1 AS DOUBLE))"
        f" - ln(CAST({tg} + {QC_BUCKETS} AS DOUBLE))"
        f" - ln(CAST({cb} + 1 AS DOUBLE))"
        f" + ln(CAST({tb} + {QC_BUCKETS} AS DOUBLE)))"
        f" * {QC_SCALE}.0 + 0.5) AS BIGINT)"
    )


def _prior_expr(ng: str, nb: str) -> str:
    """Add-one-smoothed class-prior log ratio, x1e6 fixed point."""
    return (
        f"CAST(floor((ln(CAST({ng} + 1 AS DOUBLE))"
        f" - ln(CAST({nb} + 1 AS DOUBLE)))"
        f" * {QC_SCALE}.0 + 0.5) AS BIGINT)"
    )


# Shared CTE prefix for every oracle in the family: integer-labeled
# docs with their lowercased token arrays.
_LAB_SQL = f"""
  lab AS (
    SELECT doc_id, source,
           string_split(lower(text), ' ') AS toks,
           CASE WHEN len(string_split(text, ' '))
                     BETWEEN {QC_LEN_LO} AND {QC_LEN_HI}
                 AND len(list_filter(string_split(lower(text), ' '),
                         w -> w IN ({', '.join(f"'{w}'" for w in QC_STOP)})))
                     * 100 >= {QC_STOP_BP} * len(string_split(text, ' '))
                 AND length(regexp_replace(text, '[a-zA-Z ]', '', 'g'))
                     * 10 <= {QC_SYM_BP} * length(text)
            THEN 1 ELSE 0 END AS label_good
    FROM documents
    WHERE length(text) > 0
  )"""

_MODEL_SQL = f"""
  tok AS (
    SELECT doc_id, label_good, {_bucket_sql('w')} AS bucket
    FROM lab, UNNEST(toks) AS u(w)
  ),
  counts AS (
    SELECT bucket,
           CAST(SUM(CASE WHEN label_good = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cg,
           CAST(SUM(CASE WHEN label_good = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb
    FROM tok GROUP BY bucket
  ),
  tot AS (
    SELECT CAST(SUM(cg) AS BIGINT) AS tg, CAST(SUM(cb) AS BIGINT) AS tb
    FROM counts
  ),
  model AS (
    SELECT bucket, cg, cb,
           {_llr_expr('cg', 'tg', 'cb', 'tb')} AS llr_x1e6
    FROM counts, tot
  ),
  pri AS (
    SELECT {_prior_expr('SUM(label_good)',
                        'COUNT(*) - SUM(label_good)')} AS prior_x1e6
    FROM lab
  )"""

# LEFT join + COALESCE(llr, 0) (ADVICE r07): a token hashing to a
# bucket absent from the trained model contributes a neutral 0 instead
# of silently dropping — and a doc whose EVERY token is unseen still
# gets a verdict (score = prior). Batch-side this is behavior-identical
# (the same corpus trains and scores, so every bucket exists); the
# streaming admission gate is where genuinely novel docs arrive.
_SCORE_SQL = """
  scored AS (
    SELECT t.doc_id,
           MIN(t.label_good) AS label_good,
           CAST(MIN(pri.prior_x1e6)
                + SUM(COALESCE(m.llr_x1e6, 0)) AS BIGINT) AS score_x1e6
    FROM tok t
    LEFT JOIN model m USING (bucket)
    CROSS JOIN pri
    GROUP BY t.doc_id
  )"""


def label_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, source, toks, label_good) for any documents-shaped
    frame (batch table or one streaming micro-batch) — the all-integer
    weak label shared by training, batch scoring, and the streaming
    admission gate (``streaming/quality.py``)."""
    docs = docs.filter(F.length("text") > 0)
    words = F.split(F.col("text"), " ")
    lower_words = F.split(F.lower(F.col("text")), " ")
    stop = F.array(*[F.lit(w) for w in QC_STOP])
    stop_hits = F.size(F.filter(lower_words, lambda w: F.array_contains(stop, w)))
    sym_chars = F.length(F.regexp_replace("text", "[a-zA-Z ]", ""))
    label = (
        F.when(
            F.size(words).between(QC_LEN_LO, QC_LEN_HI)
            & (stop_hits * 100 >= QC_STOP_BP * F.size(words))
            & (sym_chars * 10 <= QC_SYM_BP * F.length("text")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("label_good")
    )
    return docs.select("doc_id", "source", lower_words.alias("toks"), label)


def _labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_documents(load_tables(spark, sf_dir)["documents"])


_QC_MODEL: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def shared_quality_model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The trained model, built once per (session, sf_dir): the
    ≤QC_BUCKETS-row (bucket, cg, cb, llr_x1e6) frame plus the 1-row
    prior frame — the production train-once / broadcast-everywhere
    lifecycle (same discipline as the IVF/PQ artifacts)."""
    from clickhouse_build_spark.plans.artifacts import session_artifact

    def build() -> tuple[DataFrame, DataFrame]:
        from pyspark import StorageLevel

        lab = _labeled(spark, sf_dir)
        tok = lab.select("label_good", F.explode("toks").alias("w"))
        counts = tok.groupBy(_bucket_col(F.col("w")).alias("bucket")).agg(
            F.sum(F.when(F.col("label_good") == 1, 1).otherwise(0)).alias("cg"),
            F.sum(F.when(F.col("label_good") == 0, 1).otherwise(0)).alias("cb"),
        )
        totals = counts.agg(
            F.sum("cg").alias("tg"), F.sum("cb").alias("tb")
        )
        model = (
            counts.crossJoin(F.broadcast(totals))
            .select(
                "bucket",
                "cg",
                "cb",
                F.expr(_llr_expr("cg", "tg", "cb", "tb")).alias("llr_x1e6"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        priors = (
            lab.agg(
                F.sum("label_good").alias("ng"),
                (F.count(F.lit(1)) - F.sum("label_good")).alias("nb"),
            )
            .select(F.expr(_prior_expr("ng", "nb")).alias("prior_x1e6"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        return model, priors

    key = (spark.sparkContext.applicationId, sf_dir)
    return session_artifact(_QC_MODEL, key, build)


def score_documents(
    lab: DataFrame, model: DataFrame, priors: DataFrame
) -> DataFrame:
    """(doc_id, source, label_good, score_x1e6, pred_good) for a
    labeled frame against a trained model + prior frame — explode,
    broadcast-join the model, ONE integer grouped sum per doc. Shared
    by the batch queries and the streaming admission gate (which scores
    each micro-batch against the model AT REST)."""
    tok = lab.select(
        "doc_id", "source", "label_good", F.explode("toks").alias("w")
    ).select(
        "doc_id", "source", "label_good", _bucket_col(F.col("w")).alias("bucket")
    )
    # LEFT join + coalesce-0 (ADVICE r07): unseen buckets score neutral
    # and fully-unseen docs still get a verdict — mirrored in _SCORE_SQL.
    sc = (
        tok.join(F.broadcast(model.select("bucket", "llr_x1e6")), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.min("source").alias("source"),
            F.min("label_good").alias("label_good"),
            F.sum(F.coalesce("llr_x1e6", F.lit(0))).alias("tok_score"),
        )
        .crossJoin(F.broadcast(priors))
    )
    total = (F.col("prior_x1e6") + F.col("tok_score")).cast("long")
    return sc.select(
        "doc_id",
        "source",
        "label_good",
        total.alias("score_x1e6"),
        F.when(total > 0, F.lit(1)).otherwise(F.lit(0)).alias("pred_good"),
    )


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    model, priors = shared_quality_model(spark, sf_dir)
    return score_documents(_labeled(spark, sf_dir), model, priors)


@query(
    "doc_quality_classifier_model",
    oracle=f"""
    WITH {_LAB_SQL},
    {_MODEL_SQL}
    SELECT bucket, cg, cb, llr_x1e6 FROM model ORDER BY bucket
    """,
    tags=("text", "quality", "classifier", "training", "pipeline"),
)
def doc_quality_classifier_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained Naive Bayes model itself: per hashed token bucket,
    the good/bad token counts and the fixed-point smoothed
    log-likelihood ratio — training verified end-to-end (the counts are
    pure integers; the llr is the one shared fixed-point expression).

    Scale: one shuffle with a ``QC_BUCKETS × 2``-bounded key space and
    map-side combine; the totals frame is 1 row, broadcast back.
    """
    model, _ = shared_quality_model(spark, sf_dir)
    return model.orderBy("bucket")


@query(
    "doc_quality_classifier",
    oracle=f"""
    WITH {_LAB_SQL},
    {_MODEL_SQL},
    {_SCORE_SQL}
    SELECT doc_id, label_good, score_x1e6,
           CASE WHEN score_x1e6 > 0 THEN 1 ELSE 0 END AS pred_good
    FROM scored ORDER BY doc_id
    """,
    tags=("text", "quality", "classifier", "scoring", "pipeline"),
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the trained quality model: fixed-point
    Naive Bayes log-odds (prior + Σ per-token llr) and the admit
    verdict, next to the weak label the model was distilled from.

    The score is an INTEGER sum of broadcast-model values, so the
    grouped aggregation is addition-order-free — the recipe that keeps
    a trained-model scoring pass hash-exact against the SQL oracle.

    Scale: scan → explode → broadcast join (model ≤ QC_BUCKETS rows) →
    one map-side-combined integer sum keyed by doc_id. No collect; the
    model artifact is session-cached like the IVF/PQ index.
    """
    return (
        _scored(spark, sf_dir)
        .select("doc_id", "label_good", "score_x1e6", "pred_good")
        .orderBy("doc_id")
    )


@query(
    "corpus_quality_filter",
    oracle=f"""
    WITH {_LAB_SQL},
    {_MODEL_SQL},
    {_SCORE_SQL}
    SELECT l.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN s.score_x1e6 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_admitted,
           CAST(SUM(CASE WHEN s.score_x1e6 > 0 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_rejected,
           CAST(SUM(CASE WHEN (s.score_x1e6 > 0) = (s.label_good = 1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
    FROM scored s JOIN lab l USING (doc_id)
    GROUP BY l.source ORDER BY l.source
    """,
    tags=("text", "quality", "classifier", "filter", "pipeline"),
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter composition (``clean_corpus``-style): per source, how
    many documents the trained classifier admits vs rejects, and its
    agreement with the heuristic seed labels — the per-shard admission
    report a corpus-curation run emits before mixing.

    Scale: the scored frame's one extra grouped count over ``source``
    (low-cardinality key, map-side combined).
    """
    sc = _scored(spark, sf_dir)
    return (
        sc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pred_good").cast("long").alias("n_admitted"),
            (F.count(F.lit(1)) - F.sum("pred_good"))
            .cast("long")
            .alias("n_rejected"),
            F.sum(
                F.when(F.col("pred_good") == F.col("label_good"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_agree"),
        )
        .orderBy("source")
    )


# ---------------------------------------------- end-to-end curation
#
# The composition a production pretraining run actually executes: every
# gate this repo implements, chained into one manifest. Each component
# is individually hash-verified; the composition reuses their exact
# SQL fragments, so the full pipeline is ALSO hash-exact end to end.


def _curation_oracle() -> str:
    from clickhouse_build_spark.plans.dedup import _keepers_oracle
    from clickhouse_build_spark.plans.registry import REGISTRY
    from clickhouse_build_spark.plans.textops import (
        CONTAM_BENCH_MOD,
        SPLIT_TRAIN_PCT,
    )

    contam = REGISTRY["doc_contamination_screen"].oracle
    split_b = (
        "('0x' || substr(md5('split:' || CAST(s.doc_id AS VARCHAR)), 1, 8))"
        "::BIGINT % 100"
    )
    return f"""
    WITH {_LAB_SQL},
    {_MODEL_SQL},
    {_SCORE_SQL}
    SELECT s.doc_id,
           CASE WHEN {split_b} < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN {split_b} = {SPLIT_TRAIN_PCT} THEN 'val'
                ELSE 'test' END AS split,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM scored s
    JOIN documents d ON d.doc_id = s.doc_id
    JOIN ({_keepers_oracle()}) k
      ON k.doc_id = s.doc_id AND k.keeper = s.doc_id
    WHERE s.score_x1e6 > 0
      AND s.doc_id % {CONTAM_BENCH_MOD} <> 0
      AND s.doc_id NOT IN (SELECT doc_id FROM ({contam}) c)
    ORDER BY s.doc_id
    """


@query(
    "curated_training_corpus",
    oracle=_curation_oracle(),
    tags=("text", "pipeline", "curation", "dedup", "quality",
          "contamination", "composition"),
)
def curated_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation manifest — the single query a corpus run
    ships to the trainer: a document survives iff it (a) is its fuzzy-
    dedup cluster's keeper (MinHash+LSH + connected components, which
    subsumes exact dedup: identical texts share signatures), (b) is
    ADMITTED by the trained quality classifier (fixed-point NB score >
    0), (c) is not in the held-out benchmark slice, and (d) shares no
    word-5-gram with it (decontamination); survivors get their
    deterministic 98/1/1 split and token count. Every gate reuses the
    component queries' code AND oracle fragments, so the whole pipeline
    is hash-exact against DuckDB.

    Scale: the scored frame and the keeper artifact are both
    session-shared (built once by the ``build_*`` entries); the
    contamination flag list and the survivor joins are id-keyed hash
    joins; nothing here adds a shuffle beyond the component gates
    themselves.
    """
    from clickhouse_build_spark.plans.dedup import shared_dedup_keepers
    from clickhouse_build_spark.plans.textops import (
        CONTAM_BENCH_MOD,
        SPLIT_TRAIN_PCT,
        doc_contamination_screen,
    )
    from clickhouse_build_spark.operators.dedup import portable_hash

    sc = _scored(spark, sf_dir)
    keepers = shared_dedup_keepers(spark, sf_dir)
    contam = doc_contamination_screen(spark, sf_dir).select("doc_id")
    docs = load_tables(spark, sf_dir)["documents"]
    b = F.pmod(portable_hash(F.col("doc_id").cast("string"), "split"), 100)
    split = (
        F.when(b < SPLIT_TRAIN_PCT, "train")
        .when(b == SPLIT_TRAIN_PCT, "val")
        .otherwise("test")
    )
    return (
        sc.filter(F.col("score_x1e6") > 0)
        .join(keepers, "doc_id")
        .filter(F.col("keeper") == F.col("doc_id"))
        .filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
        .join(contam, "doc_id", "left_anti")
        .join(
            docs.select(
                "doc_id",
                F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            ),
            "doc_id",
        )
        .select("doc_id", split.alias("split"), "n_tokens")
        .orderBy("doc_id")
    )
