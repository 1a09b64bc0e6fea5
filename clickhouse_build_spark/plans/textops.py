"""Text-analysis queries over ``documents`` (driver-mandated extension
surface: token counting, quality scoring, language-ID heuristic, document
fingerprinting, exact + n-gram-Jaccard dedup).

These are the training-data-pipeline operators a 100 TB corpus needs.
Everything here is built-in Spark SQL expressions (split / higher-order
lambdas / md5) — no Python in the hot path; the MinHash/SimHash scale
variants live in ``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.registry import query

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately small so the same literal list embeds in the oracle SQL.
_STOP = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _hits(words_col, lang: str):
    """Count stopword occurrences (with duplicates) via a higher-order
    filter — stays in codegen, no UDF."""
    stop = F.array(*[F.lit(w) for w in _STOP[lang]])
    return F.size(F.filter(words_col, lambda w: F.array_contains(stop, w)))


@query(
    "doc_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_measured,
           CAST(floor(CAST(length(replace(text, ' ', '')) AS DOUBLE) * 100
                      / len(string_split(text, ' ')) + 0.5) AS BIGINT) AS avg_token_len_x100,
           md5(text) AS fingerprint
    FROM documents
    """,
    tags=("text", "tokenize", "fingerprint"),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + document fingerprinting per doc.

    Whitespace tokenizer (the corpus is space-separated); fingerprint is
    md5 of the exact text — the exact-dedup key at scale (hash once,
    group on the 32-byte digest instead of the full text).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    words = F.split(F.col("text"), " ")
    # avg token length is reported ×100 as an integer via floor(x+0.5):
    # identical IEEE division + floor on both engines — immune to the
    # decimal-rounding tie divergence that round(x, 2) has on .xx5 values.
    avg_len_x100 = F.floor(
        F.length(F.regexp_replace("text", " ", "")).cast("double")
        * 100
        / F.size(words)
        + 0.5
    ).cast("long")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        avg_len_x100.alias("avg_token_len_x100"),
        F.md5("text").alias("fingerprint"),
    )


@query(
    "doc_quality_scores",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           round(CAST(len(list_filter(string_split(lower(text), ' '),
                                      w -> w IN ('the', 'a', 'of', 'and', 'to')))
                      AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio,
           round(CAST(length(regexp_replace(text, '[a-zA-Z ]', '', 'g')) AS DOUBLE)
                 / length(text), 4) AS symbol_ratio,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000
                THEN 1 ELSE 0 END AS length_ok
    FROM documents
    WHERE length(text) > 0
    """,
    tags=("text", "quality"),
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length band, stopword ratio, non-letter symbol
    ratio — the standard cheap pre-filters for a training corpus
    (C4/Gopher-style rules), all as codegen expressions."""
    docs = load_tables(spark, sf_dir)["documents"].filter(F.length("text") > 0)
    words = F.split(F.col("text"), " ")
    lower_words = F.split(F.lower(F.col("text")), " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.round(_hits(lower_words, "en").cast("double") / F.size(words), 4).alias(
            "stopword_ratio"
        ),
        F.round(
            F.length(F.regexp_replace("text", "[a-zA-Z ]", "")).cast("double")
            / F.length("text"),
            4,
        ).alias("symbol_ratio"),
        F.when(F.size(words).between(20, 1000), F.lit(1)).otherwise(F.lit(0)).alias(
            "length_ok"
        ),
    )


@query(
    "doc_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(lower(text), ' '),
                             w -> w IN ({_sql_list(_STOP['en'])}))) AS en_hits,
             len(list_filter(string_split(lower(text), ' '),
                             w -> w IN ({_sql_list(_STOP['de'])}))) AS de_hits,
             len(list_filter(string_split(lower(text), ' '),
                             w -> w IN ({_sql_list(_STOP['fr'])}))) AS fr_hits,
             len(list_filter(string_split(lower(text), ' '),
                             w -> w IN ({_sql_list(_STOP['es'])}))) AS es_hits
      FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits
                  AND en_hits > 0 THEN 'en'
             WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
             WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
             WHEN es_hits > 0 THEN 'es'
             ELSE 'unknown'
           END AS pred_lang
    FROM scored
    """,
    tags=("text", "lang-id"),
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword hit counts
    with a deterministic tie order (en > de > fr > es > unknown)."""
    docs = load_tables(spark, sf_dir)["documents"]
    words = F.split(F.lower(F.col("text")), " ")
    scored = docs.select(
        "doc_id",
        "lang",
        _hits(words, "en").alias("en_hits"),
        _hits(words, "de").alias("de_hits"),
        _hits(words, "fr").alias("fr_hits"),
        _hits(words, "es").alias("es_hits"),
    )
    en, de, fr, es = (F.col(c) for c in ("en_hits", "de_hits", "fr_hits", "es_hits"))
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    return scored.select("doc_id", "lang", pred.alias("pred_lang"))


@query(
    "doc_exact_dedup",
    oracle="""
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("text", "dedup", "exact"),
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: hash-groupBy on the content fingerprint,
    keep the lowest doc_id per group (deterministic keeper policy).

    Scale: grouping on the 16-byte md5 instead of the document body means
    the shuffle carries digests, not 100 TB of text.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
    )


# Stop-shingle document-frequency cap for the exact Jaccard verifier
# (VERDICT r09 #6, mirroring hot_bucket_filter's rationale): a
# boilerplate shingle shared by 10^5 documents contributes 10^10
# streamed pairs and near-zero near-dup signal. Shingles with df above
# the cap are dropped from the UNIVERSE (both the intersection and the
# per-doc counts), so Jaccard is computed consistently over the capped
# shingle space — and the DuckDB oracle applies the identical cap, so
# the result stays hash-exact for every pair below it.
JACCARD_DF_CAP = 100

@query(
    "doc_near_dup_jaccard",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh0 AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - 1),
                                   i -> array_to_string(w[i:i+2], ' '))) AS shingle
      FROM docs
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               count(*) OVER (PARTITION BY shingle) AS df
        FROM sh0
      ) WHERE df <= {JACCARD_DF_CAP}
    ),
    cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           round(CAST(p.inter AS DOUBLE) / (ca.c + cb.c - p.inter), 4) AS jaccard
    FROM pairs p
    JOIN cnt ca ON p.doc_a = ca.doc_id
    JOIN cnt cb ON p.doc_b = cb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (ca.c + cb.c - p.inter) >= 0.1
    """,
    tags=("text", "dedup", "near-dup", "jaccard", "quadratic-output"),
)
def doc_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection via word-3-gram shingle Jaccard.

    Exact candidate generation: explode distinct shingles, self-join on
    the shingle, Jaccard = |∩| / (|A| + |B| − |∩|), threshold 0.1.

    Scale: this exact form is the verifier; at 100 TB the shingle
    self-join explodes on hot shingles, so the production path is
    MinHash+LSH banding (``operators/dedup.py``) which only pairs
    documents sharing an LSH band bucket. Kept here because it is the
    ground truth the probabilistic path is measured against.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    words = F.split(F.col("text"), " ")
    docs = docs.select("doc_id", words.alias("w")).filter(F.size("w") >= 3)
    sh = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i"),
        "w",
    ).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), 3)).alias("shingle"),
    )
    # One shuffle groups by shingle AND dedupes (doc_id, shingle) via
    # collect_set — replacing the old distinct + a/b self-join plan that
    # re-executed the shingle explode three times (once per branch) and
    # shuffled the shingle table twice more for the join. Persist so the
    # per-doc-count branch and the pair branch share one execution.
    # Stop-shingle cap (VERDICT r09 #6): a shingle's collect_set is its
    # document frequency — dropping df > JACCARD_DF_CAP rows removes
    # the one-array-per-hot-shingle blowup AND its quadratic pair mass
    # before any pair is generated. The oracle applies the same cap.
    grp = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") <= JACCARD_DF_CAP)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cnt = (
        grp.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
    )
    # Ordered pairs within a shingle's sorted id list: posexplode the
    # outer element, slice the tail for the inner — generates each
    # unordered pair exactly ONCE (half the rows of a double-explode +
    # a<b filter, measured 23.5 s vs 37.9 s at sf1 for this stage) and
    # streams through the generators into the map-side partial count,
    # never materializing the m² pair array for a hot shingle.
    pairs = (
        grp.filter(F.size("ids") >= 2)
        .select(F.array_sort("ids").alias("ids"))
        .select(F.posexplode("ids").alias("i", "doc_a"), "ids")
        .select(
            "doc_a",
            F.explode(F.expr("slice(ids, i + 2, size(ids))")).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    # cnt is one (doc_id, c) row per doc — broadcast it so the 100M+-row
    # pair table never re-shuffles for these enrichment joins (without
    # the hint the sort-merge join shuffles the pair table twice, ~18 s
    # of the sf1 wall). At corpus scales where the per-doc count table
    # itself outgrows broadcast, the production path is the MinHash+LSH
    # family (operators/dedup.py), not this exact verifier.
    ca = F.broadcast(
        cnt.select(F.col("doc_id").alias("doc_a"), F.col("c").alias("ca"))
    )
    cb = F.broadcast(
        cnt.select(F.col("doc_id").alias("doc_b"), F.col("c").alias("cb"))
    )
    jac = F.col("inter").cast("double") / (F.col("ca") + F.col("cb") - F.col("inter"))
    return (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= 0.1)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@query(
    "doc_top_tokens",
    oracle="""
    SELECT tok, count(*) AS freq
    FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    )
    WHERE tok <> ''
    GROUP BY 1
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
    tags=("text", "vocabulary", "top-k"),
)
def doc_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-20 tokens by frequency with a
    deterministic (freq desc, token asc) order.

    Scale: explode → map-side partial count → shuffle carries one row
    per distinct token per partition; top-k is TakeOrderedAndProject.
    The heavy-hitters sketch (count-min) is the alternative when even
    the distinct-token shuffle is too wide; exact is fine for
    vocabulary-sized domains.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(20)
    )


@query(
    "doc_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
      )
      WHERE tok <> ''
      GROUP BY 1, 2
    ),
    df AS (
      SELECT tok, count(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
      FROM tf JOIN df USING (tok), n
    )
    SELECT doc_id, tok, tfidf
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
      FROM scored
    )
    WHERE rn <= 3
    """,
    tags=("text", "tfidf", "window"),
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf =
    ln((N+1)/(df+1))) — the classic keyword extraction pass.

    Scale: tf is one grouped count on (doc, token); df reuses the tf
    frame (one extra token-keyed shuffle); idf is a broadcast join of a
    vocabulary-sized frame; the per-doc top-3 is a window over the
    doc-partitioned scores with deterministic tiebreaks.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.count()  # driver scalar: one number, not data
    scored = tf.join(F.broadcast(df_), "tok").select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf")
    )


@query(
    "clean_corpus",
    oracle=f"""
    WITH stats AS (
      SELECT doc_id, text, lang,
             len(string_split(text, ' ')) AS n_tokens,
             md5(text) AS fp
      FROM documents
      WHERE length(text) > 0
    ),
    keepers AS (
      SELECT fp, min(doc_id) AS keeper FROM stats GROUP BY 1
    )
    SELECT s.doc_id, s.lang, s.n_tokens
    FROM stats s JOIN keepers k ON s.fp = k.fp AND s.doc_id = k.keeper
    WHERE s.n_tokens BETWEEN 20 AND 1000
    """,
    tags=("text", "pipeline", "dedup", "quality"),
)
def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus cleaning pass as ONE plan:
    quality stats → length band filter → exact-dedup keeper policy
    (min doc_id per content fingerprint) — the composition every real
    pipeline runs before tokenization.

    Scale: one scan feeds everything; the dedup keeper is a
    fingerprint-keyed aggregate (16-byte digests on the shuffle, not
    text); the final semi-join is keeper-keyed. No Python anywhere.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(F.length("text") > 0)
    words = F.split(F.col("text"), " ")
    stats = docs.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_tokens"),
        F.md5("text").alias("fp"),
    )
    keepers = stats.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    return (
        stats.join(
            keepers,
            (stats["fp"] == keepers["fp"]) & (stats["doc_id"] == keepers["keeper"]),
        )
        .filter(F.col("n_tokens").between(20, 1000))
        .select("doc_id", "lang", "n_tokens")
    )


# PII patterns, portable core: plain character classes only — no
# lookarounds (RE2 lacks them) and no \p classes, so Java regex (Spark)
# and RE2 (DuckDB) match identically.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_URL = "https?://[^ ]+"
PII_LONGNUM = "[0-9]{7,}"  # phone-ish / account-ish digit runs


@query(
    "doc_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(text, '{PII_URL}')) AS n_urls,
           len(regexp_extract_all(text, '{PII_LONGNUM}')) AS n_longnums,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '{PII_EMAIL}', '<EMAIL>', 'g'),
                 '{PII_URL}', '<URL>', 'g'),
                 '{PII_LONGNUM}', '<NUM>', 'g')) AS clean_fp,
           length(text)
             - length(regexp_replace(regexp_replace(regexp_replace(text,
                 '{PII_EMAIL}', '', 'g'),
                 '{PII_URL}', '', 'g'),
                 '{PII_LONGNUM}', '', 'g')) AS n_chars_redacted
    FROM documents
    """,
    tags=("text", "pii", "scrub", "pipeline"),
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails, URLs, and 7+-digit runs replaced with
    typed placeholders — the mandatory scrub before a corpus ships to
    training. Reports per-doc match counts, the redacted-char count, and
    the md5 of the scrubbed text (the post-scrub dedup key).

    Patterns are the lookaround-free portable core so Spark (Java regex)
    and the oracle (RE2) agree byte-for-byte; the planted-PII unit test
    (tests/test_textops_pipeline.py) proves the redaction itself since
    the synthetic corpus contains no PII.

    Scale: pure map-only codegen (``regexp_replace`` ×3 per row), no
    shuffle, no Python.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"), PII_URL, "<URL>"
        ),
        PII_LONGNUM,
        "<NUM>",
    )
    stripped = F.regexp_replace(
        F.regexp_replace(F.regexp_replace("text", PII_EMAIL, ""), PII_URL, ""),
        PII_LONGNUM,
        "",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PII_URL), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all("text", F.lit(PII_LONGNUM), 0)).alias(
            "n_longnums"
        ),
        F.md5(scrubbed).alias("clean_fp"),
        (F.length("text") - F.length(stripped)).alias("n_chars_redacted"),
    )


@query(
    "doc_repetition_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    tok_stats AS (
      SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_toks
      FROM tf GROUP BY 1
    ),
    bg AS (
      SELECT doc_id,
             len(w) - 1 AS n_bigrams,
             len(list_distinct(list_transform(range(1, len(w)),
                               i -> array_to_string(w[i:i+1], ' '))))
               AS n_distinct_bigrams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= 2
    )
    SELECT t.doc_id,
           CAST(floor(CAST(t.top_c AS DOUBLE) * 10000 / t.n_toks + 0.5)
                AS BIGINT) AS top_token_ratio_x10k,
           CAST(floor((1.0 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams)
                      * 10000 + 0.5) AS BIGINT) AS dup_bigram_ratio_x10k
    FROM tok_stats t JOIN bg b ON t.doc_id = b.doc_id
    """,
    tags=("text", "quality", "repetition", "pipeline"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: dominance of the
    single most frequent token and the duplicate-bigram fraction — the
    standard filters for degenerate/templated text. Ratios are reported
    ×10000 as integers via the per-row floor(+0.5) trick (tie-immune
    across engines).

    Scale: one explode + two partial-aggregated groupBys for token
    dominance (shuffle carries (doc, token) counts, not text); the
    bigram arithmetic is per-row array math with no shuffle at all.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    words = F.split(F.col("text"), " ")
    base = docs.select("doc_id", words.alias("w")).filter(F.size("w") >= 2)
    tf = (
        base.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    tok_stats = tf.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_toks")
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("w") - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 2)),
    )
    bg = base.select(
        "doc_id",
        (F.size("w") - 1).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
    )
    return tok_stats.join(bg, "doc_id").select(
        "doc_id",
        F.floor(
            F.col("top_c").cast("double") * 10000 / F.col("n_toks") + 0.5
        )
        .cast("long")
        .alias("top_token_ratio_x10k"),
        F.floor(
            (1.0 - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams"))
            * 10000
            + 0.5
        )
        .cast("long")
        .alias("dup_bigram_ratio_x10k"),
    )


# Benchmark-contamination screen: the "benchmark" is a deterministic
# slice of the corpus (doc_id % 100 == 0) standing in for an eval set.
CONTAM_NGRAM = 5
CONTAM_BENCH_MOD = 100


@query(
    "doc_contamination_screen",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(w) - {CONTAM_NGRAM - 2}),
                    i -> array_to_string(w[i:i+{CONTAM_NGRAM - 1}], ' ')))
               AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= {CONTAM_NGRAM}
    ),
    bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0
    )
    SELECT s.doc_id, count(*) AS n_contaminated_shingles
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % {CONTAM_BENCH_MOD} <> 0
    GROUP BY 1
    """,
    tags=("text", "contamination", "pipeline"),
)
def doc_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: flag training documents sharing
    any word-{5}-gram with the benchmark set (here a deterministic
    doc_id % 100 slice standing in for an external eval suite) — the
    n-gram-overlap decontamination step every training corpus runs.

    Scale: the benchmark shingle set is eval-suite-sized (tiny next to
    the corpus) → broadcast hash join against it; corpus shingles
    stream through map-side, and only matches reach the per-doc count.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    words = F.split(F.col("text"), " ")
    base = docs.select("doc_id", words.alias("w")).filter(
        F.size("w") >= CONTAM_NGRAM
    )
    # Dedup WITHIN each doc via array_distinct BEFORE the explode — the
    # oracle's `SELECT DISTINCT doc_id, shingle` is per-doc dedup too,
    # but doing it as a .distinct() after explode would shuffle the
    # entire corpus shingle set; this way there is no shuffle at all on
    # the corpus side.
    sh = base.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - (CONTAM_NGRAM - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, CONTAM_NGRAM)),
                )
            )
        ).alias("shingle"),
    )
    bench = (
        sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
        .select("shingle")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_shingles"))
    )


# Data-mixing rates per language (share of each stratum kept), in
# basis points so the literal embeds exactly in both engines.
STRAT_RATES_BP = {"en": 5000, "zh": 7500}  # unlisted languages keep all
STRAT_SCALE = 10_000


def _strat_rate_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {bp}" for lang, bp in STRAT_RATES_BP.items()
    )
    return f"CASE {cases} ELSE {STRAT_SCALE} END"


@query(
    "doc_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          % {STRAT_SCALE} < {_strat_rate_sql()}
    """,
    tags=("text", "sampling", "mixing", "pipeline"),
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for data mixing: keep a
    per-language share of documents (en 50%, zh 75%, everything else
    100%) by thresholding a portable md5 hash of the doc id — the
    reproducible down-weighting step when composing a training mixture.
    Unlike ``DataFrame.sample``, membership is a pure function of the
    row, stable across partitioning, retries, and engines.

    Scale: map-only predicate, pushes to the scan, no shuffle.
    """
    from clickhouse_build_spark.operators.dedup import portable_hash

    docs = load_tables(spark, sf_dir)["documents"]
    rate = F.lit(STRAT_SCALE)
    for lang, bp in STRAT_RATES_BP.items():
        rate = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(rate)
    keep = (
        F.pmod(portable_hash(F.col("doc_id").cast("string"), "strat"), STRAT_SCALE)
        < rate
    )
    return docs.filter(keep).select("doc_id", "lang")


@query(
    "doc_token_histogram",
    oracle="""
    SELECT CAST((len(string_split(text, ' ')) // 10) * 10 AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1
    """,
    tags=("text", "histogram", "corpus-stats", "pipeline"),
)
def doc_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length histogram (10-token buckets): docs and total
    tokens per bucket — the budget/mixture-planning statistic run over
    every corpus before training.

    Scale: map-side bucket + partial count/sum; the shuffle carries one
    row per bucket per partition.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    n_tok = F.size(F.split(F.col("text"), " "))
    return docs.groupBy(
        (F.floor(n_tok / 10) * 10).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
    )


# Subword-ish tokenizer: letter runs | digit runs | single punctuation —
# the GPT-2-style pre-tokenization regex reduced to its portable core
# (no \p classes, so Spark's and DuckDB's regex engines agree exactly).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "doc_bpe_token_counts",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(list_distinct(regexp_extract_all(text, '{BPE_ISH_PATTERN}')))
             AS n_distinct_bpe
    FROM documents
    """,
    tags=("text", "tokenize", "bpe"),
)
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer (letter runs, digit
    runs, single punctuation — the portable core of the GPT-2 split
    regex) next to the whitespace count — the token-budget estimator a
    training pipeline runs per document. Pure codegen
    (``regexp_extract_all``), no Python tokenizer in the hot path."""
    docs = load_tables(spark, sf_dir)["documents"]
    toks = F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe"),
    )


# Deterministic train/val/test split: hash buckets 0-97 / 98 / 99.
SPLIT_TRAIN_PCT = 98


@query(
    "doc_split_counts",
    oracle=f"""
    SELECT CASE
             WHEN b < {SPLIT_TRAIN_PCT} THEN 'train'
             WHEN b = {SPLIT_TRAIN_PCT} THEN 'val'
             ELSE 'test'
           END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT lang, n_chars,
             ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS b
      FROM documents
    )
    GROUP BY 1, 2
    """,
    tags=("text", "split", "pipeline"),
)
def doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (98/1/1) by portable
    hash of the doc id, reported as per-split × per-language doc and
    character counts — the split manifest every training run records.
    Membership is a pure function of the row (stable across partitioning,
    retries, and engines), unlike ``randomSplit``.

    Scale: map-only hash + one partial-aggregated groupBy on a
    (3 × |langs|)-row result.
    """
    from clickhouse_build_spark.operators.dedup import portable_hash

    docs = load_tables(spark, sf_dir)["documents"]
    b = F.pmod(portable_hash(F.col("doc_id").cast("string"), "split"), 100)
    split = (
        F.when(b < SPLIT_TRAIN_PCT, "train")
        .when(b == SPLIT_TRAIN_PCT, "val")
        .otherwise("test")
    )
    return docs.groupBy(split.alias("split"), "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "doc_top_bigrams",
    oracle="""
    SELECT bg, count(*) AS freq
    FROM (
      SELECT unnest(list_transform(range(1, len(w)),
                    i -> array_to_string(w[i:i+1], ' '))) AS bg
      FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
      WHERE len(w) >= 2
    )
    GROUP BY 1
    ORDER BY freq DESC, bg
    LIMIT 20
    """,
    tags=("text", "ngram", "vocabulary", "top-k"),
)
def doc_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram head: top-20 word bigrams by frequency — the
    first n-gram LM statistic (and the seed list for phrase-level
    stopword/boilerplate filters). Deterministic (freq desc, bigram
    asc) order.

    Scale: per-row array math builds the bigrams (no shuffle), then the
    same partial-count → TakeOrderedAndProject shape as
    ``doc_top_tokens``; the shuffle carries distinct bigrams per
    partition, not positions.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    w = F.split(F.lower("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("w") - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 2)),
    )
    return (
        docs.select(w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bg"))
        .limit(20)
    )


# ------------------------------------------- chunking & sequence packing
#
# The two context-assembly stages of a training-data pipeline the
# earlier families don't cover: splitting long documents into
# fixed-token windows (with overlap) for embedding/pretraining, and
# packing documents into fixed-token-budget training sequences.

CHUNK_TOKENS = 64
CHUNK_STEP = 48  # 16-token overlap between consecutive windows
PACK_BUDGET = 2048


@query(
    "doc_chunk_text",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(s // {CHUNK_STEP} AS INTEGER) AS chunk_idx,
             CAST(s AS INTEGER) AS start_tok,
             toks[s + 1 : s + {CHUNK_TOKENS}] AS chunk
      FROM t, UNNEST(range(0, CAST(n AS BIGINT), {CHUNK_STEP})) AS u(s)
    )
    SELECT doc_id, chunk_idx, start_tok,
           CAST(len(chunk) AS INTEGER) AS n_toks,
           md5(array_to_string(chunk, ' ')) AS chunk_fp
    FROM c
    """,
    tags=("text", "chunking", "fan-out"),
)
def doc_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: each doc → overlapping
    64-token windows at a 48-token stride (the embedding/pretraining
    context-window cut), with per-chunk token count and content
    fingerprint (md5 of the reassembled window — the chunk-level dedup
    key).

    Scale: pure codegen fan-out — ``sequence`` builds the window starts
    per row, ``slice`` cuts each window out of the token array, and no
    shuffle happens at all until a consumer aggregates; the chunk text
    itself never materializes (only its fingerprint leaves the stage).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    w = F.split(F.col("text"), " ")
    t = docs.select("doc_id", w.alias("toks"), F.size(w).alias("n"))
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STEP))
    c = t.select(
        "doc_id",
        "toks",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    chunk = F.slice(F.col("toks"), F.col("start_tok") + 1, F.lit(CHUNK_TOKENS))
    return c.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.size(chunk).alias("n_toks"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    ).orderBy("doc_id", "chunk_idx")


def monotone_id_buckets(
    t: DataFrame, nbuckets: int, skew_factor: int = 4
) -> tuple:
    """A doc_id-MONOTONE bucket expression for the distributed prefix
    sum: any id-threshold bucketing yields the identical global cumsum
    (the thresholds only decide which task sums which contiguous id
    span), so balance is a pure efficiency knob, never a correctness
    one.

    Strategy: the zero-extra-pass id-range heuristic first, with the
    skew CHECK itself gated by arithmetic on the same min/max/count
    pass (ADVICE r06 — the per-bucket count probe used to run on every
    call): a bucket's row count is bounded by its id-span, span/nbuckets
    ≤ span ≤ skew_factor·n ⇒ max bucket ≤ skew_factor·mean, so a
    near-dense id space (span ≤ skew_factor·n) provably can't skew and
    skips the probe. Only a sparse/clustered id space pays the bounded
    per-bucket count (≤ nbuckets rows to the driver), and if the
    largest bucket exceeds ``skew_factor``× the mean the bounds are
    re-derived from DISTRIBUTED percentiles (``approxQuantile``, a
    Greenwald-Khanna sketch: one pass, bounded driver memory at any
    corpus size) and the bucket becomes a threshold CASE over the
    quantile cuts. An empty input gets a constant bucket (the prefix
    sum over zero rows is vacuous either way).

    Returns (bucket_column, used_percentiles) — the flag is for tests
    and PLANS notes, callers use the column either way."""
    n, lo, hi = t.agg(
        F.count(F.lit(1)), F.min("doc_id"), F.max("doc_id")
    ).first()
    if not n:
        return F.lit(0), False
    uniform = F.expr(f"(doc_id - {lo}) * {nbuckets} DIV ({hi} - {lo} + 1)")
    if hi - lo + 1 <= skew_factor * n:
        return uniform, False
    counts = [
        r["count"] for r in t.groupBy(uniform.alias("b")).count().collect()
    ]
    mean = sum(counts) / nbuckets
    if max(counts) <= skew_factor * mean:
        return uniform, False
    cuts = t.approxQuantile(
        "doc_id",
        [i / nbuckets for i in range(1, nbuckets)],
        1.0 / (4 * nbuckets),
    )
    bucket = F.lit(nbuckets - 1)
    expr = None
    for i, q in enumerate(cuts):
        clause = F.when(F.col("doc_id") <= F.lit(q), F.lit(i))
        expr = clause if expr is None else expr.when(
            F.col("doc_id") <= F.lit(q), F.lit(i)
        )
    return (expr.otherwise(bucket) if expr is not None else bucket), True


def pack_sequences(
    t: DataFrame, budget: int, nbuckets: int
) -> DataFrame:
    """Distributed sequence packing over (doc_id, n)-rows: global
    running token count via a two-phase prefix sum (per-bucket windows
    + a tiny bucket-offset frame), then bin = offset DIV budget and the
    per-bin manifest. See :func:`doc_pack_sequences` for the pipeline
    story; this is the reusable operator its query (and the skew tests)
    call."""
    bucket, _ = monotone_id_buckets(t, nbuckets)
    part = t.withColumn("bucket", bucket)
    bucket_sums = part.groupBy("bucket").agg(F.sum("n").alias("bsum"))
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bucket_sums.withColumn(
        "offset", F.coalesce(F.sum("bsum").over(w_off), F.lit(0))
    ).select("bucket", "offset")
    w_in = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = part.join(F.broadcast(offsets), "bucket").withColumn(
        "cum", F.col("offset") + F.sum("n").over(w_in)
    )
    return (
        cum.withColumn("bin_id", F.expr(f"(cum - n) DIV {budget}"))
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )



@query(
    "doc_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ),
    c AS (
      SELECT doc_id, n,
             sum(n) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT CAST((cum - n) // {PACK_BUDGET} AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM c
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("text", "packing", "prefix-sum", "distributed"),
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in doc_id order) to
    fixed-token-budget training sequences by their starting offset in
    the concatenated token stream (bin = offset DIV budget — the
    standard boundary-at-budget packing approximation), and emit the
    per-sequence manifest (doc count, token total, id span).

    Scale: the global running token count is a DISTRIBUTED two-phase
    prefix sum, not a single-reducer global window — docs are bucketed
    by a doc_id-monotone expression, each bucket cumsums independently
    under ``Window.partitionBy(bucket)``, and the tiny per-bucket
    totals frame (≤ one row per bucket) is the only thing that crosses
    a global window. A plain ``Window.orderBy(doc_id)`` would funnel
    the whole corpus through one task at 100 TB; this shape never moves
    more than one bucket to one task. Bucket bounds come from the
    id-range heuristic when ids are dense, and from distributed
    percentiles when the heuristic's bounded count-check detects skew
    (max bucket > 4× mean) — :func:`monotone_id_buckets`; the output is
    invariant to the choice, only task balance changes.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    nbuckets = spark.sparkContext.defaultParallelism
    t = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n")
    )
    return pack_sequences(t, PACK_BUDGET, nbuckets)


OOV_VOCAB_SIZE = 1000


@query(
    "doc_oov_rate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS c FROM toks GROUP BY 1
      ) QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= {OOV_VOCAB_SIZE}
    ),
    base AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    oov AS (
      SELECT doc_id, count(*) AS n_oov
      FROM toks WHERE tok NOT IN (SELECT tok FROM vocab)
      GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(COALESCE(n_oov, 0) AS BIGINT) AS n_oov,
           CAST(COALESCE(n_oov, 0) * 10000 // n_tokens AS BIGINT) AS oov_x10k
    FROM base b LEFT JOIN oov ON b.doc_id = oov.doc_id
    """,
    tags=("text", "quality", "vocabulary", "oov"),
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-1000 token vocabulary — the cheap LM-free proxy for perplexity
    filtering (high OOV ≈ boilerplate/garbage/wrong-language), in exact
    integer basis points so both engines agree bit-for-bit.

    Scale: the vocabulary is a distributed top-k
    (TakeOrderedAndProject over the token-count aggregate — never a
    global row_number sort over the full vocab), then broadcast; the
    per-doc OOV count is one anti-join + count on the already-exploded
    token frame. Two shuffles total (token counts, per-doc counts),
    both map-side combined.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(OOV_VOCAB_SIZE)
        .select("tok")
    )
    oov = (
        toks.join(F.broadcast(vocab), "tok", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_oov"))
    )
    base = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return base.join(oov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.expr("coalesce(n_oov, 0) * 10000 DIV n_tokens").alias("oov_x10k"),
    )


# ------------------------------------- temperature resampling (r10)

# Domain-balance temperature sampling — the standard multilingual /
# multi-domain mixing step (e.g. the T=0.5..0.7 smoothing of mBERT /
# XLM-R / mT5 pretraining mixes): domain weights w_d ∝ n_d^ALPHA pull
# probability mass from head domains toward the tail. ALPHA=0.5 =
# square-root smoothing. Everything is integer-exact: sqrt is
# IEEE-correctly-rounded on both engines and sits behind the x1e6
# floor; quotas and selection are pure integer arithmetic.
TEMP_ALPHA_SQRT_SCALE = 1_000_000
TEMP_SAMPLE_RATE_DIV = 5  # target K = max(1, N/5), the DSIR rate
TEMP_HASH_SEED = "temp-sample"
# 32-bit member hash DIV 2^20 → 4096 histogram buckets; only the one
# boundary bucket per language is ranked exactly (see docstring)
TEMP_BUCKET_SHIFT = 20


@query(
    "doc_temperature_sample",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    weighted AS (
      SELECT lang, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE))
                  * {TEMP_ALPHA_SQRT_SCALE} + 0.5) AS BIGINT) AS w_x1e6
      FROM counts
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
             CAST(sum(w_x1e6) AS BIGINT) AS w_total
      FROM weighted
    ),
    quotas AS (
      SELECT lang, n_docs, w_x1e6,
             CAST((GREATEST(1, n_total // {TEMP_SAMPLE_RATE_DIV}) * w_x1e6)
                  // w_total AS BIGINT) AS quota
      FROM weighted CROSS JOIN tot
    ),
    ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5('{TEMP_HASH_SEED}:'
                         || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                        doc_id) AS rk
      FROM documents
    ),
    picked AS (
      SELECT r.lang, r.doc_id
      FROM ranked r JOIN quotas q ON r.lang = q.lang AND r.rk <= q.quota
    )
    SELECT q.lang, q.n_docs, q.quota,
           CAST(COALESCE(count(p.doc_id), 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(sum(p.doc_id), 0) AS BIGINT) AS sample_fp
    FROM quotas q LEFT JOIN picked p ON q.lang = p.lang
    GROUP BY q.lang, q.n_docs, q.quota
    """,
    tags=("text", "sampling", "mixing", "temperature"),
)
def doc_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed domain resampling: per-language quotas
    ∝ n^0.5 over a 20% target budget, members chosen by deterministic
    hash rank within each language — the data-mixing step a
    multilingual pretraining pipeline runs after cleaning.

    Scale: the r10 form ranked EVERY row of each language through one
    ``Window.partitionBy("lang")`` task — a ~10-cardinality key, so the
    head language's whole corpus sorted in a single reducer (VERDICT
    r10/r11 scale-killer). Now a per-lang BUCKET BRACKET (the grouped
    generalization of :func:`plans.dsir._dsir_top_k`): the 32-bit
    member hash is histogrammed into 4096 buckets (map-side-combined
    count, ≤ |langs|·4096 rows), a cumulative sum over that TINY table
    finds each language's boundary bucket, whole buckets below it are
    accepted with no ranking at all, and only the single boundary
    bucket (~1/4096 of the language) is ranked exactly for the
    residual. Result set is identical to the full rank — the oracle is
    unchanged. At 100 TB the boundary slice stays 1/4096 per language;
    widen TEMP_BUCKET_SHIFT to shrink it further.
    """
    from clickhouse_build_spark.operators.dedup import portable_hash

    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = counts.select(
        "lang",
        "n_docs",
        F.floor(
            F.sqrt(F.col("n_docs").cast("double"))
            * TEMP_ALPHA_SQRT_SCALE
            + 0.5
        )
        .cast("long")
        .alias("w_x1e6"),
    )
    tot = weighted.agg(
        F.sum("n_docs").alias("n_total"), F.sum("w_x1e6").alias("w_total")
    )
    quotas = weighted.join(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr(
            f"CAST((GREATEST(1, n_total DIV {TEMP_SAMPLE_RATE_DIV})"
            f" * w_x1e6) DIV w_total AS BIGINT)"
        ).alias("quota"),
    )
    hashed = docs.select(
        "lang",
        "doc_id",
        portable_hash(F.col("doc_id").cast("string"), TEMP_HASH_SEED).alias(
            "h"
        ),
    )
    bucket_width = 1 << TEMP_BUCKET_SHIFT
    bcounts = hashed.groupBy(
        "lang", F.expr(f"h DIV {bucket_width}").alias("hb")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # cumulative histogram — ≤4096 rows per lang, a bounded window
    cum_w = Window.partitionBy("lang").orderBy("hb")
    classified = (
        bcounts.join(quotas.select("lang", "quota"), "lang")
        .select(
            "lang",
            "hb",
            "quota",
            F.sum("cnt").over(cum_w).alias("cum"),
            (F.sum("cnt").over(cum_w) - F.col("cnt")).alias("prev"),
        )
        .select(
            "lang",
            "hb",
            (F.col("cum") <= F.col("quota")).alias("full_in"),
            (
                (F.col("prev") < F.col("quota"))
                & (F.col("quota") < F.col("cum"))
            ).alias("partial"),
            (F.col("quota") - F.col("prev")).alias("residual"),
        )
        .filter(F.col("full_in") | F.col("partial"))
    )
    marked = hashed.withColumn(
        "hb", F.expr(f"h DIV {bucket_width}")
    ).join(F.broadcast(classified), ["lang", "hb"])
    sure = marked.filter("full_in").select("lang", "doc_id")
    # exact rank only inside each lang's single boundary bucket
    # (~1/4096 of the language) — bounded partition, not the corpus
    rank_w = Window.partitionBy("lang").orderBy(F.asc("h"), F.asc("doc_id"))
    boundary = (
        marked.filter("partial")
        .select(
            "lang",
            "doc_id",
            "residual",
            F.row_number().over(rank_w).alias("rk"),
        )
        .filter(F.col("rk") <= F.col("residual"))
        .select("lang", "doc_id")
    )
    agg = sure.unionByName(boundary).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("sample_fp"),
    )
    return quotas.join(agg, "lang", "left").select(
        "lang",
        "n_docs",
        "quota",
        F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        F.coalesce("sample_fp", F.lit(0)).cast("long").alias("sample_fp"),
    )
