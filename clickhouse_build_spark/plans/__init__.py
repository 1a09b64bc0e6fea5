"""Registered analytical queries (the engine's query surface).

``registry`` collects every query as a (builder, oracle-SQL) pair; the
driver's correctness gate runs both sides at sf0.01. Importing this
package loads all query modules so the registry is complete.
"""

from clickhouse_build_spark.plans.registry import REGISTRY, QuerySpec, query

# Import for registration side effects — each module adds its QuerySpecs.
from clickhouse_build_spark.plans import parity  # noqa: E402,F401
from clickhouse_build_spark.plans import relational  # noqa: E402,F401
from clickhouse_build_spark.plans import tpch_extra  # noqa: E402,F401
from clickhouse_build_spark.plans import windows  # noqa: E402,F401
from clickhouse_build_spark.plans import events  # noqa: E402,F401
from clickhouse_build_spark.plans import textops  # noqa: E402,F401
from clickhouse_build_spark.plans import similarity  # noqa: E402,F401
from clickhouse_build_spark.plans import dedup  # noqa: E402,F401
from clickhouse_build_spark.plans import multimodal  # noqa: E402,F401
from clickhouse_build_spark.plans import joinshapes  # noqa: E402,F401
from clickhouse_build_spark.plans import chdialect  # noqa: E402,F401
from clickhouse_build_spark.plans import quality  # noqa: E402,F401
from clickhouse_build_spark.plans import builds  # noqa: E402,F401
from clickhouse_build_spark.plans import layout  # noqa: E402,F401
from clickhouse_build_spark.plans import cdcrollup  # noqa: E402,F401
from clickhouse_build_spark.plans import perplexity  # noqa: E402,F401
from clickhouse_build_spark.plans import chclauses  # noqa: E402,F401
from clickhouse_build_spark.plans import kmeans  # noqa: E402,F401
from clickhouse_build_spark.plans import aggstate  # noqa: E402,F401
from clickhouse_build_spark.plans import retrieval  # noqa: E402,F401
from clickhouse_build_spark.plans import dsir  # noqa: E402,F401

# The driver's correctness gate checks the FIRST 50 registry entries in
# iteration order. Round-15 ranking — stale-evidence rotation is POLICY
# (r03 lesson: data can change under a green row): (a) this round's
# new rows (pg_dialect_jsonb_mutation — the jsonb_set/insert/delete
# family; doc_simhash_clusters — the linear-output simhash summary);
# (b) ALL 26 rows whose newest driver evidence is r11 — the full
# leftover cohort, now cleared (VERDICT r14 #8); (c)
# doc_simhash_dup_pairs (r12 evidence, but its builder CHANGED this
# round — the pair_cap guard — so it re-earns driver evidence); (d) 21
# of the remaining 49 r12-evidence rows, alphabetical. After this
# window lands, NO registry row's newest driver evidence predates r12.
# The r12-evidence rows that did not fit should lead the r16 rotation
# (alphabetical from doc_oov_rate). Zero overlap with the r14 window.
# Every out-of-window row is still re-verified by the local
# full-registry sf0.01 oracle gate each round.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) new in r15 (never driver-evidenced rows lead) —
    "pg_dialect_jsonb_mutation",
    "doc_simhash_clusters",
    # — (b) the r11-evidence leftover cohort (26 rows) —
    "doc_hybrid_rrf_topk",
    "doc_incremental_dedup",
    "doc_lang_id",
    "doc_minhash_lsh_dedup",
    "doc_near_dup_jaccard",
    "doc_pack_sequences",
    "doc_quality_classifier_model",
    "doc_quality_scores",
    "doc_simhash",
    "doc_span_scrubbed",
    "doc_split_counts",
    "doc_top_bigrams",
    "doc_top_tokens",
    "emb_ann_ivf_trained_topk",
    "emb_ann_lsh_topk",
    "emb_fuzzy_dedup_keepers",
    "emb_lsh_bucketed_cosine_pairs",
    "emb_near_dup_cosine",
    "emb_pq_adc_topk",
    "emb_pq_codes",
    "event_value_histogram",
    "events_tumbling_10min",
    "list_filtered",
    "media_adpcm_chunks",
    "media_mdct_chunks",
    "stats_total",
    # — (c) changed this round (pair_cap guard) —
    "doc_simhash_dup_pairs",
    # — (d) r12 evidence, alphabetical (21 of 49) —
    "approx_distinct_and_percentiles",
    "big_spender_segments_having",
    "cdc_incremental_rollup",
    "ch_dialect_algebraic_states",
    "ch_dialect_any_join",
    "ch_dialect_array_join_tokens",
    "ch_dialect_fill_corr",
    "ch_dialect_final_latest",
    "ch_dialect_funnel",
    "ch_dialect_funnel_strict",
    "ch_dialect_limit_with_ties",
    "ch_dialect_monthly_stats",
    "ch_dialect_prewhere_totals",
    "ch_dialect_seq_count_timed",
    "ch_dialect_seq_exact",
    "ch_dialect_seq_timed",
    "corpus_perplexity_bands",
    "curated_training_corpus",
    "doc_chunk_text",
    "doc_contamination_screen",
    "doc_lm_bigram_model",
]


def _rerank_registry() -> None:
    # A typo'd or renamed priority entry must fail loudly — silently
    # skipping it would drop the query from the driver's 50-row
    # verification window with no signal (ADVICE r04).
    missing = set(_DRIVER_WINDOW_PRIORITY) - REGISTRY.keys()
    if missing:
        raise ValueError(
            f"driver-window priority names not in REGISTRY: {sorted(missing)}"
        )
    if len(_DRIVER_WINDOW_PRIORITY) != len(set(_DRIVER_WINDOW_PRIORITY)):
        raise ValueError("driver-window priority list has duplicates")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW_PRIORITY}
    for n, spec in REGISTRY.items():
        ordered.setdefault(n, spec)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rerank_registry()

__all__ = ["REGISTRY", "QuerySpec", "query"]
