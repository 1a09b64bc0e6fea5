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

# The driver's correctness gate checks the FIRST 50 registry entries in
# iteration order (round 1 stopped at entry 50, leaving every
# doc_*/emb_*/media_* query unverified — VERDICT.md "What's missing"
# #1). Re-rank the registry so the window covers (a) the whole
# LLM-data-pipeline surface, (b) queries changed this round, and (c) one
# representative per relational/window/event operator family; the tail
# holds redundant twins of shapes already driver-verified green in
# round 1.
_DRIVER_WINDOW_PRIORITY = [
    # — LLM pipeline: text analysis / dedup / similarity / multimodal —
    "doc_token_stats",
    "doc_quality_scores",
    "doc_lang_id",
    "doc_top_tokens",
    "doc_tfidf_top_terms",
    "doc_bpe_token_counts",
    "doc_exact_dedup",
    "doc_near_dup_jaccard",
    "doc_minhash_lsh_dedup",
    "doc_simhash_dup_pairs",
    "doc_winnow_fingerprints",
    "doc_fuzzy_dedup_keepers",
    "clean_corpus",
    "doc_pii_scrub",
    "doc_repetition_stats",
    "doc_contamination_screen",
    "doc_stratified_sample",
    "doc_token_histogram",
    "doc_split_counts",
    "doc_incremental_dedup",
    "emb_knn_cosine",
    "emb_label_centroids",
    "emb_near_dup_cosine",
    "emb_lsh_bucketed_cosine_pairs",
    "emb_ann_lsh_topk",
    "emb_ann_lsh_topk_batch",
    "emb_ann_ivf_topk",
    "emb_normalize_quantize",
    "media_image_features",
    # — changed this round: must earn fresh driver rows —
    "q7_nation_trade_flows",
    "q9_product_profit",
    "q12_priority_shipping_caseagg",
    "events_props_as_map",
    "status_priority_profile",
    "price_percentiles_by_flag",
    "customers_except_returners",
    # — new join shapes (round 2): first driver verification —
    "q13_order_count_distribution",
    "nation_customer_supplier_balance",
    "q15_top_supplier",
    "q11_major_revenue_parts",
    "q20_bulk_part_suppliers",
    "q8_nation_market_share",
    "events_views_in_error_windows",
    "status_priority_pivot",
    # — CH-dialect SQL translation layer (round 2): end-to-end proof —
    "ch_dialect_monthly_stats",
    "ch_dialect_status_profile",
    # — remaining new TPC-H shapes (round 2): first driver verification.
    # Round-1-green families (q1, windows, sessions, asof) hold their
    # CORRECTNESS_r01 rows as evidence and still pass the local sf0.01
    # gate; new queries that have NEVER seen a driver row outrank them.
    "q4_priority_order_check",
    "q16_supplier_count_by_part",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
]


def _rerank_registry() -> None:
    ordered = {
        n: REGISTRY[n] for n in _DRIVER_WINDOW_PRIORITY if n in REGISTRY
    }
    for n, spec in REGISTRY.items():
        ordered.setdefault(n, spec)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rerank_registry()

__all__ = ["REGISTRY", "QuerySpec", "query"]
