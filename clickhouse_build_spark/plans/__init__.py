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

# The driver's correctness gate checks the FIRST 50 registry entries in
# iteration order. Round-8 ranking — stale-evidence rotation is POLICY
# (r03 lesson: data can change under a green row): (a) the 29 queries
# whose newest driver row is r05 — the oldest evidence on the board,
# pre-listed by the r07 tail note and VERDICT r07 directive #2;
# (b) queries NEW this round (SemDeDup probe2, the incremental CDC
# rollup, the bigram-LM perplexity family, the WITH FILL / LIMIT BY
# clause queries, the distributed Lloyd k-means pair) or whose
# plan/oracle changed since their last row (the semdedup oracle +
# at-rest index export touching build_ivfpq_index / emb_ivfpq_topk,
# the quality scorer's left-join touching the classifier family and
# curated_training_corpus). The round's 21 new/changed queries filled
# the whole remainder — every r06-evidence row is now outside the
# window: the 46 of them = the 33-item "Held OUT" tail note below
# PLUS the 13 displaced rows (emb_ann_lsh_topk_batch, emb_knn_cosine,
# emb_ann_ivf_topk, emb_ann_ivf_trained_topk,
# cdc_latest_event_per_user, ch_dialect_status_profile,
# events_asof_last_error, events_props_as_map,
# events_sliding_10min_step5, events_type_counts_salted,
# events_views_in_error_windows, list_filtered, stats_daily_top30).
# ALL 46 must lead the r09 window, oldest evidence first. After this
# rotation no query's latest driver row predates r06.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) newest driver row is r05 (all 29) —
    "approx_distinct_and_percentiles",
    "big_spender_segments_having",
    "ch_dialect_monthly_stats",
    "doc_chunk_text",
    "doc_contamination_screen",
    "doc_oov_rate",
    "doc_pii_scrub",
    "doc_repetition_stats",
    "doc_simhash_dup_pairs",
    "doc_stratified_sample",
    "doc_tfidf_top_terms",
    "doc_token_stats",
    "nation_account_union",
    "nation_customer_supplier_balance",
    "q11_major_revenue_parts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q20_bulk_part_suppliers",
    "q2_min_cost_supplier",
    "q4_priority_order_check",
    "q7_nation_trade_flows",
    "q8_nation_market_share",
    "q9_product_profit",
    "returned_and_urgent_intersect",
    "status_priority_cube",
    "status_priority_grouping_sets",
    "status_priority_rollup",
    "urgent_order_customers_semi",
    # — (b) NEW in round 8, or plan/oracle changed since the last row —
    "emb_semdedup_keepers",
    "emb_semdedup_probe2_keepers",
    "cdc_incremental_rollup",
    "doc_lm_bigram_model",
    "doc_lm_perplexity",
    "corpus_perplexity_bands",
    "events_daily_with_fill",
    "events_top3_users_limit_by",
    "emb_kmeans_centroids",
    "emb_kmeans_assign",
    "emb_ann_kmeans_topk",
    "orders_sample_band",
    "events_uniq_state_merge",
    "ch_dialect_sample_limit_by",
    "ch_dialect_prewhere_totals",
    "ch_dialect_array_join_tokens",
    "ch_dialect_final_latest",
    "doc_quality_classifier",
    # corpus_quality_filter displaced for emb_ann_kmeans_topk — its
    # machinery stays verified through doc_quality_classifier (same
    # scorer) and curated_training_corpus (embeds the filter predicate)
    "curated_training_corpus",
    "build_ivfpq_index",
    "emb_ivfpq_topk",
    # The 13 displaced r06-evidence rows are enumerated in the header
    # comment above; with the tail note below they form the full
    # 46-row r09 lead list.
    # Held OUT at r06 evidence (33), each re-verified by the local
    # full-registry oracle gate this round: customer_latest_order_argmax,
    # customer_order_gaps, customers_except_returners, distinct_counts,
    # doc_bpe_token_counts, doc_near_dup_jaccard, doc_split_counts,
    # doc_token_histogram, doc_top_tokens, doc_winnow_fingerprints,
    # emb_label_centroids, emb_normalize_quantize, events_json_props,
    # media_audio_chunks, media_image_features, media_jpeg_transcode,
    # media_resize_features, nation_revenue_ranks,
    # order_value_distribution, part_stats_min_max_avg,
    # price_percentiles_by_flag, q10_returned_items,
    # q12_priority_shipping_caseagg, q18_large_volume_customers,
    # q6_forecast_revenue, rolling_30day_customer_spend, stats_by_month,
    # stats_total, status_priority_pivot, status_priority_profile,
    # top3_orders_per_customer, user_sessions_30min,
    # weekly_retention_cohorts. These MUST lead the r09 rotation.
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
