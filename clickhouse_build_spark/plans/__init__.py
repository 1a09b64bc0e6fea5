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
# iteration order. Round-5 ranking — stale-evidence rotation is now
# POLICY (r03 lesson: data can change under a green row; VERDICT r04
# "Next round" #6): (a) queries whose CODE changed this round (real
# media decode, anchor scale-gate, shared dedup artifacts) must earn
# rows on the new plans; (b) queries whose newest driver row is r01 —
# three rounds stale; (c) the oldest remaining evidence (r03),
# oldest-plan-first. Left outside the window: ten r03-green queries,
# each with a same-machinery cousin inside it (listed at the tail), and
# the 50 r04-green rows — nothing's latest evidence predates r03 after
# this rotation.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) NEW or code changed in round 5 —
    "doc_chunk_text",
    "doc_pack_sequences",
    "doc_oov_rate",
    "emb_pq_codes",
    "emb_pq_adc_topk",
    "q2_min_cost_supplier",
    "media_resize_features",
    "media_image_features",
    "media_video_frame_sample",
    "media_audio_chunks",
    "approx_distinct_and_percentiles",
    "doc_minhash_lsh_dedup",
    "doc_fuzzy_dedup_keepers",
    "doc_dedup_cluster_sizes",
    "doc_emb_semantic_dup_check",
    "doc_incremental_dedup",
    # — (b) newest driver row is r01 (three rounds stale) —
    "big_spender_segments_having",
    "nation_account_union",
    "returned_and_urgent_intersect",
    "status_priority_cube",
    "status_priority_grouping_sets",
    "status_priority_rollup",
    "urgent_order_customers_semi",
    # — (c) newest driver row is r03: joins + aggregates —
    "q4_priority_order_check",
    "q7_nation_trade_flows",
    "q8_nation_market_share",
    "q9_product_profit",
    "q11_major_revenue_parts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q19_disjunctive_revenue",
    "q20_bulk_part_suppliers",
    "q21_waiting_suppliers",
    "nation_customer_supplier_balance",
    # text-pipeline surface (r03 evidence)
    "doc_token_stats",
    "doc_quality_scores",
    "doc_lang_id",
    "doc_exact_dedup",
    "doc_tfidf_top_terms",
    "clean_corpus",
    "doc_pii_scrub",
    "doc_repetition_stats",
    "doc_contamination_screen",
    "doc_stratified_sample",
    # similarity / ANN surface (r03 evidence)
    "emb_near_dup_cosine",
    "emb_lsh_bucketed_cosine_pairs",
    "emb_ann_lsh_topk",
    # near-dup fingerprints (r03 evidence)
    "doc_simhash_dup_pairs",
    # dialect endpoint (r03 evidence)
    "ch_dialect_monthly_stats",
    # Held OUT at r03 evidence, each with an in-window cousin exercising
    # the same machinery: customers_except_returners (set-ops cousins
    # in (b)), status_priority_profile / status_priority_pivot (cube/
    # rollup/grouping-sets cousins in (b)), events_props_as_map
    # (events_json_props r04), doc_top_tokens / doc_token_histogram
    # (doc_token_stats, doc_tfidf_top_terms), doc_split_counts
    # (doc_stratified_sample), emb_normalize_quantize (narrow per-row
    # transform), emb_ann_lsh_topk_batch (emb_ann_lsh_topk),
    # q12_priority_shipping_caseagg (q4), ch_dialect_status_profile
    # (ch_dialect_monthly_stats — slot yielded to the brand-new
    # media_resize_features, which has never had a driver row),
    # doc_bpe_token_counts (tokenize cousins doc_token_stats /
    # doc_tfidf_top_terms in-window; slot yielded to the brand-new
    # doc_chunk_text), emb_ann_ivf_topk (emb_ann_ivf_trained_topk is
    # r04-green and emb_ann_lsh_topk stays in-window; slot yielded to
    # the brand-new doc_pack_sequences), doc_near_dup_jaccard (its
    # shingle/pair machinery runs in-window via doc_minhash_lsh_dedup;
    # slot yielded to the brand-new q2_min_cost_supplier),
    # doc_winnow_fingerprints (fingerprint-family cousin
    # doc_simhash_dup_pairs stays in-window; slot yielded to the
    # brand-new doc_oov_rate), emb_label_centroids (centroid
    # machinery cousins: trained-IVF r04-green, PQ codebooks now
    # in-window; slot yielded to the brand-new emb_pq_codes),
    # emb_knn_cosine (the exact-KNN frame is recomputed inside the
    # r04-green emb_ann_ivf_trained_topk oracle; slot yielded to the
    # brand-new emb_pq_adc_topk). All r04-green rows also sit
    # outside — their evidence is one round old.
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
