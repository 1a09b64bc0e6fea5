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

# The driver's correctness gate checks the FIRST 50 registry entries in
# iteration order. Round-7 ranking — stale-evidence rotation is POLICY
# (r03 lesson: data can change under a green row): (a) queries NEW this
# round (quality-classifier family, ingest/build entries, SemDeDup,
# P-frame video) or whose plan/oracle changed since their last row
# (ADC ordered aggregation, pack_sequences bucketer gating, the
# video-corpus format split touching media_video_frame_sample);
# (b) every query whose newest driver row is r04 — the oldest evidence
# on the board (19); (c) 20 of the 45 r05-evidence rows, artifact-
# machinery consumers and the r06 contention-block queries first.
# After this rotation no query's latest driver row predates r05; the
# 24 r05 rows left outside (tail note) must lead the r08 window.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) NEW in round 7, or plan/oracle changed since the last row —
    "build_dedup_artifacts",
    "build_ivfpq_index",
    "build_media_corpus",
    "build_quality_model",
    "doc_quality_classifier_model",
    "doc_quality_classifier",
    "corpus_quality_filter",
    "emb_semdedup_keepers",
    "media_pframe_frames",
    "media_mdct_chunks",
    "media_adpcm_chunks",
    "orders_zorder_profile",
    "curated_training_corpus",
    "emb_pq_adc_topk",
    "doc_pack_sequences",
    "media_video_frame_sample",
    # — (b) newest driver row is r04 (all 19) —
    "customer_order_span",
    "customers_without_orders",
    "doc_simhash",
    "doc_top_bigrams",
    "emb_fuzzy_dedup_keepers",
    "event_value_histogram",
    "events_tumbling_10min",
    "part_attributes_unpivot",
    "q14_promo_revenue_share",
    "q17_small_quantity_revenue",
    "q1_pricing_summary",
    "q22_idle_rich_customers",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "running_customer_revenue",
    "signup_purchase_funnel",
    "stats_by_category",
    "stats_by_month_pg_shape",
    "top_customers_by_revenue",
    # — (c) r05-evidence: dedup/ANN artifact consumers (now reading
    #   the build_* entries' steady-state frames — their rows prove the
    #   amortized path), the new classifier's heuristic basis, and the
    #   r06 contention-block join queries —
    "doc_dedup_cluster_sizes",
    "doc_fuzzy_dedup_keepers",
    "doc_minhash_lsh_dedup",
    "doc_incremental_dedup",
    "doc_emb_semantic_dup_check",
    "doc_exact_dedup",
    "clean_corpus",
    "doc_quality_scores",
    "doc_lang_id",
    "emb_pq_codes",
    "emb_near_dup_cosine",
    "emb_lsh_bucketed_cosine_pairs",
    "emb_ann_lsh_topk",
    "q21_waiting_suppliers",
    "q19_disjunctive_revenue",
    # Held OUT at r05 evidence (29), each with an in-window cousin:
    # status_priority_cube (status_priority_pivot r06),
    # q9_product_profit + q2_min_cost_supplier + q20_bulk_part_suppliers
    # (join-agg cousins q21/q19 in window), doc_simhash_dup_pairs (its
    # signature artifact is exercised by in-window doc_simhash),
    # approx_distinct_and_percentiles, big_spender_segments_having,
    # ch_dialect_monthly_stats (ch_dialect_status_profile r06),
    # doc_chunk_text, doc_contamination_screen, doc_oov_rate,
    # doc_pii_scrub, doc_repetition_stats, doc_stratified_sample,
    # doc_tfidf_top_terms, doc_token_stats, nation_account_union,
    # nation_customer_supplier_balance, q11_major_revenue_parts,
    # q13_order_count_distribution, q15_top_supplier,
    # q16_supplier_count_by_part, q4_priority_order_check,
    # q7_nation_trade_flows, q8_nation_market_share,
    # returned_and_urgent_intersect, status_priority_grouping_sets,
    # status_priority_rollup, urgent_order_customers_semi.
    # These MUST lead the r08 rotation (they will be two rounds old).
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
