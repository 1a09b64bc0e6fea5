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
# iteration order. Round-13 ranking — stale-evidence rotation is POLICY
# (r03 lesson: data can change under a green row): (a) this round's new
# queries (the MergeTree-DDL layout profile and the PG-arm breadth
# rows: string_agg WITHIN-GROUP pull-out, generate_series gap-fill,
# jsonb ->/@> via the VARIANT reader);
# (b) the 24 rows deferred from r12 whose newest driver evidence is
# r08 — the full r12 deferral list, now cleared; (c) 20 of the 48 rows
# whose newest evidence is r09, alphabetical. The 28 r09-evidence rows
# that did not fit MUST lead the r14 rotation: emb_semdedup_keepers,
# emb_semdedup_probe2_keepers, events_asof_last_error,
# events_json_props,
# events_props_as_map, events_sliding_10min_step5,
# events_type_counts_salted, events_views_in_error_windows,
# media_audio_chunks, media_image_features, media_jpeg_transcode,
# media_resize_features, nation_revenue_ranks, order_value_distribution,
# part_stats_min_max_avg, price_percentiles_by_flag, q10_returned_items,
# q12_priority_shipping_caseagg, q18_large_volume_customers,
# q6_forecast_revenue, rolling_30day_customer_spend, stats_by_month,
# stats_daily_top30, status_priority_pivot, status_priority_profile,
# top3_orders_per_customer, user_sessions_30min,
# weekly_retention_cohorts. Every out-of-window row is still
# re-verified by the local full-registry sf0.01 oracle gate each round.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) new in r13 (never driver-evidenced rows lead) —
    "orders_mergetree_layout_profile",
    "pg_dialect_string_agg",
    "pg_dialect_series_fill",
    "pg_dialect_jsonb_ops",
    "pg_dialect_jsonb_paths",
    "pg_dialect_percentiles",
    # — (b) the r12 deferral list (newest evidence r08) —
    "emb_ann_kmeans_topk",
    "emb_kmeans_assign",
    "emb_kmeans_centroids",
    "events_daily_with_fill",
    "events_top3_users_limit_by",
    "events_uniq_state_merge",
    "nation_account_union",
    "nation_customer_supplier_balance",
    "orders_sample_band",
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
    # — (c) r09 evidence, alphabetical (20 of 48) —
    "cdc_latest_event_per_user",
    "ch_dialect_dictget",
    "ch_dialect_json_props",
    "ch_dialect_rollup_stats",
    "ch_dialect_status_profile",
    "ch_dialect_token_arrays",
    "ch_dialect_topk_intervals",
    "ch_dialect_url_report",
    "customer_latest_order_argmax",
    "customer_order_gaps",
    "customers_except_returners",
    "doc_bpe_token_counts",
    "doc_token_histogram",
    "doc_winnow_fingerprints",
    "emb_ann_ivf_topk",
    "emb_ann_lsh_topk_batch",
    "emb_ivfpq_topk",
    "emb_knn_cosine",
    "emb_label_centroids",
    "emb_normalize_quantize",
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
