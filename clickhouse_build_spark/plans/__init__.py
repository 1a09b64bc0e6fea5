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
# iteration order. Round-4 ranking (VERDICT.md r03 "Next round" #2):
# (a) the 8 event-time queries re-fixed by the catalog timestamp-unit
# probe — they MUST earn fresh driver rows on current (MICROS) data;
# (b) the 7 queries never driver-verified in any round;
# (c) queries changed this round (new oracles / plan swaps);
# (d) queries whose only driver evidence is r01 — round 3 proved data
# can change under a green row, so oldest evidence refreshes first.
# The tail holds r03-green rows (current-data evidence) — the whole
# LLM-pipeline doc_*/emb_* surface and the round-2 join shapes.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) re-fixed event-time queries (catalog ts-unit fix, round 4) —
    "events_tumbling_10min",
    "events_sliding_10min_step5",
    "cdc_latest_event_per_user",
    "user_sessions_30min",
    "signup_purchase_funnel",
    "weekly_retention_cohorts",
    "events_asof_last_error",
    "events_views_in_error_windows",
    # — (b) never driver-verified in r01-r03 —
    "part_attributes_unpivot",
    "events_type_counts_salted",
    "doc_simhash",
    "doc_top_bigrams",
    "emb_ann_ivf_trained_topk",
    "media_video_frame_sample",
    "media_audio_chunks",
    # — (c) changed or NEW this round —
    "approx_distinct_and_percentiles",
    "price_percentiles_by_flag",
    "media_image_features",
    "emb_fuzzy_dedup_keepers",
    "doc_dedup_cluster_sizes",
    "doc_emb_semantic_dup_check",
    # — (d) r01-only evidence, oldest-first refresh: events-adjacent —
    "events_json_props",
    "event_value_histogram",
    # windows family (r01 evidence only)
    "top3_orders_per_customer",
    "customer_order_gaps",
    "running_customer_revenue",
    "nation_revenue_ranks",
    "order_value_distribution",
    "customer_order_span",
    "rolling_30day_customer_spend",
    "customer_latest_order_argmax",
    # TPC-H core (r01 evidence only)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue_share",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_idle_rich_customers",
    # parity + aggregate shapes (r01 evidence only)
    "stats_total",
    "stats_by_category",
    "stats_by_month",
    "stats_daily_top30",
    "list_filtered",
    "stats_by_month_pg_shape",
    "top_customers_by_revenue",
    "part_stats_min_max_avg",
    "distinct_counts",
    "customers_without_orders",
    # (urgent_order_customers_semi / nation_account_union /
    # returned_and_urgent_intersect hold their still-valid r01 rows —
    # their input tables never changed — yielding window slots to the
    # three round-4 queries above, which have never had a driver row.)
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
