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
# iteration order. Round-12 ranking — stale-evidence rotation is POLICY
# (r03 lesson: data can change under a green row): (a) the 17 rows
# whose newest driver evidence is still r07 (the 15 enumerated in the
# r10 deferral note plus the two media rows displaced late in r10);
# (b) this round's new or semantics-changed queries (the strict-mode
# funnel + timed sequenceMatch additions, the zero-variance-safe corr
# rewrite under ch_dialect_fill_corr, the entry-exploded funnel fold
# under ch_dialect_funnel, the bucket-bracket doc_temperature_sample,
# and the r12b adds: algebraic states, ANY JOIN, LIMIT WITH TIES,
# timed sequenceCount, (?t==N) sequenceMatch, PG ->> and DISTINCT ON);
# (c) 21 of the 45 rows whose newest evidence is r08-or-older,
# alphabetical. The 24 that did not fit MUST lead the r13 rotation:
# emb_ann_kmeans_topk,
# emb_kmeans_assign, emb_kmeans_centroids, events_daily_with_fill,
# events_top3_users_limit_by, events_uniq_state_merge, nation_account_union,
# nation_customer_supplier_balance, orders_sample_band,
# q11_major_revenue_parts, q13_order_count_distribution,
# q15_top_supplier, q16_supplier_count_by_part, q20_bulk_part_suppliers,
# q2_min_cost_supplier, q4_priority_order_check, q7_nation_trade_flows,
# q8_nation_market_share, q9_product_profit,
# returned_and_urgent_intersect, status_priority_cube,
# status_priority_grouping_sets, status_priority_rollup,
# urgent_order_customers_semi. Every out-of-window row is still
# re-verified by the local full-registry sf0.01 oracle gate each round.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) r07-age evidence, the r10/r11 deferral list —
    "orders_zorder_profile",
    "part_attributes_unpivot",
    "q14_promo_revenue_share",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "running_customer_revenue",
    "signup_purchase_funnel",
    "stats_by_category",
    "stats_by_month_pg_shape",
    "top_customers_by_revenue",
    "media_pframe_frames",
    "media_video_frame_sample",
    # — (b) new or semantics-changed in r12 —
    "ch_dialect_funnel_strict",
    "ch_dialect_algebraic_states",
    "ch_dialect_any_join",
    "ch_dialect_limit_with_ties",
    "ch_dialect_seq_count_timed",
    "ch_dialect_seq_exact",
    "ch_dialect_seq_timed",
    "pg_dialect_distinct_on",
    "pg_dialect_json_props",
    "ch_dialect_fill_corr",
    "ch_dialect_funnel",
    "doc_temperature_sample",
    # — (c) r08-or-older evidence, alphabetical (28 of 45) —
    "approx_distinct_and_percentiles",
    "big_spender_segments_having",
    "cdc_incremental_rollup",
    "ch_dialect_array_join_tokens",
    "ch_dialect_final_latest",
    "ch_dialect_monthly_stats",
    "ch_dialect_prewhere_totals",
    "corpus_perplexity_bands",
    "curated_training_corpus",
    "doc_chunk_text",
    "doc_contamination_screen",
    "doc_lm_bigram_model",
    "doc_lm_perplexity",
    "doc_oov_rate",
    "doc_pii_scrub",
    "doc_quality_classifier",
    "doc_repetition_stats",
    "doc_simhash_dup_pairs",
    "doc_stratified_sample",
    "doc_tfidf_top_terms",
    "doc_token_stats",
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
