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
# iteration order. Round-17 ranking — stale-evidence rotation is POLICY
# (r03 lesson: data can change under a green row): (a) the four NEW
# r17 rows (pg_dialect_datetime_format, pg_dialect_json_agg,
# pg_dialect_jsonb_descend, pg_dialect_jsonb_strict); (b) ALL 30 rows whose newest driver
# evidence is r13 — the full leftover cohort (VERDICT r16 #6);
# (c) 16 of the 49 r14-evidence rows, alphabetical. After this window
# lands, no UNCHANGED registry row's newest driver evidence predates
# r14. The 33 r14-evidence rows that did not fit lead the r18 rotation
# (alphabetical from doc_dsir_sample).
# Every out-of-window row is still re-verified by the local
# full-registry sf0.01 oracle gate each round.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) NEW rows this round (r17): the PG scalar-fidelity rollup
    # (to_char / dow / integer div), the json_agg result-assembly
    # family, the bounded .** recursive descent, and strict mode —
    "pg_dialect_datetime_format",
    "pg_dialect_json_agg",
    "pg_dialect_jsonb_descend",
    "pg_dialect_jsonb_strict",
    # — (b) the 30 r13-evidence rows (the full leftover cohort,
    # VERDICT r16 #6) —
    "emb_knn_cosine",
    "emb_label_centroids",
    "emb_normalize_quantize",
    "events_daily_with_fill",
    "events_top3_users_limit_by",
    "events_uniq_state_merge",
    "nation_account_union",
    "nation_customer_supplier_balance",
    "orders_mergetree_layout_profile",
    "orders_sample_band",
    "pg_dialect_jsonb_ops",
    "pg_dialect_jsonb_paths",
    "pg_dialect_percentiles",
    "pg_dialect_series_fill",
    "pg_dialect_string_agg",
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
    # — (c) r14 evidence, alphabetical (16 of 49) —
    "build_dedup_artifacts",
    "build_ivfpq_index",
    "build_media_corpus",
    "build_quality_model",
    "ch_dialect_asof_join",
    "ch_dialect_mv_rollup",
    "ch_dialect_retention",
    "ch_dialect_sample_limit_by",
    "clean_corpus",
    "corpus_quality_filter",
    "customer_order_span",
    "customers_without_orders",
    "distinct_counts",
    "doc_bm25_topk",
    "doc_dedup_cluster_sizes",
    "doc_dsir_importance",
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
