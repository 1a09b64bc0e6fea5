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
# iteration order. Round-14 ranking — stale-evidence rotation is POLICY
# (r03 lesson: data can change under a green row): (a) this round's
# new query (pg_dialect_jsonb_dynamic — bind-time @> + SQL/JSONPath);
# (b) ALL 28 rows deferred from r13 whose newest driver evidence is
# r09 — the full leftover cohort, now cleared (includes the semdedup
# pair, giving the two-level-quantization fix fresh driver evidence,
# VERDICT r13 #9); (c) 21 of the 47 rows whose newest evidence is
# r11, alphabetical. After this window lands, NO registry row's
# newest driver evidence predates r11. The r11-evidence rows that did
# not fit should lead the r15 rotation (alphabetical from
# doc_hybrid_rrf_topk). Every out-of-window row is still re-verified
# by the local full-registry sf0.01 oracle gate each round.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) new in r14 (never driver-evidenced rows lead) —
    "pg_dialect_jsonb_dynamic",
    # — (b) the r09-evidence leftover cohort (28 rows, incl. the
    #   semdedup pair with the r14 two-level quantization fix) —
    "emb_semdedup_keepers",
    "emb_semdedup_probe2_keepers",
    "events_asof_last_error",
    "events_json_props",
    "events_props_as_map",
    "events_sliding_10min_step5",
    "events_type_counts_salted",
    "events_views_in_error_windows",
    "media_audio_chunks",
    "media_image_features",
    "media_jpeg_transcode",
    "media_resize_features",
    "nation_revenue_ranks",
    "order_value_distribution",
    "part_stats_min_max_avg",
    "price_percentiles_by_flag",
    "q10_returned_items",
    "q12_priority_shipping_caseagg",
    "q18_large_volume_customers",
    "q6_forecast_revenue",
    "rolling_30day_customer_spend",
    "stats_by_month",
    "stats_daily_top30",
    "status_priority_pivot",
    "status_priority_profile",
    "top3_orders_per_customer",
    "user_sessions_30min",
    "weekly_retention_cohorts",
    # — (c) r11 evidence, alphabetical (21 of 47) —
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
    "doc_dsir_sample",
    "doc_dup_span_stats",
    "doc_emb_semantic_dup_check",
    "doc_exact_dedup",
    "doc_fuzzy_dedup_keepers",
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
