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
# iteration order. Round-10 ranking — stale-evidence rotation is POLICY
# (r03 lesson: data can change under a green row): (a) the five r09
# holdouts whose latest evidence was r06 (oldest on the board); (b) the
# ten rows that have NEVER had a driver row (late-r09 adds + this
# round's funnel/retention/fill_corr); (c) the four whose plan or
# semantics changed in r10 (the repaired SAMPLE+LIMIT BY composition,
# the df-capped Jaccard verifier, the warm-served trained-IVF row and
# the build row that now warms it); (d) 31 of the 46 rows whose latest
# evidence is r07, alphabetical. The 15 r07-age rows that did not fit
# are enumerated in the (d) comment below and MUST lead the r11
# rotation; every out-of-window row is still re-verified by the local
# full-registry sf0.01 oracle gate at the end of each round.
_DRIVER_WINDOW_PRIORITY = [
    # — (a) r10 leads: the r09 holdouts (r06 evidence) —
    "stats_total",
    "doc_top_tokens",
    "distinct_counts",
    "doc_split_counts",
    "list_filtered",
    # — (b) never-in-window rows (new in r09/r10) —
    "doc_dup_span_stats",
    "doc_span_scrubbed",
    "ch_dialect_asof_join",
    "ch_dialect_mv_rollup",
    "doc_bm25_topk",
    "doc_dsir_importance",
    "doc_dsir_sample",
    "ch_dialect_funnel",
    "ch_dialect_retention",
    "ch_dialect_fill_corr",
    # — (c) plan/semantics changed in r10 —
    "ch_dialect_sample_limit_by",
    "doc_near_dup_jaccard",
    "emb_ann_ivf_trained_topk",
    "build_ivfpq_index",
    # — (d) stalest remaining evidence (r07 driver rows), alphabetical;
    # 15 more r07-age rows did not fit the 50 and MUST lead r11:
    # orders_zorder_profile, part_attributes_unpivot,
    # q14_promo_revenue_share, q17_small_quantity_revenue,
    # q19_disjunctive_revenue, q1_pricing_summary, q21_waiting_suppliers,
    # q22_idle_rich_customers, q3_shipping_priority,
    # q5_local_supplier_volume, running_customer_revenue,
    # signup_purchase_funnel, stats_by_category, stats_by_month_pg_shape,
    # top_customers_by_revenue.
    "build_dedup_artifacts",
    "build_media_corpus",
    "build_quality_model",
    "clean_corpus",
    "corpus_quality_filter",
    "customer_order_span",
    "customers_without_orders",
    "doc_dedup_cluster_sizes",
    "doc_emb_semantic_dup_check",
    "doc_exact_dedup",
    "doc_fuzzy_dedup_keepers",
    "doc_incremental_dedup",
    "doc_lang_id",
    "doc_minhash_lsh_dedup",
    "doc_pack_sequences",
    "doc_quality_classifier_model",
    "doc_quality_scores",
    "doc_simhash",
    "doc_top_bigrams",
    "emb_ann_lsh_topk",
    "emb_fuzzy_dedup_keepers",
    "emb_lsh_bucketed_cosine_pairs",
    "emb_near_dup_cosine",
    "emb_pq_adc_topk",
    "emb_pq_codes",
    "event_value_histogram",
    "events_tumbling_10min",
    "media_adpcm_chunks",
    "media_mdct_chunks",
    # — (e) new in late r10 (never-in-window; displace the two freshest
    # (d) rows media_pframe_frames / media_video_frame_sample, which
    # join the r11 lead list alongside the 15 enumerated above) —
    "doc_hybrid_rrf_topk",
    "doc_temperature_sample",
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
