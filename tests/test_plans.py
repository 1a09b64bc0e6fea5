"""Physical-plan regression guards: the scale properties the engine
promises (pushdown, pruning, broadcast dims, true top-k, partial
aggregation, no Python in SQL-expressible hot paths) must be visible in
the executed plan — a silent regression here costs nothing at sf0.1
and everything at 100 TB."""

from __future__ import annotations

import contextlib
import io

import pytest

from clickhouse_build_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def q3_plan(spark):
    return plan_of(REGISTRY["q3_shipping_priority"].builder(spark, SF_SMOKE))


def test_filters_push_into_parquet_scan(q3_plan):
    assert "PushedFilters:" in q3_plan
    assert "LessThan(o_orderdate" in q3_plan  # date range reaches the scan
    assert "EqualTo(c_mktsegment,BUILDING)" in q3_plan


def test_column_pruning_reaches_scan(q3_plan):
    # lineitem has 11 columns; the q3 scan must read only the 4 used
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in q3_plan
    )


def test_topk_plans_as_take_ordered(q3_plan):
    assert "TakeOrderedAndProject" in q3_plan  # true top-k, no global sort


def test_dimension_joins_broadcast(spark):
    plan = plan_of(REGISTRY["q5_local_supplier_volume"].builder(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims fit broadcast at test SF


def test_aggregates_are_partial_then_final(spark):
    plan = plan_of(REGISTRY["q1_pricing_summary"].builder(spark, SF_SMOKE))
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_no_python_eval_in_sql_expressible_queries(spark):
    """Python stages (BatchEvalPython/ArrowEvalPython/MapInPandas) may
    appear ONLY in the deliberately-Python operators (multimodal, the
    blocked cosine kernel); every SQL-expressible query must stay fully
    JVM-side."""
    python_ok = {
        "media_image_features",
        "media_resize_features",
        "media_jpeg_transcode",
        "media_video_frame_sample",
        "media_pframe_frames",
        "media_audio_chunks",
        "media_adpcm_chunks",
        "media_mdct_chunks",
        "emb_near_dup_cosine",
        # the IVFPQ at-rest index encode is a vectorized Arrow argmin
        # kernel (r07 — replaced the 256x codebook cross-join); its
        # consumers read the persisted frame but a standalone plan
        # shows the kernel
        "emb_ivfpq_topk",
        "emb_semdedup_keepers",
        "build_ivfpq_index",
    }
    for name, spec in REGISTRY.items():
        if name in python_ok:
            continue
        plan = plan_of(spec.builder(spark, SF_SMOKE))
        assert "EvalPython" not in plan and "MapInPandas" not in plan, name


def test_whole_stage_codegen_covers_scan_queries(spark):
    df = REGISTRY["q6_forecast_revenue"].builder(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")  # formatted mode hides codegen under AQE
    assert "WholeStageCodegen" in buf.getvalue()


def test_q20_semi_joins_broadcast(spark):
    """Both levels of the q20 IN-chain must plan as broadcast left-semi
    joins — a shuffled semi on the lineitem side would move the fact
    table for what is a dimension-sized probe."""
    plan = plan_of(REGISTRY["q20_bulk_part_suppliers"].builder(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_full_outer_join_inputs_are_preaggregated(spark):
    """nation_customer_supplier_balance must aggregate each side to
    nation granularity BEFORE the full-outer join (partial_count in the
    plan below the join), so the join moves ≤|nation| rows."""
    plan = plan_of(
        REGISTRY["nation_customer_supplier_balance"].builder(spark, SF_SMOKE)
    )
    assert "FullOuter" in plan
    assert "partial_count" in plan  # map-side combine on both agg sides


def test_q13_left_outer_keeps_unmatched_customers(spark):
    plan = plan_of(
        REGISTRY["q13_order_count_distribution"].builder(spark, SF_SMOKE)
    )
    assert "LeftOuter" in plan


def test_driver_window_priority_is_valid():
    """Every driver-window name must resolve (a typo would silently
    drop a query from the driver's 50-row verification window —
    _rerank_registry raises, this locks the behavior), the list must be
    exactly the window size with no duplicates, and the registry must
    actually lead with it."""
    from clickhouse_build_spark.plans import _DRIVER_WINDOW_PRIORITY

    assert len(_DRIVER_WINDOW_PRIORITY) == 50
    assert len(set(_DRIVER_WINDOW_PRIORITY)) == 50
    assert set(_DRIVER_WINDOW_PRIORITY) <= REGISTRY.keys()
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW_PRIORITY


def test_pack_sequences_window_is_bucketed(spark):
    """The packing prefix sum must stay distributed: the corpus-sized
    window runs per-bucket (partitionBy), and single-partition
    exchanges exist only for the tiny bounds/offsets frames."""
    plan = plan_of(REGISTRY["doc_pack_sequences"].builder(spark, SF_SMOKE))
    assert "windowspecdefinition(bucket" in plan
    assert plan.count("Exchange SinglePartition") <= 3
