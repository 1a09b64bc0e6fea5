"""Registry-wide plan-hygiene lint (VERDICT r10 #2 / r11 #3).

Every registered query's physical plan must be free of the shapes that
melt at 100 TB: partition-less Windows (global single-task sorts) and
nested-loop/cartesian joins — outside the documented constant-bounded
allowlists in ``tools/plan_lint.py``. The detector itself is
self-tested on planted good/bad plans so a format drift in Spark's
``explain("formatted")`` output fails loudly instead of passing
everything.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_lint import (  # noqa: E402
    ALLOWED_NLJ,
    ALLOWED_PARTITIONLESS,
    count_nlj,
    count_partitionless_windows,
    formatted_plan,
    lint_registry,
)
from tests.conftest import SF_SMOKE  # noqa: E402


def test_detector_flags_planted_global_window(spark):
    df = spark.range(100).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rk")
    )
    assert count_partitionless_windows(formatted_plan(df)) == 1


def test_detector_passes_partitioned_window(spark):
    df = (
        spark.range(100)
        .select("id", (F.col("id") % 7).alias("g"))
        .select(
            "g",
            F.row_number()
            .over(Window.partitionBy("g").orderBy("id"))
            .alias("rk"),
        )
    )
    assert count_partitionless_windows(formatted_plan(df)) == 0


def test_detector_passes_partitionby_without_orderby(spark):
    # two bracket groups but the second is a PARTITION spec (no
    # ASC/DESC) — the q2 min-over-partition shape; must NOT be flagged
    df = (
        spark.range(100)
        .select("id", (F.col("id") % 7).alias("g"))
        .select("g", F.min("id").over(Window.partitionBy("g")).alias("mn"))
    )
    assert count_partitionless_windows(formatted_plan(df)) == 0


def test_detector_flags_planted_cross_join(spark):
    a = spark.range(50)
    b = spark.range(50).select(F.col("id").alias("id2"))
    assert count_nlj(formatted_plan(a.crossJoin(b))) >= 1


def test_registry_plan_hygiene(spark):
    violations = lint_registry(spark, SF_SMOKE)
    assert not violations, "\n".join(violations)


def test_allowlists_not_stale(spark):
    """Every allowlist entry must still exhibit the shape it excuses —
    a fixed query should drop off the list, not linger as a blanket
    waiver for future regressions."""
    from clickhouse_build_spark.plans import REGISTRY

    stale = []
    for name in sorted(ALLOWED_PARTITIONLESS):
        plan = formatted_plan(REGISTRY[name].builder(spark, SF_SMOKE))
        if count_partitionless_windows(plan) == 0:
            stale.append(f"{name} (partition-less allowlist)")
    for name in sorted(ALLOWED_NLJ):
        plan = formatted_plan(REGISTRY[name].builder(spark, SF_SMOKE))
        if count_nlj(plan) == 0:
            stale.append(f"{name} (NLJ allowlist)")
    assert not stale, "allowlist entries no longer needed: " + ", ".join(stale)


def test_unbounded_nlj_detector_on_planted_joins(spark):
    """VERDICT r12 #8: the NLJ allowlist is now structurally checked —
    every allowlisted NLJ's build side must carry a row bound the PLAN
    proves (global aggregate, constant limit, literal frame, or a
    pushed catalog-primary-key probe filter). A planted unbounded
    cross join — even one 'added to an allowlisted query' — fails."""
    from tools.plan_lint import count_unbounded_nlj

    sf = SF_SMOKE
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    # unbounded: full-scan x full-scan
    planted = docs.crossJoin(orders.select("o_orderkey"))
    assert count_unbounded_nlj(formatted_plan(planted)) == 1
    # a NON-key equality does not bound (status='F' is 25% of 100 TB)
    nonkey = docs.crossJoin(
        orders.filter("o_orderstatus = 'F'").select("o_orderkey")
    )
    assert count_unbounded_nlj(formatted_plan(nonkey)) == 1
    # catalog-primary-key equality probes DO bound (the query-vector
    # pattern), as do constant limits
    keyed = docs.crossJoin(
        orders.filter("o_orderkey = 7").select("o_orderkey")
    )
    assert count_unbounded_nlj(formatted_plan(keyed)) == 0
    limited = docs.crossJoin(orders.select("o_orderkey").limit(3))
    assert count_unbounded_nlj(formatted_plan(limited)) == 0
    # joining THROUGH an allowlisted query's frame stays bounded when
    # that frame is the (top-k) build side — the rule tracks the
    # broadcast relation, not the query name...
    from clickhouse_build_spark.plans import REGISTRY

    allowed = REGISTRY["emb_knn_cosine"].builder(spark, sf)
    assert count_unbounded_nlj(
        formatted_plan(allowed.crossJoin(docs.select("doc_id")))
    ) == 0
    # ...and a full-scan x full-scan cross join planted upstream of
    # any later shaping is flagged (an aggregate downstream does not
    # bound the build side; note Spark DOES push a plain limit() below
    # a cross join, which then legitimately bounds it)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    corrupted = (
        emb.select("vec_id")
        .crossJoin(docs.select("doc_id"))
        .groupBy("doc_id")
        .count()
    )
    assert count_unbounded_nlj(formatted_plan(corrupted)) >= 1


def test_allowlisted_nlj_builds_are_all_bounded(spark):
    """Every ALLOWED_NLJ entry's actual plan passes the structural
    bound — the allowlist cannot rot as plans evolve (the registry
    lint enforces the same; this pins it per-entry with a clear name
    on failure)."""
    from tools.plan_lint import count_unbounded_nlj
    from clickhouse_build_spark.plans import REGISTRY

    bad = []
    for name in sorted(ALLOWED_NLJ):
        plan = formatted_plan(REGISTRY[name].builder(spark, SF_SMOKE))
        n = count_unbounded_nlj(plan)
        if n:
            bad.append(f"{name}: {n}")
    assert not bad, "unbounded allowlisted NLJs: " + ", ".join(bad)
