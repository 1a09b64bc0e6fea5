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
