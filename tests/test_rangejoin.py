"""Bucketed range join: exact semantics on crafted intervals (boundary
inclusion, multi-bucket spans, overlapping intervals counted once) and
the plan guard that it never degenerates into a nested-loop join."""

from __future__ import annotations

import contextlib
import io
from datetime import datetime

from pyspark.sql import functions as F

from clickhouse_build_spark.operators.rangejoin import (
    interval_join,
    point_in_interval_counts,
)


def _ts(minute, second=0):
    return datetime(2026, 1, 1, 10, minute, second)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, 100, _ts(0)),        # == interval start (inclusive)
            (1, 101, _ts(5)),        # == interval end (inclusive)
            (1, 102, _ts(5, 1)),     # 1 s past the end → out
            (1, 103, _ts(3)),        # covered by BOTH intervals of user 1
            (2, 200, _ts(3)),        # right minute, wrong user → out
            (3, 300, _ts(59)),       # user without intervals → out
        ],
        "user_id long, event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts(0), _ts(5)),
            (1, _ts(2), _ts(4)),     # overlaps the first
            (2, _ts(30), _ts(57)),   # spans many 300 s buckets
        ],
        "user_id long, win_start timestamp, win_end timestamp",
    )
    return points, intervals


def test_boundaries_users_and_overlap_distinct(spark):
    points, intervals = _frames(spark)
    got = {
        r["user_id"]: r["n_points"]
        for r in point_in_interval_counts(
            points, intervals, "ts", "win_start", "win_end",
            on=["user_id"], count_col="event_id",
        ).collect()
    }
    # user 1: 100 (start), 101 (end), 103 (once, despite 2 intervals)
    assert got == {1: 3}


def test_pair_rows_appear_once_per_matching_interval(spark):
    points, intervals = _frames(spark)
    joined = interval_join(
        points, intervals, "ts", "win_start", "win_end", on=["user_id"]
    )
    # event 103 matches two intervals → two pair rows; no bucket
    # double-count: event 101 matches one interval spanning two buckets
    # but appears once.
    by_event = {
        r["event_id"]: r["n"]
        for r in joined.groupBy("event_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_event == {100: 1, 101: 1, 103: 2}


def test_multibucket_interval_still_exact(spark):
    points, intervals = _frames(spark)
    # add a point inside user 2's long interval
    extra = spark.createDataFrame(
        [(2, 201, _ts(45))], "user_id long, event_id long, ts timestamp"
    )
    got = point_in_interval_counts(
        points.union(extra), intervals, "ts", "win_start", "win_end",
        on=["user_id"], count_col="event_id",
    )
    assert {r["user_id"]: r["n_points"] for r in got.collect()} == {1: 3, 2: 1}


def test_plan_is_hash_join_not_nested_loop(spark):
    from clickhouse_build_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE

    df = REGISTRY["events_views_in_error_windows"].builder(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # broadcast or shuffled — either is fine
