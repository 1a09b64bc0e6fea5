"""Bucketed range join (point-in-interval): the scale-safe plan for
``point.ts BETWEEN interval.start AND interval.end`` joins.

Spark plans a pure non-equi join as BroadcastNestedLoopJoin (or a
cartesian product when neither side fits broadcast) — O(|L|·|R|) work
that dies at 100 TB. The standard fix, implemented here: discretize
time into fixed buckets, explode each interval into the buckets it
covers, equi-join points to interval-buckets on (key, bucket) — a
plain shuffled/broadcast hash join — then refine with the exact
BETWEEN predicate. Each (point, interval) pair can match in exactly
one bucket (the point's own), so no post-join distinct is needed.

Work is O(|points| + Σ interval_spans/bucket + |true matches|); bucket
size trades explode fan-out (long intervals → many buckets) against
join selectivity (big buckets → more false candidates refined away).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: list[str],
    bucket_seconds: int = 300,
) -> DataFrame:
    """Join point rows to interval rows with
    ``start <= point_ts <= end`` (plus equi-keys ``on``), as a bucketed
    equi-join. Returns the joined frame with all columns of both
    inputs (interval columns deduplicated via the equi-keys).

    The interval side explodes to one row per covered bucket; the point
    side computes its single bucket. Both sides then hash-join on
    ``on + [__bucket]`` — Catalyst/AQE picks broadcast vs shuffle —
    and the exact BETWEEN refines. Candidate pairs appear exactly once
    because a point lives in exactly one bucket.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(F.col(c)) / bucket_seconds)  # noqa: E731
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket(start_ts), bucket(end_ts))),
    )
    pointed = points.withColumn("__bucket", bucket(point_ts))
    joined = pointed.join(exploded, on=on + ["__bucket"]).filter(
        F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    )
    return joined.drop("__bucket")


def point_in_interval_counts(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: list[str],
    count_col: str,
    bucket_seconds: int = 300,
    distinct: bool = True,
) -> DataFrame:
    """Per-key counts of points covered by ≥1 interval. ``distinct``
    counts each point once even when several intervals cover it (the
    usual "affected events" semantics)."""
    joined = interval_join(
        points, intervals, point_ts, start_ts, end_ts, on, bucket_seconds
    )
    agg = (
        F.countDistinct(count_col) if distinct else F.count(count_col)
    ).alias("n_points")
    return joined.groupBy(*on).agg(agg)
