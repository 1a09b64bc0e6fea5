"""Bucketed-table writer: co-located joins without a shuffle
(SURVEY §4 / the "bucketing for co-located joins" 100 TB rule).

The replication layer's hash-bucket layout bounds *merge* work; THIS
is the query-side counterpart — Spark's native bucketed tables
(``bucketBy`` + ``saveAsTable``). Two fact tables bucketed on their
join key into the same bucket count join with NO Exchange on either
side: the scan itself is the partitioning. At 100 TB that deletes the
two largest shuffles a fact-fact join pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally lets sort-merge joins
    skip the sort phase."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with
    no Exchange on either side (verified in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
