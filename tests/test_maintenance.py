"""Compaction: fragmented CDC buckets must shrink to few files with
identical readable content."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clickhouse_build_spark.sources.maintenance import compact_table
from clickhouse_build_spark.sources.replication import Replicator, TableMapping
from tests.conftest import SF_SMOKE


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from clickhouse_build_spark.catalog import load_tables

    orders = load_tables(spark, SF_SMOKE)["orders"]
    rep = Replicator(
        spark=spark,
        target_root=str(tmp_path),
        key_cols=["o_orderkey"],
        version_col="o_orderdate",
        n_buckets=4,
    )
    mapping = TableMapping("public", "orders", "orders_replica")
    rep.snapshot(orders, mapping)
    # The merge writer itself leaves one file set per touched bucket
    # (clear + append), so fragment the way a real table fragments:
    # many small independent appends (parallel ingest writers).
    path0 = str(tmp_path / "orders_replica")
    extra = rep._bucketed(
        orders.limit(200).withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)
    )
    for i in range(5):
        (
            extra.withColumn("o_orderkey", F.col("o_orderkey") + i * 10_000_000)
            .repartition("bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(path0)
        )

    path = str(tmp_path / "orders_replica")
    before = rep.read(mapping).orderBy("o_orderkey").collect()
    n_files_before = sum(
        len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")])
        for d in os.listdir(path)
        if d.startswith("bucket=")
    )
    report = compact_table(spark, path, sort_cols=["o_orderkey", "o_orderdate"])
    after = rep.read(mapping).orderBy("o_orderkey").collect()
    n_files_after = sum(a for (_, a) in report.values())

    assert after == before  # content identical
    assert n_files_after < n_files_before  # genuinely compacted
    assert all(a <= b for (b, a) in report.values())
