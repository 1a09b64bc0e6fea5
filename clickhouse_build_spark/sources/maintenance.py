"""Table maintenance: small-file compaction (100 TB hygiene).

The CDC merge writer (``sources/replication.py``) appends one file set
per touched bucket per batch — correct, but a month of frequent
micro-batches leaves thousands of small files per bucket, and at scan
time every file costs a task plus footer reads. Compaction rewrites a
bucket's files into ~target-sized ones while preserving the layout
contract (hash-bucketed by key, sorted within partitions by key +
version) so reads after compaction plan identically, just with fewer,
fuller tasks.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def compact_table(
    spark: SparkSession,
    path: str,
    sort_cols: list[str],
    target_file_mb: int = 128,
    partition_col: str = "bucket",
) -> dict:
    """Rewrite each partition's files into ~``target_file_mb`` files.

    Per-partition file count = ceil(partition_bytes / target); the
    rewrite runs partition-at-a-time (bounded memory, and a failure
    mid-compaction leaves every untouched partition intact — the same
    swap discipline as the CDC merge).

    Returns {partition_value: (files_before, files_after)}.
    """
    report: dict[str, tuple[int, int]] = {}
    prefix = f"{partition_col}="
    parts = sorted(
        d for d in os.listdir(path) if d.startswith(prefix) and os.path.isdir(os.path.join(path, d))
    )
    for part in parts:
        pdir = os.path.join(path, part)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        size = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        n_target = max(1, -(-size // (target_file_mb * 2**20)))
        if len(files) <= n_target:
            report[part] = (len(files), len(files))
            continue
        df = (
            spark.read.parquet(pdir)
            .repartition(int(n_target))
            .sortWithinPartitions(*sort_cols)
        )
        # Stage OUTSIDE the table root: a temp dir named bucket=N__* inside
        # the root would be picked up by partition discovery — a crash
        # mid-compaction (or a concurrent read) would then see duplicated
        # rows and a string-typed partition column. Outside the root, a
        # crash just leaves harmless garbage next to the table.
        tmp = os.path.join(path + "__compacting", part)
        df.write.mode("overwrite").parquet(tmp)
        # swap via two renames: the old dir moves aside (readers between
        # the renames get a transient missing-partition, never a mix of
        # old+new rows), then the trash is dropped
        import shutil

        trash = os.path.join(path + "__compacting", part + "__old")
        os.rename(pdir, trash)
        os.rename(tmp, pdir)
        shutil.rmtree(trash)
        report[part] = (
            len(files),
            len([f for f in os.listdir(pdir) if f.endswith(".parquet")]),
        )
    staging = path + "__compacting"
    if os.path.isdir(staging):
        import shutil

        shutil.rmtree(staging)
    return report


def purge_tombstones(
    spark: SparkSession,
    path: str,
    version_col: str,
    horizon: int | float | str | None = None,
    partition_col: str = "bucket",
) -> dict:
    """Drop stored delete markers whose version is at or below the
    replay ``horizon`` (r08 — the TTL half of tombstone retention).

    The CDC merge keeps winning deletes as tombstone rows so an
    out-of-order lower-version upsert cannot resurrect the key
    (``sources/replication.py``). They are only needed while the feed
    can still replay versions below them; once the source's replay
    horizon passes, this job reclaims the space — ClickHouse's
    ``is_deleted`` + merge-time cleanup, Cassandra's gc_grace.
    ``horizon=None`` purges every tombstone (caller asserts the feed is
    fully drained). Only buckets containing qualifying tombstones are
    rewritten; returns {partition: rows_purged}.
    """
    from pyspark.sql import functions as F

    from clickhouse_build_spark.sources.replication import DELETE_OP, OP_COLUMN

    report: dict[str, int] = {}
    prefix = f"{partition_col}="
    parts = sorted(
        d
        for d in os.listdir(path)
        if d.startswith(prefix) and os.path.isdir(os.path.join(path, d))
    )
    for part in parts:
        pdir = os.path.join(path, part)
        df = spark.read.parquet(pdir)
        if OP_COLUMN not in df.columns:
            report[part] = 0
            continue
        dead = F.coalesce(F.col(OP_COLUMN), F.lit("")) == DELETE_OP
        if horizon is not None:
            dead = dead & (F.col(version_col) <= F.lit(horizon))
        n_dead = df.filter(dead).count()
        if n_dead == 0:
            report[part] = 0
            continue
        kept = df.filter(~dead)
        tmp = os.path.join(path + "__purging", part)
        kept.write.mode("overwrite").parquet(tmp)
        import shutil

        trash = os.path.join(path + "__purging", part + "__old")
        os.rename(pdir, trash)
        os.rename(tmp, pdir)
        shutil.rmtree(trash)
        report[part] = n_dead
    staging = path + "__purging"
    if os.path.isdir(staging):
        import shutil

        shutil.rmtree(staging)
    return report
