"""Replication layer: snapshot / CDC / cdc_only (SURVEY S3-S7, C1-C4).

The reference's data-migrator produces ClickPipe configs with three
replication modes (``src/tools/data_migrator.py:10-21``):

- ``snapshot``      — one-time full copy,
- ``cdc``           — initial snapshot followed by real-time sync,
- ``cdc_only``      — continuous sync without backfill,

plus source→target ``tableMappings`` (``:46-55``) and documented
assumptions about ordering keys (``src/prompts/data_migrator.py:25-37``).
ClickPipes lands CDC rows in ReplacingMergeTree-style tables where
readers see the latest version per key.

Spark-first re-expression:

- snapshot  = batch read → partitioned parquet write,
- cdc       = snapshot + incremental micro-batch **merge**: union the
  change batch with the affected state, resolve latest-version-per-key
  with a window (``row_number() OVER (PARTITION BY key ORDER BY version
  DESC) = 1`` — the ReplacingMergeTree analogue, SURVEY C3), honoring
  delete markers,
- cdc_only  = the same merge loop starting from empty state.

100 TB design (SURVEY §7.4 hard part #6): the target table is stored
**hash-bucketed by key** (``bucket`` partition column). Each merge batch
only rewrites the buckets its keys touch — a batch touching 1% of
buckets rewrites 1% of the table, never a full-table shuffle. The window
dedup runs per bucket, so its shuffle is bounded by bucket size.
"""

from __future__ import annotations

import enum
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ReplicationMode(str, enum.Enum):
    """Mirrors the reference's mode enum (``src/tools/data_migrator.py:10-21``)."""

    SNAPSHOT = "snapshot"  # one-time copy
    CDC = "cdc"  # initial snapshot + continuous sync
    CDC_ONLY = "cdc_only"  # continuous sync, no backfill


@dataclass(frozen=True)
class TableMapping:
    """One tableMappings entry (``src/tools/data_migrator.py:49-55``)."""

    source_schema: str
    source_table: str
    target_table: str


# Delete-marker column understood in change batches. A CDC feed row with
# _op = 'd' removes the key; anything else upserts.
OP_COLUMN = "_op"
DELETE_OP = "d"
# Table schema sidecar: lets a fully-emptied replica (every key deleted)
# stay readable as an empty table.
_SCHEMA_FILE = "_table_schema.json"


def latest_per_key(
    df: DataFrame, key_cols: list[str], version_col: str, tiebreak_col: str | None = None
) -> DataFrame:
    """ReplacingMergeTree read semantics (SURVEY C3): newest version wins.

    ``row_number() OVER (PARTITION BY key ORDER BY version DESC [, tiebreak
    DESC]) = 1``. The tiebreaker keeps resolution deterministic when two
    changes share a version (SURVEY §7.4 #5).
    """
    order = [F.desc(version_col)]
    if tiebreak_col is not None:
        order.append(F.desc(tiebreak_col))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@dataclass
class Replicator:
    """``engine.replicate(...)`` — the reference's ClickPipe semantics as a
    read-transform-write pipeline.

    ``assumptions`` mirrors the reference's assumption log
    (``src/prompts/data_migrator.py:25-37``): every default we pick
    (ordering key, bucket count) is recorded for the caller to audit.
    """

    spark: SparkSession
    target_root: str
    key_cols: list[str]
    version_col: str
    n_buckets: int = 32
    assumptions: list[str] = field(default_factory=list)

    def _target_path(self, mapping: TableMapping) -> str:
        return os.path.join(self.target_root, mapping.target_table)

    def _bucketed(self, df: DataFrame) -> DataFrame:
        # Hash-bucket on the replication key: the physical layout that
        # bounds every future merge to the touched buckets.
        key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in self.key_cols])
        return df.withColumn("bucket", F.pmod(F.hash(key), F.lit(self.n_buckets)))

    # ---------------------------------------------------------------- modes

    def replicate(
        self,
        source: DataFrame,
        mapping: TableMapping,
        mode: ReplicationMode | str = ReplicationMode.SNAPSHOT,
        changes: DataFrame | None = None,
    ) -> str:
        """Run one table's replication in the given mode; returns the
        target path. ``changes`` feeds the cdc modes (a batch of the
        change stream: source columns + version + optional ``_op``).
        """
        mode = ReplicationMode(mode)
        if mode is ReplicationMode.SNAPSHOT:
            return self.snapshot(source, mapping)
        if mode is ReplicationMode.CDC:
            path = self.snapshot(source, mapping)
            if changes is not None:
                self.apply_changes(changes, mapping)
            return path
        # CDC_ONLY: no backfill — state starts from whatever exists.
        if changes is not None:
            self.apply_changes(changes, mapping)
        else:
            # No change batch yet: initialize an empty-but-readable table
            # (schema sidecar + empty dir) so read() works before the
            # first sync lands — the CLI's cdc_only mode hits this.
            path = self._target_path(mapping)
            if not os.path.isdir(path):
                self._persist_schema(self._bucketed(source), path)
        return self._target_path(mapping)

    def snapshot(self, source: DataFrame, mapping: TableMapping) -> str:
        """S3: full copy, written hash-bucketed by key + sorted within
        partitions by (key, version) — the 'ordering key' assumption the
        reference documents (``src/prompts/data_migrator.py:36``)."""
        path = self._target_path(mapping)
        self.assumptions.append(
            f"{mapping.target_table}: ordering key = ({', '.join(self.key_cols)}, "
            f"{self.version_col}); {self.n_buckets} hash buckets"
        )
        bucketed = self._bucketed(source)
        (
            bucketed.repartition("bucket")
            .sortWithinPartitions(*self.key_cols, self.version_col)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path)
        )
        self._persist_schema(bucketed, path)
        return path

    def apply_changes(self, changes: DataFrame, mapping: TableMapping) -> str:
        """C2/C3: merge one change batch into the target.

        Only the hash buckets present in the batch are read, merged
        (latest version per key, deletes dropped), and rewritten —
        dynamic partition overwrite leaves all other buckets untouched.
        """
        path = self._target_path(mapping)
        has_op = OP_COLUMN in changes.columns
        batch = self._bucketed(changes)

        touched = [r["bucket"] for r in batch.select("bucket").distinct().collect()]
        self.assumptions.append(
            f"{mapping.target_table}: merge batch touched {len(touched)}/"
            f"{self.n_buckets} buckets"
        )

        has_data = os.path.isdir(path) and any(
            d.startswith("bucket=") for d in os.listdir(path)
        )
        if has_data:
            state = self.spark.read.parquet(path).filter(F.col("bucket").isin(touched))
            if has_op and OP_COLUMN not in state.columns:
                state = state.withColumn(OP_COLUMN, F.lit(None).cast("string"))
            # Conform the batch to the table's declared types: a change
            # feed with slightly different types (int vs long version,
            # string dates) must not fork the parquet schema — untouched
            # buckets keep the old schema, so a drifted write would make
            # the table unreadable.
            state_types = {f.name: f.dataType for f in state.schema.fields}
            batch = batch.select(
                *[
                    F.col(c).cast(state_types[c]).alias(c)
                    if c in state_types
                    else F.col(c)
                    for c in batch.columns
                ]
            )
            # Change-marker tiebreak: a change row carrying the SAME
            # version as the stored row must win deterministically (the
            # feed is by definition newer) — without it the window's
            # version-only ordering picks an arbitrary side and a
            # same-version update/delete can be silently dropped.
            merged_input = (
                state.withColumn("__src", F.lit(0))
                .unionByName(batch.withColumn("__src", F.lit(1)), allowMissingColumns=True)
            )
        else:
            merged_input = batch.withColumn("__src", F.lit(1))

        merged = latest_per_key(
            merged_input, self.key_cols, self.version_col, tiebreak_col="__src"
        ).drop("__src")
        if has_op:
            merged = merged.filter(
                F.coalesce(F.col(OP_COLUMN), F.lit("")) != DELETE_OP
            ).drop(OP_COLUMN)

        # Materialize the merge BEFORE clearing the touched buckets (the
        # merge reads them), then swap: clear + append. Clearing
        # explicitly — rather than dynamic partition overwrite — also
        # covers the case where deletes empty a bucket entirely (dynamic
        # overwrite would silently leave the stale partition in place).
        merged = merged.localCheckpoint(eager=True)
        self._persist_schema(merged, path)
        _clear_buckets(path, touched)
        (
            merged.repartition("bucket")
            .sortWithinPartitions(*self.key_cols, self.version_col)
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(path)
        )
        return path

    def read(self, mapping: TableMapping) -> DataFrame:
        """Reader view of the replica (already latest-per-key).

        A replica whose every key was deleted has no parquet files left
        (cleared buckets) — serve the empty table from the persisted
        schema instead of failing the scan."""
        path = self._target_path(mapping)
        if not any(d.startswith("bucket=") for d in os.listdir(path)):
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(
                __import__("json").load(open(os.path.join(path, _SCHEMA_FILE)))
            )
            return self.spark.createDataFrame([], schema).drop("bucket")
        return self.spark.read.parquet(path).drop("bucket")

    def _persist_schema(self, df: DataFrame, path: str) -> None:
        import json

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, _SCHEMA_FILE), "w") as f:
            json.dump(df.schema.jsonValue(), f)


def _clear_buckets(path: str, buckets: list[int]) -> None:
    """Remove the partition directories for the touched buckets — a
    metadata-scale operation (O(buckets), not O(data)); on a cluster this
    is the table-format delete (Hive partition drop / Iceberg overwrite)."""
    import shutil

    for b in buckets:
        d = os.path.join(path, f"bucket={b}")
        if os.path.isdir(d):
            shutil.rmtree(d)
