"""File-drip change feed through the CDC path (VERDICT r04 "missing"
#3): a producer appends change files to a directory; a real Structured
Streaming file source drains them through the bucket-bounded
``Replicator.apply_changes`` merge. Three sequential drops, three
ingest invocations sharing one checkpoint — each must consume exactly
the new files — then the final latest-per-key state is oracle-checked
against DuckDB reading the raw feed."""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import types as T

from clickhouse_build_spark.sources.replication import Replicator, TableMapping
from clickhouse_build_spark.streaming.pipeline import stream_ingest

FEED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("_op", T.StringType()),
    ]
)

# Three change files, strictly increasing versions per key: a snapshot-
# ish initial load, an update batch with one insert, then a delete and
# a late update.
DROPS = [
    [
        {"id": i, "val": f"v1-{i}", "version": 100 + i, "_op": None}
        for i in range(1, 11)
    ],
    [
        {"id": 3, "val": "v2-3", "version": 201, "_op": None},
        {"id": 4, "val": "v2-4", "version": 202, "_op": None},
        {"id": 5, "val": "v2-5", "version": 203, "_op": None},
        {"id": 11, "val": "v2-11", "version": 204, "_op": None},
    ],
    [
        {"id": 7, "val": "gone", "version": 301, "_op": "d"},
        {"id": 1, "val": "v3-1", "version": 302, "_op": None},
    ],
]


def _drop_file(feed_dir: str, n: int) -> str:
    path = os.path.join(feed_dir, f"changes-{n:04d}.json")
    with open(path, "w") as f:
        for row in DROPS[n]:
            f.write(json.dumps(row) + "\n")
    return path


@pytest.fixture()
def rig(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    rep = Replicator(
        spark=spark,
        target_root=str(tmp_path / "replica"),
        key_cols=["id"],
        version_col="version",
        n_buckets=8,
    )
    mapping = TableMapping("public", "t", "t")
    ckpt = str(tmp_path / "ckpt")
    return str(feed), rep, mapping, ckpt


def _ingest(spark, rig_tuple):
    feed, rep, mapping, ckpt = rig_tuple
    return stream_ingest(spark, feed, rep, mapping, FEED_SCHEMA, ckpt)


def _state(rep, mapping):
    return {
        r.id: (r.val, r.version)
        for r in rep.read(mapping).select("id", "val", "version").collect()
    }


def test_three_sequential_drops_merge_incrementally(spark, rig):
    feed, rep, mapping, ckpt = rig

    _drop_file(feed, 0)
    _ingest(spark, rig)
    assert _state(rep, mapping) == {
        i: (f"v1-{i}", 100 + i) for i in range(1, 11)
    }

    _drop_file(feed, 1)
    _ingest(spark, rig)
    s = _state(rep, mapping)
    assert s[3] == ("v2-3", 201) and s[11] == ("v2-11", 204)
    assert s[2] == ("v1-2", 102)  # untouched keys keep their state

    _drop_file(feed, 2)
    _ingest(spark, rig)
    s = _state(rep, mapping)
    assert 7 not in s  # delete marker applied
    assert s[1] == ("v3-1", 302)

    # latest-per-key oracle over the RAW feed: what any CDC consumer
    # must converge to, computed independently by DuckDB
    want = {
        row[0]: (row[1], row[2])
        for row in duckdb.sql(
            f"""
            SELECT id, val, version FROM (
              SELECT *, row_number() OVER (PARTITION BY id ORDER BY version DESC) rn
              FROM read_json_auto('{feed}/*.json', format='newline_delimited')
            ) WHERE rn = 1 AND (_op IS NULL OR _op <> 'd')
            """
        ).fetchall()
    }
    assert s == want


def test_checkpoint_prevents_reprocessing(spark, rig):
    feed, rep, mapping, ckpt = rig
    _drop_file(feed, 0)
    _ingest(spark, rig)
    merges_after_first = len(rep.assumptions)
    # no new files → the drain must be a no-op (empty batch short-circuit)
    _ingest(spark, rig)
    assert len(rep.assumptions) == merges_after_first
    assert _state(rep, mapping) == {
        i: (f"v1-{i}", 100 + i) for i in range(1, 11)
    }


def test_one_shot_drain_consumes_backlog_in_bounded_batches(spark, rig):
    """All three files already present (a catch-up run): a single
    drain with maxFilesPerTrigger=1 must process them as bounded
    micro-batches and still converge to the same state."""
    feed, rep, mapping, ckpt = rig
    for n in range(3):
        _drop_file(feed, n)
    stream_ingest(
        spark, feed, rep, mapping, FEED_SCHEMA, ckpt, max_files_per_trigger=1
    )
    s = _state(rep, mapping)
    assert 7 not in s and s[1] == ("v3-1", 302) and s[11] == ("v2-11", 204)
    # three bounded merges, not one giant batch
    assert len([a for a in rep.assumptions if "merge batch" in a]) == 3
