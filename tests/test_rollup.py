"""Incremental aggregate maintenance (RollupSpec): the rollup must
equal a full recompute of the latest-per-key state after EVERY CDC
merge batch — updates retract the replaced row's contribution,
tombstones retract without adding, emptied groups leave the rollup —
and the same invariant must hold when the merges arrive through the
real Structured Streaming ``foreachBatch`` path."""

from __future__ import annotations

import pyspark.sql.functions as F

from clickhouse_build_spark.sources.replication import (
    ReplicationMode,
    Replicator,
    RollupSpec,
    TableMapping,
)

MAP = TableMapping("public", "t", "t")


def _rows(df):
    return {
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    }


def _recompute(rep, spec):
    """Full recompute over the current replica state — the oracle the
    maintained rollup must always equal."""
    state = rep.read(MAP)
    cents = F.floor(F.col(spec.value_col) * 100 + F.lit(0.5)).cast("long")
    return state.groupBy(*spec.group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum(cents) / F.lit(100.0)).alias(f"sum_{spec.value_col}"),
    )


def _mk(spark, tmp_path):
    spec = RollupSpec(group_cols=["grp"], value_col="v")
    rep = Replicator(
        spark,
        str(tmp_path / "tgt"),
        key_cols=["k"],
        version_col="ver",
        n_buckets=4,
        rollup=spec,
    )
    return rep, spec


def _batch(spark, rows, with_op=False):
    schema = "k long, grp string, v double, ver long" + (
        ", _op string" if with_op else ""
    )
    return spark.createDataFrame(rows, schema)


def test_rollup_exact_after_every_batch(spark, tmp_path):
    rep, spec = _mk(spark, tmp_path)

    # snapshot initializes the rollup
    snap = _batch(
        spark,
        [(1, "a", 1.10, 1), (2, "a", 2.00, 1), (3, "b", 5.25, 1)],
    )
    rep.replicate(snap, MAP, mode=ReplicationMode.SNAPSHOT)
    assert _rows(rep.read_rollup(MAP)) == _rows(_recompute(rep, spec))
    assert _rows(rep.read_rollup(MAP)) == {
        ("a", 2, 3.10),
        ("b", 1, 5.25),
    }

    # batch 1: update k=1 (retract 1.10, add 9.00) + insert k=4 in a
    # NEW group c
    rep.apply_changes(
        _batch(spark, [(1, "a", 9.00, 2), (4, "c", 0.40, 2)]), MAP
    )
    assert _rows(rep.read_rollup(MAP)) == _rows(_recompute(rep, spec))
    assert _rows(rep.read_rollup(MAP)) == {
        ("a", 2, 11.00),
        ("b", 1, 5.25),
        ("c", 1, 0.40),
    }

    # batch 2: tombstone k=3 — group b empties and LEAVES the rollup;
    # update k=2 across groups (a → b is NOT a thing here, same key
    # keeps its group column from the new row: move k=2 to group c)
    rep.apply_changes(
        _batch(
            spark,
            [(3, "b", 5.25, 3, "d"), (2, "c", 2.50, 3, None)],
            with_op=True,
        ),
        MAP,
    )
    assert _rows(rep.read_rollup(MAP)) == _rows(_recompute(rep, spec))
    assert _rows(rep.read_rollup(MAP)) == {
        ("a", 1, 9.00),
        ("c", 2, 2.90),
    }

    # batch 3: stale change (ver older than stored) must be a no-op
    rep.apply_changes(
        _batch(spark, [(1, "a", 100.00, 1)]), MAP
    )
    assert _rows(rep.read_rollup(MAP)) == {
        ("a", 1, 9.00),
        ("c", 2, 2.90),
    }

    # batch 4: delete everything — rollup empties but stays readable
    rep.apply_changes(
        _batch(
            spark,
            [(1, "a", 9.00, 9, "d"), (2, "c", 2.50, 9, "d"), (4, "c", 0.40, 9, "d")],
            with_op=True,
        ),
        MAP,
    )
    assert rep.read_rollup(MAP).count() == 0
    assert _rows(rep.read_rollup(MAP)) == _rows(_recompute(rep, spec))


def test_rollup_cdc_only_from_empty(spark, tmp_path):
    rep, spec = _mk(spark, tmp_path)
    b1 = _batch(spark, [(1, "x", 1.00, 1), (2, "y", 2.00, 1)])
    rep.replicate(b1, MAP, mode=ReplicationMode.CDC_ONLY, changes=b1)
    b2 = _batch(spark, [(1, "x", 3.00, 2), (3, "y", 4.00, 2)])
    rep.replicate(b2, MAP, mode=ReplicationMode.CDC_ONLY, changes=b2)
    assert _rows(rep.read_rollup(MAP)) == _rows(_recompute(rep, spec))
    assert _rows(rep.read_rollup(MAP)) == {("x", 1, 3.00), ("y", 2, 6.00)}


def test_rollup_through_streaming_foreachbatch(spark, tmp_path):
    """The rollup rides the REAL continuous-sync path: change files
    drained by a Structured Streaming file source, each micro-batch
    merged by cdc_stream_writer → Replicator.apply_changes."""
    from clickhouse_build_spark.streaming.pipeline import cdc_stream_writer

    rep, spec = _mk(spark, tmp_path)
    seed = _batch(spark, [(1, "a", 1.00, 1), (2, "b", 2.00, 1)])
    rep.replicate(seed, MAP, mode=ReplicationMode.SNAPSHOT)

    feed = str(tmp_path / "feed")
    chunks = [
        [(1, "a", 7.00, 2, None), (3, "b", 3.00, 2, None)],
        [(2, "b", 2.00, 3, "d"), (4, "a", 0.25, 3, None)],
    ]
    for i, rows in enumerate(chunks):
        _batch(spark, rows, with_op=True).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/drop={i}")

    schema = _batch(spark, [], with_op=True).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(feed)
    )
    q = (
        cdc_stream_writer(stream, rep, MAP, str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert _rows(rep.read_rollup(MAP)) == _rows(_recompute(rep, spec))
    assert _rows(rep.read_rollup(MAP)) == {("a", 2, 7.25), ("b", 1, 3.00)}


def test_registered_rollup_query_matches_recompute(spark):
    """The registry entry's maintained rollup equals the full-recompute
    oracle shape at sf0.001 (the driver hash-checks sf0.01)."""
    from clickhouse_build_spark.plans import REGISTRY
    from clickhouse_build_spark.plans.cdcrollup import TOMBSTONE_SQL
    from clickhouse_build_spark.catalog import load_tables

    sf = "/root/testdata/sf0.001"
    got = REGISTRY["cdc_incremental_rollup"].builder(spark, sf)
    ev = load_tables(spark, sf)["events"]
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    live = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & ~F.expr(TOMBSTONE_SQL))
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    want = live.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum(cents) / F.lit(100.0)).alias("sum_value"),
    )
    assert _rows(got) == _rows(want)


def test_materialized_view_ddl_drives_the_rollup(spark, tmp_path):
    """r09: a verbatim CH CREATE MATERIALIZED VIEW (SummingMergeTree)
    declares the rollup — parse the DDL, hand the spec to the
    Replicator, and the maintained rollup must equal full recompute
    after every batch, exactly as a hand-built RollupSpec does."""
    from clickhouse_build_spark.sources.replication import rollup_from_mv

    name, source, spec = rollup_from_mv(
        """
        CREATE MATERIALIZED VIEW mv_grp_totals
        ENGINE = SummingMergeTree
        ORDER BY grp
        POPULATE
        AS SELECT grp, count() AS n_rows, sum(v) AS total
        FROM t GROUP BY grp
        """
    )
    assert (name, source) == ("mv_grp_totals", "t")
    assert spec.group_cols == ["grp"] and spec.value_col == "v"
    rep = Replicator(
        spark,
        str(tmp_path / "tgt"),
        key_cols=["k"],
        version_col="ver",
        n_buckets=4,
        rollup=spec,
    )
    rep.replicate(
        _batch(spark, [(1, "a", 1.0, 1), (2, "a", 2.0, 1), (3, "b", 3.0, 1)]),
        MAP,
        mode=ReplicationMode.SNAPSHOT,
    )
    rep.apply_changes(
        _batch(
            spark,
            [(2, "b", 20.0, 2, "u"), (3, "b", 3.0, 2, "d")],
            with_op=True,
        ),
        MAP,
    )
    assert _rows(rep.read_rollup(MAP)) == _rows(_recompute(rep, spec))


def test_materialized_view_ddl_rejects_unsupported_shapes(spark):
    import pytest

    from clickhouse_build_spark.functions.chsql import parse_materialized_view

    with pytest.raises(ValueError, match="engine"):
        parse_materialized_view(
            "CREATE MATERIALIZED VIEW x ENGINE = MergeTree AS "
            "SELECT a, count() FROM t GROUP BY a"
        )
    with pytest.raises(ValueError, match="one sum"):
        parse_materialized_view(
            "CREATE MATERIALIZED VIEW x ENGINE = SummingMergeTree AS "
            "SELECT a, sum(v), sum(w) FROM t GROUP BY a"
        )
    with pytest.raises(ValueError, match="unsupported materialized-view"):
        parse_materialized_view(
            "CREATE MATERIALIZED VIEW x ENGINE = SummingMergeTree AS "
            "SELECT a, avg(v) FROM t GROUP BY a"
        )
    with pytest.raises(ValueError, match="JOIN/WHERE/HAVING"):
        parse_materialized_view(
            "CREATE MATERIALIZED VIEW x ENGINE = SummingMergeTree AS "
            "SELECT a, count() FROM t WHERE a > 1 GROUP BY a"
        )
    with pytest.raises(ValueError, match="TO"):
        parse_materialized_view(
            "CREATE MATERIALIZED VIEW x TO tgt ENGINE = SummingMergeTree "
            "AS SELECT a, count() FROM t GROUP BY a"
        )
