"""Catalog timestamp-unit handling (round-4 fix for the round-3 silent
corruption: driver regenerated events.parquet as TIMESTAMP(MICROS) and
the unconditional nanosAsLong+div-1000 workaround collapsed every event
into January 1970).

The catalog must (1) probe the parquet footer and branch per actual
unit, and (2) fail LOUDLY — not serve wrong times — if the unit and the
chosen read path ever disagree again.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import (
    Catalog,
    _check_sane_events_ts,
    _parquet_nanos_columns,
)

from conftest import SF_SMOKE

ROWS = [
    (1, datetime.datetime(2024, 3, 1, 12, 0, 0, 123456), 10, "view", 1.0, "{}"),
    (2, datetime.datetime(2024, 3, 2, 13, 30, 0, 654321), 11, "click", 2.0, "{}"),
]


def _write_events(path: str, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(table, path)


def test_driver_events_file_reads_sane(spark):
    """The real driver file (whatever unit this round) must decode into
    a plausible year — the exact regression round 3 shipped."""
    cat = Catalog(spark, SF_SMOKE)
    lo, hi = cat.load("events").select(F.min("ts"), F.max("ts")).first()
    assert 1990 <= lo.year <= 2100, f"events min(ts)={lo} — unit corruption"
    assert 1990 <= hi.year <= 2100


@pytest.mark.parametrize("unit", ["us", "ms", "ns"])
def test_catalog_reads_every_parquet_unit(spark, tmp_path, unit):
    """Same logical data stored at µs/ms/ns precision must decode to the
    same instants (truncated to the stored precision)."""
    _write_events(str(tmp_path / "events.parquet"), unit)
    got = {
        r.event_id: r.ts
        for r in Catalog(spark, str(tmp_path)).load("events").collect()
    }
    for eid, want_dt, *_ in ROWS:
        want = want_dt if unit != "ms" else want_dt.replace(
            microsecond=want_dt.microsecond // 1000 * 1000
        )
        assert got[eid] == want, (unit, eid, got[eid], want)


def test_unit_probe_classifies_correctly(tmp_path):
    for unit, expect in (("us", ()), ("ms", ()), ("ns", ("ts",))):
        p = str(tmp_path / f"e_{unit}.parquet")
        _write_events(p, unit)
        assert _parquet_nanos_columns(p, ("ts",)) == expect


def test_guard_raises_on_garbage_instants(tmp_path):
    """A regenerated events file whose decoded wall times are
    implausible (the observable symptom of round 3's unit corruption)
    must refuse loudly at catalog time, not flow wrong values into
    every event-time query."""
    p = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            # epoch + a few minutes — exactly what the div-1000 bug produced
            "ts": pa.array([datetime.datetime(1970, 1, 20, 17, 21)], pa.timestamp("us")),
            "user_id": pa.array([10], pa.int64()),
            "event_type": pa.array(["view"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(table, p)
    with pytest.raises(AssertionError, match="sanity"):
        _check_sane_events_ts(p, ("ts",), ())


def test_misrouted_nanos_file_fails_loudly_in_spark(spark, tmp_path):
    """The OTHER misroute direction (NANOS file down the native path)
    needs no custom guard — Spark's parquet reader itself throws; pin
    that behavior so a future Spark upgrade can't make it silent."""
    from clickhouse_build_spark.catalog import SCHEMAS

    p = str(tmp_path / "events.parquet")
    _write_events(p, "ns")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        with pytest.raises(
            Exception,
            match="PARQUET_TYPE_ILLEGAL|PARQUET_COLUMN_DATA_TYPE_MISMATCH|ILLEGAL",
        ):
            spark.read.schema(SCHEMAS["events"]).parquet(p).collect()
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
