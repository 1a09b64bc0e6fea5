"""Shared Spark↔DuckDB result comparison, mirroring the driver's gate:
row-count + column names + order-insensitive canonicalized values.

Round-1 lesson (VERDICT.md "What's wrong" #4): this gate must be at
least as strict as the driver's, or it green-lights queries the driver
fails. Three driver behaviors are modeled explicitly:

- floats are canonicalized at FULL precision (``repr``), not ``%.6g`` —
  the driver hash-failed q7 on a rounding tie the 6-sig-digit canon
  masked;
- a DuckDB HUGEINT (int128) result column fails outright: the driver
  renders it via pandas as float ("2014.0") while Spark prints int64
  ("2014"), hash-failing identical values. DuckDB returns HUGEINT for
  ``sum(<integer expr>)`` — oracles must ``CAST(... AS BIGINT)``;
- an array/list-typed result column fails outright on EITHER side: the
  driver's canonicalizer pandas-sorts columns and crashes on unhashable
  lists. Emit ``array_join``/``array_to_string`` instead.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from clickhouse_build_spark.catalog import TABLE_NAMES

# DuckDB types the driver's pandas canonicalizer mangles or crashes on.
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "[]", "LIST", "STRUCT", "MAP")


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            v = 0.0  # collapse IEEE -0.0
        # FULL precision (shortest round-trip repr): any cross-engine
        # rounding divergence must fail here before it fails the driver
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _driver_unsafe_types(spark_df, rel) -> str | None:
    """Result-column types the driver's canonicalizer can't digest."""
    for f in spark_df.schema.fields:
        tn = f.dataType.typeName()
        if tn in ("array", "map", "struct"):
            return (
                f"spark column {f.name!r} is {tn}-typed — the driver's "
                "pandas canonicalizer crashes on unhashable values; emit "
                "array_join(...)/to_json(...) instead"
            )
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(b in t for b in _BANNED_DUCK_TYPES):
            return (
                f"oracle column {name!r} has DuckDB type {t} — the driver "
                "renders HUGEINT/LIST via pandas as float/list and "
                "hash-fails or crashes; CAST(... AS BIGINT) / "
                "array_to_string(...) in the oracle"
            )
    return None


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    unsafe = _driver_unsafe_types(spark_df, rel)
    if unsafe:
        return False, f"driver-unsafe result type: {unsafe}"
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        return False, f"values differ, first diffs: {diffs}"
    return True, "ok"
