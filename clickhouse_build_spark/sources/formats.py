"""Multi-format source reads/writes: parquet, ORC, CSV, JSON-lines.

The driver tables are parquet, but a replication source in the wild
arrives in whatever the upstream dumps — CSV exports, JSONEachRow
feeds (the reference's own result wire format, ``corpus/
orm_none.txt:300``), ORC lakes. One entry point reads any of them
with a DECLARED schema (catalog rule §1.3: never trust inferSchema
for correctness-checked tables) and normalizes to the engine's
internal representation; the writer mirrors it for export.

Format notes that matter at scale:
- parquet/orc: columnar, splittable, predicate pushdown — the only
  formats data should *live* in.
- csv/json: row formats for ingest/export edges only; they read
  single-pass with no pushdown, so land them into parquet (via
  ``Replicator.snapshot``) before querying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SUPPORTED = ("parquet", "orc", "csv", "json")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType,
    csv_header: bool = True,
) -> DataFrame:
    """Read ``path`` as ``fmt`` with the declared schema applied (no
    inference; malformed rows fail fast via FAILFAST so a bad feed is
    an error, not silent nulls)."""
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported source format {fmt!r}; one of {SUPPORTED}")
    reader = spark.read.schema(schema)
    if fmt == "csv":
        return reader.options(header=csv_header, mode="FAILFAST").csv(path)
    if fmt == "json":
        return reader.option("mode", "FAILFAST").json(path)
    return getattr(reader, fmt)(path)


def write_sink(df: DataFrame, path: str, fmt: str, csv_header: bool = True) -> None:
    """Export ``df`` as ``fmt`` (JSON-lines matches the reference's
    JSONEachRow result shape, S9)."""
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {SUPPORTED}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.options(header=csv_header).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        getattr(writer, fmt)(path)
