"""Table catalog: explicit schemas + view registration (SURVEY.md §1.3).

The reference never infers schemas from data — tables are externally
declared and discovered by inspection (``src/prompts/scanner.py:21``,
``src/prompts/data_migrator.py:25-27``). We mirror that: every table the
engine serves has an explicit ``StructType``; parquet reads are validated
against it rather than trusting ``inferSchema``.

Also carries the reference's source↔target table-mapping concept
(``src/tools/data_migrator.py:46-55``): ``Catalog.register`` accepts a
mapping dict so a source table can be exposed under a different view name.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical schemas for the driver's star schema + extension tables
# (FIXTURES.md §2). TPC-H-ish: region/nation/customer/supplier/part/
# orders/lineitem; extension: events (stream-shaped), documents,
# embeddings (training-data pipeline surface).
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(SCHEMAS)

# The events table stores ts as parquet TIMESTAMP(NANOS), which Spark's
# reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Physical workaround:
# read the column as raw INT64 nanoseconds (legacy nanosAsLong conf) and
# convert to microsecond TIMESTAMP_NTZ with *integer* division — float
# division would lose precision above 2^53 ns. DuckDB truncates ns→µs the
# same way, so both engines see identical values.
_READ_SCHEMAS: dict[str, T.StructType] = {
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
}


def _post_read_events(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
    )


_POST_READ = {"events": _post_read_events}

# Dimension tables small enough to broadcast at ANY scale factor — region
# and nation are fixed-cardinality (5 / 25 rows) even at 100 TB. supplier/
# part/customer grow with SF; AQE decides those at runtime.
ALWAYS_BROADCAST: frozenset[str] = frozenset({"region", "nation"})


@dataclass
class Catalog:
    """Registers the driver's parquet tables as temp views on a session.

    ``table_mappings`` mirrors the reference's replication catalog
    (sourceTable → targetTable, ``src/tools/data_migrator.py:49-55``):
    the parquet file keeps its source name, the view gets the target name.
    """

    spark: SparkSession
    sf_dir: str
    table_mappings: dict[str, str] = field(default_factory=dict)
    _frames: dict[str, DataFrame] = field(default_factory=dict, init=False)

    def path(self, table: str) -> str:
        return os.path.join(self.sf_dir, f"{table}.parquet")

    def load(self, table: str) -> DataFrame:
        """Load one table with its declared schema (never inferSchema)."""
        if table not in self._frames:
            if table not in SCHEMAS:
                raise KeyError(f"unknown table {table!r}; catalog has {TABLE_NAMES}")
            read_schema = _READ_SCHEMAS.get(table, SCHEMAS[table])
            if table in _READ_SCHEMAS:
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = self.spark.read.schema(read_schema).parquet(self.path(table))
            post = _POST_READ.get(table)
            if post is not None:
                df = post(df)
            self._frames[table] = df
        return self._frames[table]

    def register_all(self) -> "Catalog":
        for table in TABLE_NAMES:
            if os.path.exists(self.path(table)):
                target = self.table_mappings.get(table, table)
                self.load(table).createOrReplaceTempView(target)
        return self

    def __getitem__(self, table: str) -> DataFrame:
        return self.load(table)


def load_tables(spark: SparkSession, sf_dir: str) -> Catalog:
    """One-call convenience used by every registered query builder."""
    return Catalog(spark, sf_dir).register_all()
