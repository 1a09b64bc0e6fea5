"""JDBC source configuration (SURVEY S1, S7).

The reference's replication plane reads Postgres over the wire (S1:
``pool.query`` in the workload apps) with env-templated connection
config — host/port/db/credentials as ``${VARS}`` substituted into the
ClickPipe payload (``src/tools/data_migrator.py:57-99``). Spark-first
mapping: a connection dataclass that resolves ``${VAR}`` templates from
the environment and builds a ``spark.read.jdbc`` reader with
pushdown-friendly options (predicate pushdown and column pruning reach
the remote database automatically when the filter/projection is
declarative).

No *network* database is reachable in this environment, but the full
connection path is exercised live against embedded Apache Derby (ships
in the pyspark distribution, in-JVM) in ``tests/test_jdbc_live.py``:
write → env-templated partitioned read → pushdown check → replication
snapshot. ``partition_column``/bounds wiring matters at 100 TB — an
unpartitioned JDBC read is a single-task scan.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_VAR = re.compile(r"\$\{([A-Z0-9_]+)\}")


def expand_env(template: str, env: dict[str, str] | None = None) -> str:
    """``${VAR}`` substitution (the reference's envsubst step). Missing
    variables raise — a silently-empty host is how replication configs
    end up pointing at nothing."""
    src = env if env is not None else os.environ

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in src:
            raise KeyError(f"connection template references unset ${{{name}}}")
        return src[name]

    return _VAR.sub(sub, template)


@dataclass
class JdbcSource:
    """Env-templated JDBC connection (S7) + reader factory (S1).

    ``url``/``user``/``password`` may contain ``${VAR}`` placeholders,
    resolved at reader-build time. ``partition_column`` + bounds split
    the read into ``num_partitions`` parallel range scans — required
    for any table that shouldn't be read on one task.
    """

    url: str  # e.g. jdbc:postgresql://${PGHOST}:${PGPORT}/${PGDATABASE}
    user: str = "${PGUSER}"
    password: str = "${PGPASSWORD}"
    driver: str = "org.postgresql.Driver"
    fetch_size: int = 10_000
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 32
    env: dict[str, str] | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self, table: str) -> dict[str, str]:
        """The resolved option map a reader/writer consumes."""
        opts = {
            "url": expand_env(self.url, self.env),
            "user": expand_env(self.user, self.env),
            "password": expand_env(self.password, self.env),
            "driver": self.driver,
            "dbtable": table,
            "fetchsize": str(self.fetch_size),
            **self.extra_options,
        }
        if self.partition_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    "partition_column requires lower_bound and upper_bound "
                    "(run SELECT min(pk), max(pk) on the source first)"
                )
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def reader(self, spark: SparkSession, table: str):
        """An unexecuted ``DataFrameReader`` for ``table`` — lazy, so
        Catalyst pushes filters/projections into the remote query."""
        r = spark.read.format("jdbc")
        for k, v in self.options(table).items():
            r = r.option(k, v)
        return r

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        return self.reader(spark, table).load()
