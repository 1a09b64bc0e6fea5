"""JDBC source config tests — reader construction and env templating
(no database is reachable here; the connection itself is exercised in
production, the option wiring is exercised now)."""

from __future__ import annotations

import pytest

from clickhouse_build_spark.sources.jdbc import JdbcSource, expand_env

ENV = {
    "PGHOST": "db.internal",
    "PGPORT": "5432",
    "PGDATABASE": "appdb",
    "PGUSER": "replicator",
    "PGPASSWORD": "hunter2",
}


def test_expand_env_substitutes_and_fails_loudly():
    assert (
        expand_env("jdbc:postgresql://${PGHOST}:${PGPORT}/${PGDATABASE}", ENV)
        == "jdbc:postgresql://db.internal:5432/appdb"
    )
    with pytest.raises(KeyError, match="UNSET_VAR"):
        expand_env("${UNSET_VAR}", ENV)


def test_options_resolve_connection_and_partitioning():
    src = JdbcSource(
        url="jdbc:postgresql://${PGHOST}:${PGPORT}/${PGDATABASE}",
        env=ENV,
        partition_column="id",
        lower_bound=1,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    opts = src.options("public.expenses")
    assert opts["url"] == "jdbc:postgresql://db.internal:5432/appdb"
    assert opts["user"] == "replicator"
    assert opts["dbtable"] == "public.expenses"
    assert (opts["partitionColumn"], opts["lowerBound"], opts["upperBound"]) == (
        "id",
        "1",
        "1000000",
    )
    assert opts["numPartitions"] == "16"


def test_partition_column_requires_bounds():
    src = JdbcSource(url="jdbc:x", user="u", password="p", partition_column="id", env={})
    with pytest.raises(ValueError, match="lower_bound"):
        src.options("t")


def test_reader_builds_lazily(spark):
    src = JdbcSource(
        url="jdbc:postgresql://${PGHOST}/${PGDATABASE}", env=ENV
    )
    # building the reader must not attempt a connection
    r = src.reader(spark, "public.expenses")
    assert r is not None
