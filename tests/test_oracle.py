"""t2-style correctness: every registered query with an oracle must match
DuckDB on the same parquet (order-insensitive canonical compare).

Runs at sf0.001 by default (fast inner loop); set
``TEST_SF_DIR=/root/testdata/sf0.01`` to mirror the driver's gate.
"""

from __future__ import annotations

import pytest

from clickhouse_build_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duckdb_connect

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, con, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_SMOKE)
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark):
    for name, spec in REGISTRY.items():
        n = spec.builder(spark, SF_SMOKE).count()
        assert n >= 0, name
