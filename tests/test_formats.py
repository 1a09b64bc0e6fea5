"""Format round-trips: every supported format must carry the orders
table through write→read with the declared schema and identical rows
(timestamps via CSV/JSON string edges included)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import SCHEMAS
from clickhouse_build_spark.sources.formats import read_source, write_sink
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders(spark):
    from clickhouse_build_spark.catalog import load_tables

    df = load_tables(spark, SF_SMOKE)["orders"].cache()
    yield df
    # unpersist: Spark's cache manager matches by plan, so a lingering
    # cached orders scan would silently replace the parquet scan in
    # OTHER tests' plans (breaking pushed-filter plan assertions)
    df.unpersist()


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, tmp_path, orders, fmt, request):
    path = str(tmp_path / fmt)
    write_sink(orders, path, fmt)
    back = read_source(spark, path, fmt, SCHEMAS["orders"])
    assert back.schema == SCHEMAS["orders"]
    want = sorted(map(tuple, orders.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_unsupported_format_rejected(spark, orders, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        read_source(spark, str(tmp_path), "avro", SCHEMAS["orders"])
    with pytest.raises(ValueError, match="unsupported"):
        write_sink(orders, str(tmp_path / "x"), "xml")


def test_malformed_csv_fails_fast(spark, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part.csv").write_text(
        "o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority\n"
        "not_a_number,1,O,10.0,2024-01-01T00:00:00,1-URGENT\n"
    )
    df = read_source(spark, str(bad), "csv", SCHEMAS["orders"])
    with pytest.raises(Exception):  # FAILFAST surfaces the bad row
        df.collect()
