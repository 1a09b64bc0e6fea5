from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("TEST_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from clickhouse_build_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: scale-smoke rungs (minutes, still in the gate)"
    )
