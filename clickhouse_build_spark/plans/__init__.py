"""Registered analytical queries (the engine's query surface).

``registry`` collects every query as a (builder, oracle-SQL) pair; the
driver's correctness gate runs both sides at sf0.01. Importing this
package loads all query modules so the registry is complete.
"""

from clickhouse_build_spark.plans.registry import REGISTRY, QuerySpec, query

# Import for registration side effects — each module adds its QuerySpecs.
from clickhouse_build_spark.plans import parity  # noqa: E402,F401
from clickhouse_build_spark.plans import relational  # noqa: E402,F401
from clickhouse_build_spark.plans import tpch_extra  # noqa: E402,F401
from clickhouse_build_spark.plans import windows  # noqa: E402,F401
from clickhouse_build_spark.plans import events  # noqa: E402,F401
from clickhouse_build_spark.plans import textops  # noqa: E402,F401
from clickhouse_build_spark.plans import similarity  # noqa: E402,F401
from clickhouse_build_spark.plans import dedup  # noqa: E402,F401
from clickhouse_build_spark.plans import multimodal  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
