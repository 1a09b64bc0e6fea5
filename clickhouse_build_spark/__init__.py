"""clickhouse_build_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
(``ClickHouse/clickhouse.build``, an agentic Postgres→ClickHouse migration
CLI) as a Spark-first engine:

- the analytical query surface the reference detects/translates/validates
  (filtered scans, global + grouped aggregates, expression GROUP BYs,
  ordered/limited results, the PG↔ClickHouse scalar dialect) — executed
  natively on Spark DataFrames (``plans/``),
- snapshot / CDC / cdc_only replication semantics (``sources/``),
- plus large-scale training-data-pipeline operators: dedup, similarity
  search, text analysis, multimodal plumbing (``operators/``), and
  event-time windowing (``streaming/``).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, AQE and codegen; Python stays out of the hot path.
"""

from clickhouse_build_spark.catalog import Catalog, TABLE_NAMES
from clickhouse_build_spark.engine import AnalyticalWriteError, Engine
from clickhouse_build_spark.migrator import ReplicationPlan, plan_replication
from clickhouse_build_spark.session import get_spark
from clickhouse_build_spark.sources.replication import (
    ReplicationMode,
    Replicator,
    TableMapping,
)

__all__ = [
    "AnalyticalWriteError",
    "Catalog",
    "Engine",
    "ReplicationMode",
    "ReplicationPlan",
    "Replicator",
    "TABLE_NAMES",
    "TableMapping",
    "get_spark",
    "plan_replication",
]
__version__ = "0.1.0"
