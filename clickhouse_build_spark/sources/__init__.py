from clickhouse_build_spark.sources.replication import (
    ReplicationMode,
    Replicator,
    TableMapping,
)

__all__ = ["ReplicationMode", "Replicator", "TableMapping"]
