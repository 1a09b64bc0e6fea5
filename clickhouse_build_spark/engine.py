"""Engine facade — the user-facing API surface (SURVEY §3 lifecycle).

Maps the reference's three capabilities onto one object:

- ``sql(text, params)``   — the analytical query endpoint (S2: the
  ClickHouse-client ``query({query, query_params})`` analogue; named
  parameters bind via Spark's parameterized SQL).
- ``register(name, fn)`` / ``run(name)`` — the registered-query
  inventory (the scan result made executable; ``src/agents/scanner.py:42-50``).
- ``replicate(...)``      — S3-S5/C1-C4 via ``sources.replication``.
- ``insert(...)``         — **refuses**: the reference's OLAP strategy
  throws on writes ("createExpense ... not supported in ClickHouse
  analytics mode", ``src/corpus/orm_none.txt:553-557``); OLTP writes
  stay on the OLTP store (S8). Bulk ``write_table`` exists for
  replication-style append only.
- ``to_rows(df)``         — S9 result sink: rows as JSON-ish dicts with
  the reference's edge coercions (count→int, totals→float; F9).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_build_spark.catalog import Catalog
from clickhouse_build_spark.session import get_spark
from clickhouse_build_spark.sources.replication import (
    ReplicationMode,
    Replicator,
    TableMapping,
)


class AnalyticalWriteError(RuntimeError):
    """OLTP writes are not supported on the analytical engine (S8)."""


class Engine:
    def __init__(
        self,
        sf_dir: str,
        spark: SparkSession | None = None,
        table_mappings: dict[str, str] | None = None,
    ):
        self.spark = spark or get_spark()
        self.catalog = Catalog(
            self.spark, sf_dir, table_mappings=dict(table_mappings or {})
        ).register_all()
        self._registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
        self.sf_dir = sf_dir

    # -------------------------------------------------------------- queries

    def sql(
        self,
        text: str,
        params: dict[str, Any] | list[Any] | None = None,
        dialect: str = "spark",
    ) -> DataFrame:
        """Parameterized SQL over the registered views (P7: the
        ``{name:Type}`` ClickHouse binding style maps to Spark named
        parameter markers ``:name``).

        ``dialect="clickhouse"`` accepts the reference's CH-dialect
        strings verbatim (``toStartOfMonth``, ``if(empty(...))``, bare
        ``count()``, ``{name:Type}`` params — the golden-corpus forms)
        via :func:`clickhouse_build_spark.functions.chsql.translate_ch_sql`.

        ``dialect="postgres"`` accepts the apps' PG strings (``$N``
        positional params — bind with a list — and ``expr::type``
        casts; ``eval_repos/pg-expense-direct/app/api/...`` forms) via
        :func:`clickhouse_build_spark.functions.chsql.translate_pg_sql`.
        """
        if dialect == "clickhouse":
            from clickhouse_build_spark.functions.chmeta import try_ch_meta
            from clickhouse_build_spark.functions.chsql import translate_ch_sql

            meta = try_ch_meta(self.spark, self.catalog, text)
            if meta is not None:
                return meta
            text = translate_ch_sql(text)
        elif dialect == "postgres":
            from clickhouse_build_spark.functions.chsql import (
                _pg_column_types,
                translate_pg_sql,
            )

            coltypes = (
                _pg_column_types(self.spark, text) if "/" in text else None
            )
            text = translate_pg_sql(text, column_types=coltypes)
        elif dialect != "spark":
            raise ValueError(f"unknown dialect {dialect!r}")
        if isinstance(params, (list, tuple)):
            params = {f"p{i + 1}": v for i, v in enumerate(params)}
        if params:
            return self.spark.sql(text, args=params)
        return self.spark.sql(text)

    def table(self, name: str) -> DataFrame:
        return self.catalog.load(name)

    def register(
        self, name: str, fn: Callable[[SparkSession, str], DataFrame]
    ) -> None:
        self._registry[name] = fn

    def run(self, name: str) -> DataFrame:
        return self._registry[name](self.spark, self.sf_dir)

    # -------------------------------------------------------------- results

    @staticmethod
    def to_rows(df: DataFrame, limit: int | None = None) -> list[dict[str, Any]]:
        """S9/F9: rows to app-shaped dicts. The reference's apps coerce at
        the edge (``parseInt(row.count)``, ``parseFloat(row.total)``,
        ``…stats/route.ts:71-88``); Spark types already arrive as
        int/float so the mapping is direct."""
        if limit is not None:
            df = df.limit(limit)
        return [row.asDict(recursive=True) for row in df.collect()]

    # -------------------------------------------------------------- writes

    def insert(self, *_args: Any, **_kwargs: Any) -> None:
        """Per-row OLTP insert — deliberately unsupported, mirroring the
        reference's ClickHouse strategy throw (``corpus/orm_none.txt:553-557``):
        writes belong on the OLTP store; reads route here."""
        raise AnalyticalWriteError(
            "createExpense-style OLTP writes are not supported in analytics "
            "mode — write to the OLTP source and replicate (SURVEY S8)"
        )

    def write_table(self, df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
        """Replication-style bulk append sink (the only sanctioned write)."""
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    # ---------------------------------------------------------- replication

    def replicator(
        self,
        target_root: str,
        key_cols: list[str],
        version_col: str,
        n_buckets: int = 32,
    ) -> Replicator:
        return Replicator(
            spark=self.spark,
            target_root=target_root,
            key_cols=key_cols,
            version_col=version_col,
            n_buckets=n_buckets,
        )

    def replicate(
        self,
        source: DataFrame,
        mapping: TableMapping,
        target_root: str,
        key_cols: list[str],
        version_col: str,
        mode: ReplicationMode | str = ReplicationMode.SNAPSHOT,
        changes: DataFrame | None = None,
    ) -> str:
        """C4 mode-switch entry point (``main.py:197-202`` CLI analogue)."""
        rep = self.replicator(target_root, key_cols, version_col)
        return rep.replicate(source, mapping, mode=mode, changes=changes)
