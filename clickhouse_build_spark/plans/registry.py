"""Query registry — the engine's equivalent of the reference's scan output.

The reference materializes its query inventory as
``QueryAnalysisResult{queries[{description, code, location}]}``
(``src/agents/scanner.py:42-50``) and validates each against golden
output. Here a registered query is a named (Spark builder, oracle SQL)
pair; the driver hash-matches the two at sf0.01 (BASELINE.md t2).

Column-name contract: the Spark result and the oracle result are compared
after sorting columns by name, so every computed column must carry the
SAME alias on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB-runnable ANSI SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder with its DuckDB oracle."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return wrap
