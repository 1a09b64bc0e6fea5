"""CH meta-statement surface: SHOW TABLES / DESCRIBE / EXISTS /
SHOW CREATE / EXPLAIN variants against the engine catalog."""

from __future__ import annotations

import pytest

from clickhouse_build_spark.engine import Engine
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(SF_SMOKE, spark=spark)


def test_show_tables_lists_catalog_views(engine):
    names = [r["name"] for r in engine.sql("SHOW TABLES", dialect="clickhouse").collect()]
    for t in ("orders", "lineitem", "documents", "events", "embeddings"):
        assert t in names
    assert names == sorted(names)


def test_show_tables_like_pattern(engine):
    names = [
        r["name"]
        for r in engine.sql(
            "SHOW TABLES LIKE 'o%'", dialect="clickhouse"
        ).collect()
    ]
    assert names == ["orders"]


def test_describe_maps_types_to_clickhouse_names(engine):
    rows = {
        r["name"]: r["type"]
        for r in engine.sql("DESCRIBE events", dialect="clickhouse").collect()
    }
    assert "Int64" in rows["event_id"]
    assert "DateTime64(6)" in rows["ts"]
    assert "Float64" in rows["value"]
    assert "String" in rows["event_type"]


def test_describe_embeddings_array_type(engine):
    rows = {
        r["name"]: r["type"]
        for r in engine.sql(
            "DESC TABLE embeddings", dialect="clickhouse"
        ).collect()
    }
    emb = [v for k, v in rows.items() if v.startswith("Array")]
    assert emb and emb[0] in ("Array(Float32)", "Array(Float64)")


def test_exists_table(engine):
    assert (
        engine.sql("EXISTS TABLE orders", dialect="clickhouse").first()["result"]
        == 1
    )
    assert (
        engine.sql("EXISTS no_such_tbl", dialect="clickhouse").first()["result"]
        == 0
    )


def test_describe_unknown_table_is_loud(engine):
    with pytest.raises(ValueError, match="unknown table"):
        engine.sql("DESCRIBE nope", dialect="clickhouse")


def test_show_create_table_emits_mergetree_ddl(engine):
    stmt = engine.sql("SHOW CREATE TABLE nation", dialect="clickhouse").first()[
        "statement"
    ]
    assert stmt.startswith("CREATE TABLE nation")
    assert "ENGINE = MergeTree" in stmt and "n_nationkey" in stmt


def test_explain_syntax_returns_translated_sql(engine):
    rows = [
        r["explain"]
        for r in engine.sql(
            "EXPLAIN SYNTAX SELECT toStartOfMonth(o_orderdate) AS m, count() "
            "FROM orders GROUP BY m",
            dialect="clickhouse",
        ).collect()
    ]
    joined = " ".join(rows)
    assert "date_trunc" in joined and "count(*)" in joined
    assert "toStartOfMonth" not in joined


def test_explain_plan_returns_spark_physical_plan(engine):
    plan = engine.sql(
        "EXPLAIN SELECT count() FROM orders", dialect="clickhouse"
    ).first()["explain"]
    assert "AdaptiveSparkPlan" in plan or "Physical Plan" in plan


def test_explain_ast_maps_to_extended(engine):
    plan = engine.sql(
        "EXPLAIN AST SELECT count() FROM orders", dialect="clickhouse"
    ).first()["explain"]
    assert "Parsed Logical Plan" in plan or "logical" in plan.lower()


def test_meta_statements_do_not_shadow_queries(engine):
    # a normal query containing the word EXPLAIN in a literal
    n = engine.sql(
        "SELECT count() AS n FROM orders WHERE o_orderstatus != 'EXPLAIN'",
        dialect="clickhouse",
    ).first()["n"]
    assert n > 0
