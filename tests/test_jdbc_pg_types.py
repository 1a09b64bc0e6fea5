"""LIVE replication of the reference's EXACT expenses fixture schema —
Postgres-typed columns end to end (VERDICT r04 "missing" #2).

The reference's source table (``eval_repos/pg-expense-direct/
init.sql:1-8``) is::

    CREATE TABLE expenses (
      id SERIAL PRIMARY KEY,
      description TEXT NOT NULL,
      amount DECIMAL(10,2) NOT NULL,
      category VARCHAR(100),
      date DATE NOT NULL DEFAULT CURRENT_DATE,
      created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
    );

Those are exactly the types SURVEY §7.4 calls hard parts: SERIAL (an
auto-increment identity the replica must preserve, not regenerate),
DECIMAL(10,2) (exact money — a float round-trip is a wrong-answer
factory), nullable VARCHAR with the NULL→'' labeling policy, and the
dropped-``created_at``→``id`` sort substitution. Here the table is
created with real DDL in embedded Derby (SERIAL → ``GENERATED ALWAYS
AS IDENTITY``, everything else verbatim), seeded over a live JDBC
connection with planted NULL and '' categories, read back through
``JdbcSource``, snapshotted by ``Replicator``, and the reference's
stats-route queries (``app/api/expenses/stats/route.ts:27-49``) run on
the replica against a DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_build_spark.functions.dialect import (
    coalesce_sum0,
    if_empty_label,
    month_start,
    round2,
)
from clickhouse_build_spark.sources.jdbc import JdbcSource
from clickhouse_build_spark.sources.replication import Replicator, TableMapping

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

CATEGORIES = ["Food", "Transport", "Entertainment", "Utilities", None, ""]


def _rows() -> list[tuple[str, str, str | None, str]]:
    """Deterministic seed mirroring the reference's seed-database.js
    distributions: (description, amount '9999999.99'-bounded 2-dec
    string, nullable category incl. planted NULL and '', iso date)."""
    out = []
    for i in range(1, 91):
        amt = Decimal(i * 7919 % 49_999) / 100 + Decimal("0.99")
        cat = CATEGORIES[i % len(CATEGORIES)]
        day = dt.date(2024, 1, 1) + dt.timedelta(days=(i * 37) % 180)
        out.append((f"expense {i}", str(amt), cat, day.isoformat()))
    return out


ROWS = _rows()


@pytest.fixture(scope="module")
def pg_typed_url(spark, tmp_path_factory):
    """Create + seed the expenses table with REAL DDL over a live JDBC
    connection (py4j → java.sql), Postgres types translated to Derby:
    SERIAL → INT GENERATED ALWAYS AS IDENTITY; TEXT → VARCHAR(32672)
    (Derby's widest VARCHAR); DECIMAL/VARCHAR/DATE/TIMESTAMP verbatim.
    Identifiers are quoted lowercase to preserve the PG names."""
    db_dir = tmp_path_factory.mktemp("derby_pg") / "expensesdb"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute(
            'CREATE TABLE expenses ('
            '"id" INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, '
            '"description" VARCHAR(32672) NOT NULL, '
            '"amount" DECIMAL(10,2) NOT NULL, '
            '"category" VARCHAR(100), '
            '"date" DATE NOT NULL, '
            '"created_at" TIMESTAMP DEFAULT CURRENT_TIMESTAMP)'
        )
        st.close()
        ps = conn.prepareStatement(
            'INSERT INTO expenses ("description", "amount", "category", "date") '
            "VALUES (?, ?, ?, ?)"
        )
        for desc, amt, cat, day in ROWS:
            ps.setString(1, desc)
            ps.setBigDecimal(2, jvm.java.math.BigDecimal(amt))
            if cat is None:
                ps.setNull(3, jvm.java.sql.Types.VARCHAR)
            else:
                ps.setString(3, cat)
            ps.setDate(4, jvm.java.sql.Date.valueOf(day))
            ps.executeUpdate()
        ps.close()
    finally:
        conn.close()
    return url


@pytest.fixture(scope="module")
def expenses_df(spark, pg_typed_url):
    src = JdbcSource(url=pg_typed_url, user="app", password="app", driver=DERBY_DRIVER)
    return src.load(spark, "expenses")


def test_pg_type_mapping_survives_jdbc(expenses_df):
    """The exact init.sql types arrive with faithful Spark types —
    DECIMAL(10,2) must stay decimal (not double), SERIAL ids must be
    the database-assigned sequence, category must stay nullable."""
    dtypes = dict(expenses_df.dtypes)
    assert dtypes["id"] == "int"
    assert dtypes["amount"] == "decimal(10,2)"
    assert dtypes["category"] == "string"
    assert dtypes["date"] == "date"
    assert dtypes["created_at"] == "timestamp"
    schema = {f.name: f for f in expenses_df.schema.fields}
    assert schema["category"].nullable
    ids = [r.id for r in expenses_df.select("id").orderBy("id").collect()]
    assert ids == list(range(1, len(ROWS) + 1))  # identity preserved, no regen
    # planted NULLs arrive as NULL, planted '' as '' — NOT collapsed
    cats = expenses_df.groupBy("category").count().collect()
    by_cat = {r.category: r["count"] for r in cats}
    assert None in by_cat and "" in by_cat
    assert by_cat[None] == sum(1 for r in ROWS if r[2] is None)
    assert by_cat[""] == sum(1 for r in ROWS if r[2] == "")


def test_decimal_sum_is_exact(expenses_df):
    """Summing DECIMAL(10,2) in Spark must reproduce exact Decimal
    arithmetic — the float path would drift on ~90 two-decimal adds."""
    got = expenses_df.agg(F.sum("amount").alias("t")).collect()[0].t
    want = sum(Decimal(r[1]) for r in ROWS)
    assert Decimal(str(got)) == want


@pytest.fixture(scope="module")
def replica(spark, expenses_df, tmp_path_factory):
    """Replicate the live table, applying the reference migration's
    column policy: ``created_at`` is dropped (the CH target omits it;
    sort substitution rewrites its ORDER BY uses to ``id``)."""
    root = tmp_path_factory.mktemp("expenses_pg_replica")
    rep = Replicator(
        spark=spark,
        target_root=str(root),
        key_cols=["id"],
        version_col="date",
    )
    mapping = TableMapping("public", "expenses", "expenses")
    rep.snapshot(expenses_df.drop("created_at"), mapping)
    path = rep._target_path(mapping)
    return rep.read(mapping), path


def _duck(path: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW expenses AS SELECT * FROM read_parquet('{path}/*/*.parquet')"
    )
    return con


def test_stats_route_total_matches_oracle(replica):
    """stats route query 1: COUNT(*) + COALESCE(SUM(amount), 0)."""
    df, path = replica
    got = df.agg(
        F.count("*").alias("cnt"), round2(coalesce_sum0("amount")).alias("total")
    ).collect()[0]
    want = _duck(path).execute(
        "SELECT count(*), round(COALESCE(sum(CAST(amount AS DOUBLE)), 0), 2) FROM expenses"
    ).fetchone()
    assert (got.cnt, got.total) == want


def test_stats_route_category_rollup_null_policy(replica):
    """stats route query 2 with the engine's A9 policy: NULL *and* ''
    both label as 'Uncategorized' (the CH target drops Nullable, so
    NULL arrives as '' post-migration — SURVEY §7.4 hard part #3)."""
    df, path = replica
    got = {
        (r.category, r.cnt, r.total)
        for r in df.groupBy(
            if_empty_label("category", "Uncategorized").alias("category")
        )
        .agg(F.count("*").alias("cnt"), round2(coalesce_sum0("amount")).alias("total"))
        .collect()
    }
    want = set(
        map(
            tuple,
            _duck(path)
            .execute(
                """
                SELECT CASE WHEN category IS NULL OR category = ''
                            THEN 'Uncategorized' ELSE category END AS category,
                       count(*) AS cnt,
                       round(COALESCE(sum(CAST(amount AS DOUBLE)), 0), 2) AS total
                FROM expenses GROUP BY 1
                """
            )
            .fetchall(),
        )
    )
    assert got == want
    uncategorized = {c: n for c, n, _ in got}["Uncategorized"]
    assert uncategorized == sum(1 for r in ROWS if not r[2])  # NULL + ''


def test_stats_route_monthly_matches_oracle(replica):
    """stats route query 3: DATE_TRUNC('month', date) rollup."""
    df, path = replica
    got = {
        (r.month.isoformat(), r.cnt, r.total)
        for r in df.groupBy(month_start("date").alias("month"))
        .agg(F.count("*").alias("cnt"), round2(coalesce_sum0("amount")).alias("total"))
        .collect()
    }
    want = {
        (m.isoformat(), c, t)
        for m, c, t in _duck(path)
        .execute(
            """
            SELECT CAST(date_trunc('month', date) AS DATE) AS month,
                   count(*) AS cnt,
                   round(COALESCE(sum(CAST(amount AS DOUBLE)), 0), 2) AS total
            FROM expenses GROUP BY 1
            """
        )
        .fetchall()
    }
    assert got == want


def test_sort_substitution_after_created_at_drop(replica):
    """The list route orders by ``date DESC`` with a ``created_at``
    tiebreak; ``created_at`` doesn't survive migration, so the engine
    substitutes ``id`` (O2; the reference made the same rewrite —
    ``corpus/orm_none.txt:541``). The replica has no created_at column
    and the substituted ordering is deterministic and oracle-matched."""
    df, path = replica
    assert "created_at" not in df.columns
    got = [
        (r.id, r.date.isoformat())
        for r in df.select("id", "date").orderBy(F.desc("date"), F.desc("id")).collect()
    ]
    want = [
        (i, d.isoformat())
        for i, d in _duck(path)
        .execute("SELECT id, date FROM expenses ORDER BY date DESC, id DESC")
        .fetchall()
    ]
    assert got == want
