"""Real-app scanner/emitter fixture (VERDICT r12 next-round #1).

The reference's own external eval surface is six production OSS apps
(``/root/reference/clone_test_oss_repos.sh:8-49`` — cal.com, formbricks,
dub, twenty, rallly, plane). Those repos add shapes the three golden
eval apps and the r12 hostile fixture never exercise: ORM calls split
across a service layer, kysely/knex string-named builder chains, and
``.sql`` files carrying analytical view definitions and saved reporting
queries. ``tests/fixtures/pg-real-app`` vendors a deterministic slice
of each; the contract stays find-or-fail-loudly:

- the scanner finds all six analytical sites, extracts exactly the two
  real tables (kysely's string-named ``selectFrom``/``innerJoin`` and
  knex's ``knex('expenses')`` head included), reports NOTHING from the
  thin route file, the ``migrations/`` dir, or plain ``CREATE TABLE``
  DDL;
- the emitter round-trips the four translatable sites (inline prisma
  groupBy; the saved raw reporting query; r13b: the kysely JOIN
  aggregate and the knex daily rollup, each derived into raw PG SQL
  with the ${whereClause} splice) with CH rows == PG rows on a planted
  corpus, and fails LOUDLY with a documented reason on the two it
  cannot translate faithfully (opts-object groupBy, splice-less view
  body) plus deferred/untranslatable builder shapes;
- the analytical VIEW body still executes row-equal through BOTH
  dialect arms of the engine — the emit refusal is about the method
  contract (no DateFilter splice), not executability.
"""

from __future__ import annotations

import datetime as dt
import pathlib
import random

import pytest
from pyspark.sql import types as T

from clickhouse_build_spark.code_emitter import build_method_specs
from clickhouse_build_spark.scanner import scan_repo

APP = pathlib.Path(__file__).parent / "fixtures" / "pg-real-app"


@pytest.fixture(scope="module")
def scan():
    return scan_repo(str(APP))


def _spec_for(scan, loc_prefix):
    q = next(q for q in scan.queries if q.location.startswith(loc_prefix))
    return {
        "description": q.description,
        "code": q.code,
        "location": q.location,
    }


def test_scanner_finds_all_eleven_sites(scan):
    locs = sorted(q.location for q in scan.queries)
    prefixes = [
        "db/views.sql:L1-",          # CREATE VIEW ... GROUP BY
        "db/views.sql:L18-",         # saved reporting query
        "lib/legacy.ts:L5-",         # knex chain
        "lib/legacy.ts:L14-",        # knex object-where (r16)
        "lib/reporting.ts:L6-",      # kysely chain
        "lib/reporting.ts:L23-",     # kysely callback-where (r16)
        "services/insights.ts:L5-",  # inline prisma groupBy
        "services/insights.ts:L23-",  # opts-object groupBy
        "services/metrics.ts:L7-",   # typeorm .from('expenses') chain
        "services/metrics.ts:L24-",  # typeorm repository chain (r14)
        "services/metrics.ts:L37-",  # typeorm :param binds (r16)
    ]
    assert len(locs) == 11
    for want in prefixes:
        matches = [l for l in locs if l.startswith(want)]
        assert len(matches) == 1, (want, locs)


def test_thin_route_and_migrations_contribute_nothing(scan):
    for q in scan.queries:
        assert not q.location.startswith("app/"), q.location
        assert not q.location.startswith("migrations/"), q.location


def test_tables_exact_no_phantoms(scan):
    # kysely string-named sources and the knex head both extract;
    # 'month'/'day'/aliases and the CREATE TABLE DDL contribute nothing
    assert scan.tables == ["categories", "expenses"]


def test_untranslatable_shapes_fail_loudly(scan):
    with pytest.raises(ValueError, match="neither raw SQL"):
        build_method_specs([_spec_for(scan, "services/insights.ts:L23")])
    # the view body IS extractable SQL but has no DateFilter splice
    # point — the method contract refuses it rather than emitting a
    # method that silently ignores its filter argument
    with pytest.raises(ValueError, match="no DateFilter splice point"):
        build_method_specs([_spec_for(scan, "db/views.sql:L1")])
    # deferred builders (assigned without await) stay loud for kysely
    # and knex too, same as the drizzle split-chain contract
    with pytest.raises(ValueError, match="deferred kysely builder"):
        build_method_specs(
            [
                {
                    "description": "x",
                    "location": "x:L1-3",
                    "code": "const base = db\n  .selectFrom('expenses')\n"
                    "  .select(['category'])",
                }
            ]
        )
    with pytest.raises(ValueError, match="untranslatable kysely"):
        build_method_specs(
            [
                {
                    "description": "x",
                    "location": "x:L1-2",
                    "code": "const r = await db.selectFrom('expenses')"
                    ".select([eb => eb.fn.agg('corr', ['a','b'])])"
                    ".groupBy('category')",
                }
            ]
        )


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(17)
    cats = [(1, "Food"), (2, "Transport"), (3, "Utilities")]
    spark.createDataFrame(cats, "id long, name string").createOrReplaceTempView(
        "categories"
    )
    rows = [
        (
            i,
            round(rng.uniform(1, 300), 2),
            rng.choice(["Food", "Transport", "Utilities", None]),
            rng.choice([1, 2, 3]),
            dt.date(2024, 1, 1) + dt.timedelta(days=rng.randrange(120)),
        )
        for i in range(1, 201)
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("category", T.StringType()),
            T.StructField("category_id", T.LongType()),
            T.StructField("date", T.DateType()),
        ]
    )
    spark.createDataFrame(rows, schema).createOrReplaceTempView("expenses")
    return spark


def _rows_equal(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(tuple(g), tuple(w)):
            if isinstance(gv, float):
                assert gv == pytest.approx(wv, rel=1e-9)
            else:
                assert gv == wv


def _engine(spark):
    from clickhouse_build_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    return Engine(SF_SMOKE, spark=spark)


def test_prisma_service_site_roundtrips(scan, planted):
    (s,) = build_method_specs([_spec_for(scan, "services/insights.ts:L5")])
    eng = _engine(planted)
    got = eng.sql(s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql.replace("${whereClause}", ""), dialect="postgres").collect()
    _rows_equal(got, want)
    assert len(got) == 4  # 3 categories + NULL bucket
    assert got[0]["total"] >= got[-1]["total"]


def test_saved_sql_report_roundtrips(scan, planted):
    (s,) = build_method_specs([_spec_for(scan, "db/views.sql:L18")])
    eng = _engine(planted)
    got = eng.sql(s.ch_sql, dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql, dialect="postgres").collect()
    _rows_equal(got, want)
    assert len(got) == 4


def test_view_body_executes_row_equal_on_both_arms(scan, planted):
    from clickhouse_build_spark.code_emitter import extract_sql

    q = next(q for q in scan.queries if q.location.startswith("db/views.sql:L1"))
    body = extract_sql(q.code)
    assert body is not None and body.upper().startswith("SELECT")
    eng = _engine(planted)
    order = " ORDER BY month, category NULLS FIRST"
    got = eng.sql(body + order, dialect="clickhouse").collect()
    want = eng.sql(body + order, dialect="postgres").collect()
    _rows_equal(got, want)
    assert len(got) > 0


def test_kysely_join_aggregate_roundtrips(scan, planted):
    """r13b: the kysely chain is now EMITTED (derived raw PG SQL with
    the ${whereClause} splice), not a loud failure — and its CH arm
    row-equals the PG arm on the planted corpus."""
    (s,) = build_method_specs([_spec_for(scan, "lib/reporting.ts:")])
    assert s.orm == "kysely"
    assert "JOIN categories ON categories.id = expenses.category_id" in s.pg_sql
    eng = _engine(planted)
    got = eng.sql(s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql.replace("${whereClause}", ""), dialect="postgres").collect()
    _rows_equal(got, want)
    assert len(got) == 3 and got[0]["total"] >= got[-1]["total"]


def test_knex_daily_rollup_roundtrips(scan, planted):
    (s,) = build_method_specs([_spec_for(scan, "lib/legacy.ts:")])
    assert s.orm == "knex"
    assert "DATE_TRUNC('day', date) AS day" in s.pg_sql
    eng = _engine(planted)
    got = eng.sql(s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql.replace("${whereClause}", ""), dialect="postgres").collect()
    _rows_equal(got, want)
    days = [r["day"] for r in got]
    assert len(days) > 30 and days == sorted(days)


def test_builder_filters_never_silently_dropped():
    """r13c audit, r15b upgrade: a chain method the translator does
    NOT understand must fail loudly — emitting without it would return
    MORE rows than the app's query. Literal .where() shapes now
    TRANSLATE into the WHERE 1=1 arm instead (same found-or-loud
    ratchet as Django's filter); non-literal wheres stay loud."""
    (s1,) = build_method_specs(
        [{
            "description": "x", "location": "x:L1",
            "code": "const r = await db.selectFrom('expenses')"
            ".select(['category']).where('status', '=', 'paid')"
            ".groupBy('category')",
        }]
    )
    assert "WHERE 1=1 AND status = 'paid'" in s1.pg_sql
    (s2,) = build_method_specs(
        [{
            "description": "x", "location": "x:L1",
            "code": "return knex('expenses').sum('amount as total')"
            ".where('status', 'paid').groupBy('category')",
        }]
    )
    assert "WHERE 1=1 AND status = 'paid'" in s2.pg_sql
    for code, pat in [
        (
            "const r = await db.selectFrom('expenses')"
            ".select(['category']).distinctOn('category')",
            "kysely chain method .distinctOn",
        ),
        (
            "const r = await db.selectFrom('expenses')"
            ".select(['category']).where(eb => dynamicCond)",
            "kysely .where callback",
        ),
        (
            "return knex('expenses').sum('amount as total')"
            ".where('status', '=', someVar)",
            "untranslatable builder literal",
        ),
    ]:
        with pytest.raises(ValueError, match=__import__("re").escape(pat)):
            build_method_specs(
                [{"description": "x", "location": "x:L1", "code": code}]
            )


def test_typeorm_from_chain_roundtrips(scan, planted):
    """r14 (VERDICT #3): the TypeORM ``createQueryBuilder().from(
    'expenses', 'e')`` chain is parsed into the same canonical raw-SQL
    spec as kysely/knex — and its CH arm row-equals the PG arm on the
    planted corpus."""
    (s,) = build_method_specs([_spec_for(scan, "services/metrics.ts:L7")])
    assert s.orm == "typeorm"
    assert "FROM expenses e" in s.pg_sql
    assert "SUM(e.amount) AS total" in s.pg_sql
    eng = _engine(planted)
    got = eng.sql(s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql.replace("${whereClause}", ""), dialect="postgres").collect()
    _rows_equal(got, want)
    assert len(got) == 4  # 3 categories + NULL bucket
    assert got[0]["total"] >= got[-1]["total"]


def test_typeorm_repository_chain_fails_loudly(scan):
    """The repository-scoped builder names NO table in the chain (it
    lives in the @Entity decorator) — WITHOUT repo context, emit
    refuses with the reason, never guesses a table from the alias."""
    with pytest.raises(ValueError, match="entity's table name"):
        build_method_specs([_spec_for(scan, "services/metrics.ts:L24")])


def test_typeorm_repository_chain_emits_with_visible_entity(scan, planted):
    """r15 (VERDICT #3): with the repo visible, the receiver's
    ``getRepository(Expense)`` binding + the ``@Entity('expenses')``
    declaration in entities/expense.ts resolve the table — the chain
    emits and its CH arm row-equals the PG arm on the planted corpus."""
    (s,) = build_method_specs(
        [_spec_for(scan, "services/metrics.ts:L24")], repo_path=str(APP)
    )
    assert s.orm == "typeorm"
    assert "FROM expenses expense" in s.pg_sql
    assert "AVG(expense.amount) AS avg_amount" in s.pg_sql
    eng = _engine(planted)
    got = eng.sql(
        s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse"
    ).collect()
    want = eng.sql(
        s.pg_sql.replace("${whereClause}", ""), dialect="postgres"
    ).collect()
    _rows_equal(got, want)
    assert len(got) == 4  # four months planted
    assert [r["month"] for r in got] == sorted(r["month"] for r in got)


def test_typeorm_invisible_entity_stays_loud(tmp_path):
    """A repository chain whose entity declaration is NOT in the repo
    keeps the loud refusal even with repo context."""
    svc = tmp_path / "svc.ts"
    svc.write_text(
        "import { AuditLog } from 'some-external-package';\n"
        "export async function f() {\n"
        "  const repo = dataSource.getRepository(AuditLog);\n"
        "  const rows = await repo\n"
        "    .createQueryBuilder('a')\n"
        "    .select('COUNT(*)', 'n')\n"
        "    .groupBy('a.kind')\n"
        "    .getRawMany();\n"
        "  return rows;\n"
        "}\n"
    )
    with pytest.raises(ValueError, match="entity's table name"):
        build_method_specs(
            [
                {
                    "description": "x",
                    "location": "svc.ts:L4-8",
                    "code": "const rows = await repo\n"
                    "    .createQueryBuilder('a')\n"
                    "    .select('COUNT(*)', 'n')\n"
                    "    .groupBy('a.kind')\n"
                    "    .getRawMany()",
                }
            ],
            repo_path=str(tmp_path),
        )


def test_typeorm_untranslatable_shapes_fail_loudly():
    # r16: a LITERAL bind object now splices at scan time; a DYNAMIC
    # bind (identifier value or a params variable) stays loud
    with pytest.raises(ValueError, match="untranslatable builder literal"):
        build_method_specs(
            [
                {
                    "description": "x",
                    "location": "x:L1",
                    "code": "const r = await ds.createQueryBuilder()"
                    ".from('expenses', 'e').select('COUNT(*)', 'n')"
                    ".where('e.status = :s', { s: reqStatus })",
                }
            ]
        )
    with pytest.raises(ValueError, match="must be a literal object"):
        build_method_specs(
            [
                {
                    "description": "x",
                    "location": "x:L1",
                    "code": "const r = await ds.createQueryBuilder()"
                    ".from('expenses', 'e').select('COUNT(*)', 'n')"
                    ".where('e.status = :s', params)",
                }
            ]
        )
    with pytest.raises(ValueError, match="no literal binding"):
        build_method_specs(
            [
                {
                    "description": "x",
                    "location": "x:L1",
                    "code": "const r = await ds.createQueryBuilder()"
                    ".from('expenses', 'e').select('COUNT(*)', 'n')"
                    ".where('e.status = :s AND e.kind = :k', { s: 'paid' })",
                }
            ]
        )
    # deferred builder (assigned without await)
    with pytest.raises(ValueError, match="deferred typeorm builder"):
        build_method_specs(
            [
                {
                    "description": "x",
                    "location": "x:L1",
                    "code": "const base = ds.createQueryBuilder()"
                    ".from('expenses', 'e').select('COUNT(*)', 'n')",
                }
            ]
        )
    # repository aggregate: table not visible in the call
    with pytest.raises(ValueError, match="repository aggregate"):
        build_method_specs(
            [
                {
                    "description": "x",
                    "location": "x:L1",
                    "code": "const total = await repo.sum('amount', "
                    "{ status: 'paid' })",
                }
            ]
        )


def test_chain_args_never_silently_dropped():
    """ADVICE r15 (high): a chain method whose NAME is allowlisted but
    whose ARGUMENTS miss the parse regexes must raise, never vanish
    from the emitted SQL — a backtick-quoted projection or a
    non-literal .limit(n) would otherwise silently change the row set.
    A join followed by a trailing // comment must parse (not drop)."""
    head = (
        "const r = await ds.createQueryBuilder().from('expenses', 'e')"
        ".select('e.category', 'category')"
    )
    # positive: trailing // comment after the join's ')' still parses
    (s,) = build_method_specs(
        [
            {
                "description": "x",
                "location": "x:L1",
                "code": head
                + ".innerJoin('users', 'u', 'u.id = e.user_id') // join the owners\n"
                + ".groupBy('e.category')",
            }
        ]
    )
    assert "JOIN users u ON u.id = e.user_id" in s.pg_sql
    for code, why in [
        # backtick-quoted addSelect loses the SUM projection
        (
            head + ".addSelect(`SUM(e.amount)`, 'total').groupBy('e.category')",
            r"2 \.select\|addSelect",
        ),
        # non-literal limit
        (head + ".limit(pageSize)", r"\.limit\|take"),
        (
            "const r = await db.selectFrom('expenses').select(['category'])"
            ".limit(pageSize)",
            r"kysely chain: 1 \.limit",
        ),
        (
            "return knex('expenses').sum('amount as total').limit(n)",
            r"knex chain: 1 \.limit",
        ),
        # kysely callback-form join the arg regex cannot parse
        (
            "const r = await db.selectFrom('expenses')"
            ".innerJoin('users', (join) => join.onRef('u.id', '=', 'e.user_id'))"
            ".select(['category'])",
            r"kysely chain",
        ),
    ]:
        with pytest.raises(ValueError, match=why):
            build_method_specs(
                [{"description": "x", "location": "x:L1", "code": code}]
            )


def test_kysely_callback_where_roundtrips(scan, planted):
    """r16 (VERDICT #1): the single-expression literal callback
    .where((eb) => eb('col','op',val)) translates into the WHERE 1=1
    arm; CH arm row-equals PG arm on the planted corpus."""
    (s,) = build_method_specs([_spec_for(scan, "lib/reporting.ts:L23")])
    assert s.orm == "kysely"
    assert "WHERE 1=1 AND expenses.amount >= 25" in s.pg_sql
    eng = _engine(planted)
    got = eng.sql(s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql.replace("${whereClause}", ""), dialect="postgres").collect()
    _rows_equal(got, want)
    assert len(got) == 4 and got[0]["total"] >= got[-1]["total"]


def test_knex_object_where_roundtrips(scan, planted):
    """r16 (VERDICT #1): the flat object form .where({col: val})
    translates as AND of equalities."""
    (s,) = build_method_specs([_spec_for(scan, "lib/legacy.ts:L14")])
    assert s.orm == "knex"
    assert "WHERE 1=1 AND category = 'Food'" in s.pg_sql
    eng = _engine(planted)
    got = eng.sql(s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql.replace("${whereClause}", ""), dialect="postgres").collect()
    _rows_equal(got, want)
    days = [r["day"] for r in got]
    assert len(days) > 10 and days == sorted(days)


def test_typeorm_param_binds_roundtrip(scan, planted):
    """r16 (VERDICT #7): :param markers bound from a LITERAL
    parameters object splice at scan time — the same bind-time
    expansion run_pg_sql(params=...) does."""
    (s,) = build_method_specs([_spec_for(scan, "services/metrics.ts:L37")])
    assert s.orm == "typeorm"
    assert "WHERE 1=1 AND (e.amount >= 25)" in s.pg_sql
    assert ":minAmount" not in s.pg_sql
    eng = _engine(planted)
    got = eng.sql(s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql.replace("${whereClause}", ""), dialect="postgres").collect()
    _rows_equal(got, want)
    assert len(got) == 4 and got[0]["total"] >= got[-1]["total"]

def test_builder_in_and_null_where_forms():
    """r16: knex .whereIn/.whereNotIn/.whereNull/.whereNotNull and the
    kysely/knex 'in'/'is' operators translate for literal arguments;
    dynamic lists, empty lists, and non-null 'is' operands stay loud."""
    from clickhouse_build_spark.code_emitter import parse_knex, parse_kysely

    sql = parse_knex(
        "return knex('expenses').sum('amount as total')"
        ".whereIn('category', ['Food', 'Travel'])"
        ".whereNotIn('status', ['void'])"
        ".whereNull('deleted_at').whereNotNull('category')"
        ".groupBy('category')"
    )
    assert "category IN ('Food', 'Travel')" in sql
    assert "status NOT IN ('void')" in sql
    assert "deleted_at IS NULL" in sql and "category IS NOT NULL" in sql
    sql2 = parse_kysely(
        "const r = await db.selectFrom('expenses').select(['category'])"
        ".where('category', 'in', ['Food', 'Travel'])"
        ".where((eb) => eb('deleted_at', 'is', null))"
        ".where('note', 'is not', null).groupBy('category')"
    )
    assert "category IN ('Food', 'Travel')" in sql2
    assert "deleted_at IS NULL" in sql2 and "note IS NOT NULL" in sql2
    for bad, why in [
        (
            "return knex('expenses').sum('a as t').whereIn('cat', cats)",
            "literal array",
        ),
        (
            "return knex('expenses').sum('a as t').whereIn('cat', [])",
            "IN-list is empty",
        ),
        (
            "return knex('expenses').sum('a as t').whereNull(col)",
            r"1 \.whereNull",
        ),
        (
            "const r = await db.selectFrom('t').select(['a'])"
            ".where('a', 'is', 0)",
            "only against a null literal",
        ),
        (
            "const r = await db.selectFrom('t').select(['a'])"
            ".where('a', 'like', 'x')",
            "where operator",
        ),
    ]:
        with pytest.raises(ValueError, match=why):
            build_method_specs(
                [{"description": "x", "location": "x:L1", "code": bad}]
            )


def test_builder_multi_column_group_by():
    """r16: the vararg ('a', 'b') and array (['a', 'b']) groupBy
    spellings translate on kysely and knex; non-literal items loud."""
    from clickhouse_build_spark.code_emitter import parse_knex, parse_kysely

    assert parse_kysely(
        "const r = await db.selectFrom('expenses')"
        ".select(['category', 'region']).groupBy(['category', 'region'])"
    ).endswith("GROUP BY category, region")
    assert parse_knex(
        "return knex('expenses').sum('amount as total')"
        ".groupBy('category', 'region')"
    ).endswith("GROUP BY category, region")
    with pytest.raises(ValueError, match="groupBy item"):
        parse_knex("return knex('t').sum('a as x').groupBy(col)")
