"""Django-ORM detection (r14, VERDICT #4 — the plane app class).

The reference scanner's INCLUDE semantics (``src/prompts/scanner.py:
26-37``) applied to ``.py`` files: QuerySet ``annotate``/``aggregate``
aggregate chains and raw cursor SQL are FOUND; single-row lookups are
not. Emission of a Django QuerySet stays a documented loud failure —
the model's ``db_table`` is not visible in the scanned chain.
"""

from __future__ import annotations

import pathlib

import pytest

from clickhouse_build_spark.code_emitter import build_method_specs
from clickhouse_build_spark.scanner import scan_repo

APP = pathlib.Path(__file__).parent / "fixtures" / "django-app"


@pytest.fixture(scope="module")
def scan():
    return scan_repo(str(APP))


def test_django_sites_found(scan):
    locs = sorted(q.location for q in scan.queries)
    assert len(locs) == 7
    # values(...).annotate(Sum/Count) chain
    assert any(l.startswith("analytics/views.py:L16-") for l in locs), locs
    # .aggregate(...) one-shot
    assert any(l.startswith("analytics/views.py:L25-") for l in locs), locs
    # raw cursor SQL
    assert any(l.startswith("analytics/views.py:L33-") for l in locs), locs
    # filtered rollup (r15b)
    assert any(l.startswith("analytics/views.py:L46-") for l in locs), locs
    # flat Q tree + text lookup (r16)
    assert any(l.startswith("analytics/views.py:L58-") for l in locs), locs
    # exclude on a nullable column (r16)
    assert any(l.startswith("analytics/views.py:L72-") for l in locs), locs
    # filter-after-annotate dedup idiom -> HAVING (r16)
    assert any(l.startswith("analytics/views.py:L83-") for l in locs), locs


def test_single_row_lookup_not_reported(scan):
    for q in scan.queries:
        assert "objects.get" not in q.code


def test_models_file_contributes_nothing(scan):
    for q in scan.queries:
        assert not q.location.startswith("analytics/models.py"), q.location


def test_django_emission_fails_loudly_without_model_context(scan):
    """Found-or-loud: without the repo's model bindings the QuerySet
    sites refuse emission with the Django-specific reason."""
    for prefix in ("analytics/views.py:L16-", "analytics/views.py:L25-"):
        q = next(x for x in scan.queries if x.location.startswith(prefix))
        with pytest.raises(ValueError, match="Django ORM site"):
            build_method_specs(
                [
                    {
                        "description": q.description,
                        "code": q.code,
                        "location": q.location,
                    }
                ]
            )


def _specs_with_repo(scan, prefix):
    q = next(x for x in scan.queries if x.location.startswith(prefix))
    return build_method_specs(
        [
            {
                "description": q.description,
                "code": q.code,
                "location": q.location,
            }
        ],
        repo_path=str(APP),
    )


def test_django_sites_emit_with_visible_model(scan):
    """r15 (VERDICT #2): the model class IS visible in the repo
    (``class Expense(models.Model)`` in analytics/models.py, default
    ``analytics_expense`` naming) — both QuerySet sites derive raw SQL
    through the same spec machinery as kysely/knex/typeorm."""
    (s,) = _specs_with_repo(scan, "analytics/views.py:L16-")
    assert s.orm == "django"
    assert s.pg_sql == (
        "SELECT category, SUM(amount) AS total, COUNT(id) AS n "
        "FROM analytics_expense ${whereClause} "
        "GROUP BY category ORDER BY total DESC"
    )
    (s2,) = _specs_with_repo(scan, "analytics/views.py:L25-")
    assert s2.orm == "django"
    assert s2.pg_sql == (
        "SELECT SUM(amount) AS total, AVG(amount) AS avg, COUNT(id) AS n"
        " FROM analytics_expense ${whereClause}"
    )


@pytest.fixture(scope="module")
def planted(spark):
    import datetime as dt
    import random

    from pyspark.sql import types as T

    rng = random.Random(23)
    rows = [
        (
            i,
            round(rng.uniform(1, 250), 2),
            rng.choice(["Food", "Travel", "Office", None]),
            dt.date(2024, 2, 1) + dt.timedelta(days=rng.randrange(90)),
        )
        for i in range(1, 151)
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("category", T.StringType()),
            T.StructField("date", T.DateType()),
        ]
    )
    spark.createDataFrame(rows, schema).createOrReplaceTempView(
        "analytics_expense"
    )
    return spark


def test_django_emitted_arms_row_equal(scan, planted):
    """The emitted CH arm row-equals the PG arm on a planted corpus —
    the same round-trip bar as the real-app fixture."""
    from clickhouse_build_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    eng = Engine(SF_SMOKE, spark=planted)
    for prefix in ("analytics/views.py:L16-", "analytics/views.py:L25-"):
        (s,) = _specs_with_repo(scan, prefix)
        got = eng.sql(
            s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse"
        ).collect()
        want = eng.sql(
            s.pg_sql.replace("${whereClause}", ""), dialect="postgres"
        ).collect()
        assert len(got) == len(want) and len(got) > 0
        for g, w in zip(got, want):
            for gv, wv in zip(tuple(g), tuple(w)):
                if isinstance(gv, float):
                    assert gv == pytest.approx(wv, rel=1e-9)
                else:
                    assert gv == wv


def test_django_untranslatable_shapes_stay_loud():
    """The never-silently-drop contract, Django arm: a .filter() the
    translator cannot carry, an invisible model, annotate without
    grouping, and non-column aggregate args all refuse."""
    mt = {"Expense": "analytics_expense"}
    from clickhouse_build_spark.code_emitter import parse_django

    # r15b: a simple-lookup .filter() now TRANSLATES (see
    # test_django_filter_loud_shapes for the shapes that stay loud)
    assert "WHERE 1=1 AND status = 'paid'" in parse_django(
        "Expense.objects.filter(status='paid')"
        ".values('category').annotate(total=Sum('amount'))",
        mt,
    )
    with pytest.raises(ValueError, match="no visible models.Model"):
        parse_django(
            "Invoice.objects.values('c').annotate(total=Sum('amount'))",
            mt,
        )
    with pytest.raises(ValueError, match="per-row annotation"):
        parse_django("Expense.objects.annotate(total=Sum('amount'))", mt)
    with pytest.raises(ValueError, match="untranslatable Django aggregate"):
        parse_django(
            "Expense.objects.aggregate(n=Count('id', distinct=True))", mt
        )
    with pytest.raises(ValueError, match="untranslatable Django aggregate"):
        parse_django("Expense.objects.aggregate(n=Count('pk'))", mt)
    # not a Django site at all -> None, never a guess
    assert parse_django("const x = await repo.sum('amount')", mt) is None


def test_django_filtered_rollup_emits_and_roundtrips(scan, planted):
    """r15b: .filter/.exclude simple lookups translate into the
    WHERE 1=1 arm (composing with the runtime DateFilter splice) and
    the emitted arms row-equal on the planted corpus; the values are
    cross-checked against a direct Spark computation of the QuerySet
    semantics."""
    from pyspark.sql import functions as F

    from clickhouse_build_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    (s,) = _specs_with_repo(scan, "analytics/views.py:L46-")
    assert s.orm == "django"
    assert s.pg_sql == (
        "SELECT category, SUM(amount) AS total, COUNT(id) AS n "
        "FROM analytics_expense "
        "WHERE 1=1 AND category IN ('Food', 'Travel') AND amount >= 5 "
        "AND NOT ((amount >= 240 AND amount IS NOT NULL)) "
        "GROUP BY category ORDER BY category ASC"
    )
    eng = Engine(SF_SMOKE, spark=planted)
    got = eng.sql(s.ch_sql, dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql, dialect="postgres").collect()
    assert [tuple(r) for r in got] == pytest.approx(
        [tuple(r) for r in want]
    ) if False else len(got) == len(want)
    # independent reference: the QuerySet semantics in DataFrame form
    ref = (
        planted.table("analytics_expense")
        .filter(
            F.col("category").isin("Food", "Travel")
            & (F.col("amount") >= 5)
            & ~(F.col("amount") >= 240)
        )
        .groupBy("category")
        .agg(
            F.sum("amount").alias("total"),
            F.count("id").alias("n"),
        )
        .orderBy("category")
        .collect()
    )
    assert len(got) == len(ref) > 0
    for g, w, r in zip(got, want, ref):
        assert g["category"] == w["category"] == r["category"]
        assert g["n"] == w["n"] == r["n"]
        assert g["total"] == pytest.approx(w["total"], rel=1e-9)
        assert g["total"] == pytest.approx(r["total"], rel=1e-9)


def test_django_filter_loud_shapes():
    from clickhouse_build_spark.code_emitter import parse_django

    mt = {"Expense": "analytics_expense"}
    for bad, why in [
        # r17: ~Q / nested Q / paren groups / Q-in-exclude now
        # TRANSLATE (test_django_q_tree_precedence_pins); what stays
        # loud is genuinely dynamic content and malformed trees
        (
            "Expense.objects.filter(Q(a=1) | F('b'))"
            ".aggregate(n=Count('id'))",
            "untranslatable Django Q expression",
        ),
        (
            "Expense.objects.filter(Q(a=1) |)"
            ".aggregate(n=Count('id'))",
            "untranslatable Django Q expression",
        ),
        (
            "Expense.objects.filter((Q(a=1) | Q(b=2)"
            ".aggregate(n=Count('id'))",
            "unbalanced parentheses",
        ),
        (
            "Expense.objects.filter(workspace__slug='x')"
            ".aggregate(n=Count('id'))",
            "relation traversals",
        ),
        (
            "Expense.objects.filter(status=req_status)"
            ".aggregate(n=Count('id'))",
            "literals only",
        ),
        (
            "Expense.objects.filter(name__regex='^a')"
            ".aggregate(n=Count('id'))",
            "relation traversals and regex lookups",
        ),
        (
            "Expense.objects.filter(name__icontains=prefix)"
            ".aggregate(n=Count('id'))",
            "text lookups need a quoted string literal",
        ),
        (
            "Expense.objects.filter(note__isnull=maybe)"
            ".aggregate(n=Count('id'))",
            "literal True/False",
        ),
    ]:
        with pytest.raises(ValueError, match=__import__("re").escape(why)):
            parse_django(bad, mt)


def test_django_having_emission_and_loud_shapes():
    """ADVICE r15 (medium), upgraded r16: a .filter() AFTER
    .annotate() — Django's HAVING — now EMITS a real HAVING clause
    with each annotate alias expanded to its aggregate expression (PG
    forbids output aliases in HAVING). .exclude()-after-annotate, a
    non-alias/non-grouped field, Q trees in HAVING, and alias
    references BEFORE .annotate() stay loud — the WHERE arm never
    silently receives an aggregate-alias condition."""
    from clickhouse_build_spark.code_emitter import parse_django

    mt = {"Expense": "analytics_expense"}
    sql = parse_django(
        "Expense.objects.values('category')"
        ".annotate(n=Count('id')).filter(n__gt=1)",
        mt,
    )
    assert sql.endswith("GROUP BY category HAVING COUNT(id) > 1")
    assert "WHERE 1=1" not in sql  # splice point stays for DateFilter
    sql = parse_django(
        "Expense.objects.filter(amount__gte=5).values('category')"
        ".annotate(n=Count('id')).filter(n__gte=2, category='Food')",
        mt,
    )
    # ADVICE r16 (low): plain grouped-column predicates route to
    # WHERE (Django's split_having keeps them there); only
    # alias/aggregate conditions stay in HAVING
    assert "WHERE 1=1 AND amount >= 5 AND category = 'Food'" in sql
    assert sql.endswith("HAVING COUNT(id) >= 2")
    for bad, why in [
        (
            "Expense.objects.values('category')"
            ".annotate(n=Count('id')).exclude(n=0)",
            "negated HAVING",
        ),
        (
            "Expense.objects.values('category')"
            ".annotate(n=Count('id')).filter(x__gt=1)",
            "neither an annotate alias nor a grouped column",
        ),
        (
            "Expense.objects.values('category')"
            ".annotate(n=Count('id')).filter(Q(n=1) | Q(category='x'))",
            "simple lookups on annotate aliases",
        ),
        (
            "Expense.objects.filter(n__gt=1).values('category')"
            ".annotate(n=Count('id'))",
            "FieldError",
        ),
    ]:
        with pytest.raises(ValueError, match=__import__("re").escape(why)):
            parse_django(bad, mt)


def test_django_having_roundtrips(scan, planted):
    """The dedup-idiom fixture view round-trips CH == PG and matches
    a direct DataFrame computation of the HAVING semantics."""
    from pyspark.sql import functions as F

    from clickhouse_build_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    (s,) = _specs_with_repo(scan, "analytics/views.py:L83-")
    assert s.orm == "django"
    assert s.pg_sql.endswith(
        "GROUP BY category HAVING COUNT(id) > 37 ORDER BY category ASC"
    )
    eng = Engine(SF_SMOKE, spark=planted)
    got = eng.sql(
        s.ch_sql.replace("${whereClause}", ""), dialect="clickhouse"
    ).collect()
    want = eng.sql(
        s.pg_sql.replace("${whereClause}", ""), dialect="postgres"
    ).collect()
    ref = (
        planted.table("analytics_expense")
        .groupBy("category")
        .agg(F.count("id").alias("n"), F.sum("amount").alias("total"))
        .filter(F.col("n") > 37)
        .orderBy("category")
        .collect()
    )
    assert 0 < len(ref) < 4  # HAVING actually filters some group out
    assert len(got) == len(want) == len(ref)
    for g, w, r in zip(got, want, ref):
        assert g["category"] == w["category"] == r["category"]
        assert g["n"] == w["n"] == r["n"]
        assert g["total"] == pytest.approx(w["total"], rel=1e-9)
        assert g["total"] == pytest.approx(r["total"], rel=1e-9)


def test_django_q_tree_and_text_lookup_roundtrip(scan, planted):
    """r16 (VERDICT #2): flat Q trees of literal lookups and the
    __icontains-family text lookups translate; the emitted arms
    row-equal on the planted corpus and match a direct DataFrame
    computation of the QuerySet semantics."""
    from pyspark.sql import functions as F

    from clickhouse_build_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    (s,) = _specs_with_repo(scan, "analytics/views.py:L58-")
    assert s.orm == "django"
    assert s.pg_sql == (
        "SELECT category, SUM(amount) AS total, COUNT(id) AS n "
        "FROM analytics_expense "
        "WHERE 1=1 AND (category ILIKE '%foo%' OR amount >= 200) "
        "AND amount < 240 "
        "GROUP BY category ORDER BY category ASC"
    )
    eng = Engine(SF_SMOKE, spark=planted)
    got = eng.sql(s.ch_sql, dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql, dialect="postgres").collect()
    ref = (
        planted.table("analytics_expense")
        .filter(
            (
                F.lower(F.col("category")).contains("foo")
                | (F.col("amount") >= 200)
            )
            & (F.col("amount") < 240)
        )
        .groupBy("category")
        .agg(F.sum("amount").alias("total"), F.count("id").alias("n"))
        .orderBy("category")
        .collect()
    )
    assert len(got) == len(want) == len(ref) > 0
    for g, w, r in zip(got, want, ref):
        assert g["category"] == w["category"] == r["category"]
        assert g["n"] == w["n"] == r["n"]
        assert g["total"] == pytest.approx(w["total"], rel=1e-9)
        assert g["total"] == pytest.approx(r["total"], rel=1e-9)


def test_django_exclude_keeps_null_rows(scan, planted):
    """r16 (VERDICT nit #2): Django's negated filters add per-leaf IS
    NOT NULL guards (sql/query.py build_filter), so
    .exclude(category='Food') KEEPS rows whose category is NULL —
    plain SQL NOT(category='Food') would drop them. The planted corpus
    carries NULL categories; the NULL group must appear in the
    result on BOTH emitted arms."""
    from pyspark.sql import functions as F

    from clickhouse_build_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    (s,) = _specs_with_repo(scan, "analytics/views.py:L72-")
    assert s.orm == "django"
    assert s.pg_sql == (
        "SELECT category, SUM(amount) AS total, COUNT(id) AS n "
        "FROM analytics_expense "
        "WHERE 1=1 AND NOT ((category = 'Food' AND category IS NOT NULL)) "
        "GROUP BY category ORDER BY category ASC"
    )
    eng = Engine(SF_SMOKE, spark=planted)
    got = eng.sql(s.ch_sql, dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql, dialect="postgres").collect()
    ref = (
        planted.table("analytics_expense")
        .filter((F.col("category") != "Food") | F.col("category").isNull())
        .groupBy("category")
        .agg(F.sum("amount").alias("total"), F.count("id").alias("n"))
        .orderBy("category")
        .collect()
    )
    # the QuerySet keeps the NULL-category group
    assert any(r["category"] is None for r in ref)
    assert len(got) == len(want) == len(ref) > 0
    cats = lambda rows: [r["category"] for r in rows]  # noqa: E731
    assert cats(got) == cats(want) == cats(ref)
    assert None in cats(got) and "Food" not in cats(got)
    for g, w, r in zip(got, want, ref):
        assert g["n"] == w["n"] == r["n"]
        assert g["total"] == pytest.approx(w["total"], rel=1e-9)
        assert g["total"] == pytest.approx(r["total"], rel=1e-9)


def test_django_q_tree_precedence_pins():
    """Python's `&`-over-`|` precedence must map 1:1 onto SQL's
    AND-over-OR — pinned both directions, plus multi-kwarg leaves
    parenthesizing and text lookups inside Q leaves."""
    from clickhouse_build_spark.code_emitter import parse_django

    mt = {"Expense": "analytics_expense"}

    def where(q):
        sql = parse_django(
            f"Expense.objects.filter({q})"
            ".values('category').annotate(n=Count('id'))",
            mt,
        )
        return sql.split("WHERE 1=1 AND ", 1)[1].split(" GROUP BY")[0]

    assert where("Q(a=1) | Q(b=2) & Q(c=3)") == "(a = 1 OR b = 2 AND c = 3)"
    assert where("Q(a=1) & Q(b=2) | Q(c=3)") == "(a = 1 AND b = 2 OR c = 3)"
    assert where("Q(a=1, b=2) | Q(c=3)") == "((a = 1 AND b = 2) OR c = 3)"
    assert where("Q(name__istartswith='ab%') | Q(a__in=[1, 2])") == (
        "(name ILIKE 'ab\\%%' OR a IN (1, 2))"
    )
    # r17 (VERDICT #3): the real expression tree — ~Q carries
    # Django's per-leaf IS NOT NULL guard (negation keeps NULL rows,
    # same machinery as .exclude()), parenthesized groups regroup
    # against precedence, Q nests inside Q, and a double ~ restores
    # the unguarded leaf
    assert where("~Q(a=1)") == "NOT ((a = 1 AND a IS NOT NULL))"
    assert where("(Q(a=1) | Q(b=2)) & Q(c=3)") == (
        "((a = 1 OR b = 2) AND c = 3)"
    )
    assert where("Q(Q(a=1) | Q(b=2), c=3)") == (
        "((a = 1 OR b = 2) AND c = 3)"
    )
    assert where("~(Q(a=1) & Q(b__isnull=True))") == (
        "NOT ((a = 1 AND a IS NOT NULL) AND b IS NULL)"
    )
    assert where("~~Q(a=1)") == "NOT (NOT (a = 1))"
