"""Hostile scanner/emitter fixture (VERDICT r10 #6 / r11 #7).

The three golden eval apps never exercise: a two-table JOIN aggregate
in raw SQL, a ``$queryRaw`` composed from a NESTED template literal,
and a drizzle builder chain split across helper functions. The
vendored mini-app in ``tests/fixtures/pg-hostile-app`` carries all
three; the contract is find-or-fail-loudly:

- the scanner locates all three sites (the nested template is captured
  WHOLE by the depth-aware template scanner) and extracts exactly the
  two real tables — no phantom table from comment prose;
- the emitter round-trips the JOIN aggregate (CH rows == PG rows on a
  planted two-table corpus) and fails LOUDLY, with the documented
  reasons, on the two shapes it cannot translate.
"""

from __future__ import annotations

import datetime as dt
import pathlib
import random

import pytest
from pyspark.sql import types as T

from clickhouse_build_spark.code_emitter import build_method_specs
from clickhouse_build_spark.scanner import scan_repo

APP = pathlib.Path(__file__).parent / "fixtures" / "pg-hostile-app"


@pytest.fixture(scope="module")
def scan():
    return scan_repo(str(APP))


def test_scanner_finds_all_hostile_sites(scan):
    locs = [q.location for q in scan.queries]
    assert any(l.startswith("app/api/stats/route.ts:L7") for l in locs)
    assert any(l.startswith("app/api/stats/route.ts:L17") for l in locs)
    assert any(l.startswith("lib/report.ts:") for l in locs)


def test_join_tables_both_extracted_no_phantoms(scan):
    assert scan.tables == ["categories", "expenses"]


def test_nested_template_captured_whole(scan):
    site = next(
        q for q in scan.queries if q.location.startswith("app/api/stats/route.ts:L17")
    )
    # the flat regex used to cut the outer literal at the inner backtick
    assert "Prisma.sql`WHERE amount > 0`" in site.code
    assert "GROUP BY month" in site.code


def _spec_for(scan, loc_prefix):
    q = next(q for q in scan.queries if q.location.startswith(loc_prefix))
    return {
        "description": q.description,
        "code": q.code,
        "location": q.location,
    }


def test_nested_template_fails_loudly(scan):
    with pytest.raises(ValueError, match="interpolation|neither raw SQL"):
        build_method_specs([_spec_for(scan, "app/api/stats/route.ts:L17")])


def test_split_builder_fails_loudly(scan):
    # r13: the chain walk-back makes the split block syntactically
    # parseable — the emitter now refuses it by the sharper
    # deferred-builder signal (assigned without await), still loud
    with pytest.raises(ValueError, match="deferred drizzle builder"):
        build_method_specs([_spec_for(scan, "lib/report.ts:")])


def test_join_aggregate_roundtrips_ch_equals_pg(scan, spark):
    from clickhouse_build_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    specs = build_method_specs(
        [_spec_for(scan, "app/api/stats/route.ts:L7")]
    )
    assert len(specs) == 1
    s = specs[0]
    assert "JOIN categories" in s.pg_sql and "JOIN categories" in s.ch_sql

    rng = random.Random(13)
    cats = [(1, "Food"), (2, "Transport"), (3, "Utilities")]
    spark.createDataFrame(
        cats, "id long, name string"
    ).createOrReplaceTempView("categories")
    rows = [
        (
            i,
            round(rng.uniform(1, 300), 2),
            rng.choice([1, 2, 3]),
            dt.date(2024, 1, 1) + dt.timedelta(days=rng.randrange(120)),
        )
        for i in range(1, 201)
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("category_id", T.LongType()),
            T.StructField("date", T.DateType()),
        ]
    )
    spark.createDataFrame(rows, schema).createOrReplaceTempView("expenses")
    eng = Engine(SF_SMOKE, spark=spark)
    got = eng.sql(s.ch_sql, dialect="clickhouse").collect()
    want = eng.sql(s.pg_sql, dialect="postgres").collect()
    # sum(amount) over doubles is partition-order-dependent in the last
    # ulp, so float columns compare with tolerance, the rest exactly
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(tuple(g), tuple(w)):
            if isinstance(gv, float):
                assert gv == pytest.approx(wv, rel=1e-9)
            else:
                assert gv == wv
    assert len(got) == 3 and got[0]["total"] >= got[-1]["total"]
