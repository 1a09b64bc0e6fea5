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
    assert len(locs) == 3
    # values(...).annotate(Sum/Count) chain
    assert any(l.startswith("analytics/views.py:L15-") for l in locs), locs
    # .aggregate(...) one-shot
    assert any(l.startswith("analytics/views.py:L25-") for l in locs), locs
    # raw cursor SQL
    assert any(l.startswith("analytics/views.py:L33-") for l in locs), locs


def test_single_row_lookup_not_reported(scan):
    for q in scan.queries:
        assert "objects.get" not in q.code


def test_models_file_contributes_nothing(scan):
    for q in scan.queries:
        assert not q.location.startswith("analytics/models.py"), q.location


def test_django_emission_fails_loudly(scan):
    """Found-or-loud: the QuerySet sites are reported but refuse
    emission with the Django-specific reason."""
    for prefix in ("analytics/views.py:L15-", "analytics/views.py:L25-"):
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
