"""CLI smoke: each subcommand must emit valid JSON with the documented
contract fields (subprocess — the real user entry point)."""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import pytest

APP = pathlib.Path("/root/reference/eval_repos/pg-expense-direct")


def run_cli(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "clickhouse_build_spark", *args],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    return json.loads(out.stdout)


@pytest.mark.skipif(not APP.is_dir(), reason="reference eval app missing")
def test_scanner_command():
    res = run_cli("scanner", str(APP))
    assert res["tables"] == ["expenses"]
    assert res["total_queries"] >= 4
    assert all({"description", "code", "location"} <= set(q) for q in res["queries"])


@pytest.mark.skipif(not APP.is_dir(), reason="reference eval app missing")
def test_migrate_chains_scan_and_plan():
    res = run_cli("migrate", str(APP), "--replication-mode", "cdc_only")
    assert res["scan"]["tables"] == ["expenses"]
    plan = res["replication_plan"]
    assert plan["replication_mode"] == "cdc_only"
    assert plan["table_mappings"][0]["targetTable"] == "expenses"
    assert plan["assumptions"]


def test_replicate_command(tmp_path):
    res = run_cli(
        "replicate",
        "/root/testdata/sf0.001/orders.parquet",
        str(tmp_path),
        "--table",
        "orders",
        "--key-cols",
        "o_orderkey",
        "--version-col",
        "o_orderdate",
    )
    assert res["rows"] == 1500
    assert (tmp_path / "orders").is_dir()
