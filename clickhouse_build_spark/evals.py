"""Reference-eval runner — the reference's user-facing ``eval``
command (``/root/reference/main.py:403-455`` dispatches to
``eval/{scanner,data_migrator,qa_code_migrator}/eval.py``),
deterministic. Each function scores this engine's component against
the reference's OWN ground-truth files with the reference's OWN
scoring rules and returns the reference-style summary:

- scanner: greedy 1:1 line-range IoU ≥ 0.5 matching per app, F1 ≥ 0.8
  to pass, exact table list (``eval/scanner/eval.py:82-132,200-213``);
- data-migrator: field-exact compare of database / destination / mode /
  sorted tableMappings (``eval/data_migrator/eval.py:69-123``);
- qa: field-exact ``approved`` per ground-truth case.

The pytest files (``tests/test_scanner_parity.py``,
``tests/test_migrator.py``, ``tests/test_qa_gate.py``) assert the same
rules; the CLI subprocess test pins that both surfaces report the same
scores.
"""

from __future__ import annotations

import json
import os
import re

REF = "/root/reference"

__all__ = ["eval_scanner", "eval_data_migrator", "eval_qa", "run_eval"]


def _require(path: str) -> str:
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"reference ground truth not available: {path}"
        )
    return path


# ----------------------------------------------------------- scanner


def _parse_loc(loc: str) -> tuple[str, int, int]:
    path, lrange = loc.rsplit(":", 1)
    m = re.match(r"L(\d+)(?:-(\d+))?", lrange)
    lo = int(m.group(1))
    return path.lstrip("/"), lo, int(m.group(2) or lo)


def _iou(a: tuple[int, int], b: tuple[int, int]) -> float:
    inter = max(0, min(a[1], b[1]) - max(a[0], b[0]) + 1)
    union = max(a[1], b[1]) - min(a[0], b[0]) + 1
    return inter / union if union else 0.0


def eval_scanner() -> dict:
    from clickhouse_build_spark.scanner import scan_repo

    gt = json.load(open(_require(os.path.join(REF, "eval", "scanner", "ground_truth.json"))))
    cases = []
    for case in gt["test_cases"]:
        repo = os.path.join(REF, case["repo_path"])
        result = scan_repo(repo)
        exp = [_parse_loc(q["location"]) for q in case["expected"]["queries"]]
        got = [_parse_loc(q.location) for q in result.queries]
        # mirror the reference's scoring EXACTLY (ADVICE r10): each
        # ACTUAL location greedily takes the FIRST unmatched expected
        # with IoU >= 0.5 (reference eval/scanner/eval.py:125-132), and
        # paths compare by suffix as in its paths_match — not best-IoU
        # per expected, which can differ under overlapping ranges
        matched, used = 0, set()
        for gpath, glo, ghi in got:
            for j, (epath, elo, ehi) in enumerate(exp):
                if j in used:
                    continue
                if not (
                    gpath == epath
                    or gpath.endswith(epath)
                    or epath.endswith(gpath)
                ):
                    continue
                if _iou((elo, ehi), (glo, ghi)) >= 0.5:
                    used.add(j)
                    matched += 1
                    break
        precision = matched / len(got) if got else 0.0
        recall = matched / len(exp) if exp else 0.0
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall
            else 0.0
        )
        tables_exact = sorted(result.tables) == sorted(
            case["expected"].get("tables", [])
        )
        cases.append(
            {
                "name": case["name"],
                "precision": round(precision, 3),
                "recall": round(recall, 3),
                "f1_score": round(f1, 3),
                "tables_exact": tables_exact,
                "passed": f1 >= 0.8 and tables_exact,
            }
        )
    return {
        "agent": "scanner",
        "cases": cases,
        "passed": sum(c["passed"] for c in cases),
        "total": len(cases),
        "all_passed": all(c["passed"] for c in cases),
    }


# ------------------------------------------------------ data migrator


def eval_data_migrator() -> dict:
    from clickhouse_build_spark.migrator import plan_replication
    from clickhouse_build_spark.scanner import scan_repo

    gt = json.load(open(_require(os.path.join(REF, "eval", "data_migrator", "ground_truth.json"))))
    key = lambda m: (  # noqa: E731
        m["sourceSchemaName"],
        m["sourceTable"],
        m["targetTable"],
    )
    cases = []
    for case in gt["test_cases"]:
        repo = os.path.join(REF, case["repo_path"])
        plan = plan_replication(
            scan_repo(repo), replication_mode=case["replication_mode"]
        )
        exp = case["expected"]
        fields = {
            "database_name": plan.database_name == exp["database_name"],
            "destination_database": plan.destination_database
            == exp["destination_database"],
            "replication_mode": plan.replication_mode
            == exp["replication_mode"],
            "schema_tables": plan.schema_tables == exp["schema_tables"],
            "table_mappings": sorted(plan.table_mappings, key=key)
            == sorted(exp["table_mappings"], key=key),
        }
        cases.append(
            {
                "name": case["name"],
                "fields": fields,
                "passed": all(fields.values()),
            }
        )
    return {
        "agent": "data-migrator",
        "cases": cases,
        "passed": sum(c["passed"] for c in cases),
        "total": len(cases),
        "all_passed": all(c["passed"] for c in cases),
    }


# ---------------------------------------------------------------- qa


def eval_qa() -> dict:
    from clickhouse_build_spark.qa_gate import qa_check

    gt = json.load(open(_require(os.path.join(REF, "eval", "qa_code_migrator", "ground_truth.json"))))
    cases = []
    for case in gt["test_cases"]:
        got = qa_check(
            case["code"],
            file_path=case.get("file_path", ""),
            purpose=case.get("purpose", ""),
        )
        ok = got["approved"] == case["expected"]["approved"]
        cases.append(
            {
                "name": case["name"],
                "expected": case["expected"]["approved"],
                "got": got["approved"],
                "reason": got["reason"],
                "passed": ok,
            }
        )
    return {
        "agent": "qa",
        "cases": cases,
        "passed": sum(c["passed"] for c in cases),
        "total": len(cases),
        "all_passed": all(c["passed"] for c in cases),
    }


_AGENTS = {
    "scanner": eval_scanner,
    "data-migrator": eval_data_migrator,
    "qa": eval_qa,
}


def run_eval(agent: str) -> dict:
    """One agent's eval, or all three with ``agent="all"``."""
    if agent == "all":
        return {name: fn() for name, fn in _AGENTS.items()}
    if agent not in _AGENTS:
        raise ValueError(
            f"unknown eval agent {agent!r} — one of "
            f"{sorted(_AGENTS)} or 'all'"
        )
    return _AGENTS[agent]()
