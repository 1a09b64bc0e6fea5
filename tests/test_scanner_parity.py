"""Scanner parity against the reference's own eval ground truth.

Re-implements the reference eval's *scoring rules* (line-range IoU ≥ 0.5
greedy 1:1 matching, F1 ≥ 0.8, exact table list, query count ±1 —
``eval/scanner/eval.py:82-132,200-206``) and runs our deterministic
scanner over the three eval apps. Skipped when the reference checkout is
absent.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from clickhouse_build_spark.scanner import scan_repo

REF = "/root/reference"
GT = os.path.join(REF, "eval", "scanner", "ground_truth.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GT), reason="reference checkout not available"
)


def _parse_gt_location(loc: str) -> tuple[str, int, int]:
    # "/app/api/expenses/stats/route.ts:L27-30"
    path, lrange = loc.rsplit(":", 1)
    m = re.match(r"L(\d+)(?:-(\d+))?", lrange)
    lo = int(m.group(1))
    hi = int(m.group(2) or lo)
    return path.lstrip("/"), lo, hi


def _iou(a: tuple[int, int], b: tuple[int, int]) -> float:
    inter = max(0, min(a[1], b[1]) - max(a[0], b[0]) + 1)
    union = max(a[1], b[1]) - min(a[0], b[0]) + 1
    return inter / union if union else 0.0


def _block_range(q) -> tuple[str, int, int]:
    path, lrange = q.location.rsplit(":", 1)
    m = re.match(r"L(\d+)-(\d+)", lrange)
    return path, int(m.group(1)), int(m.group(2))


@pytest.mark.parametrize(
    "name", ["pg-expense-direct", "pg-expense-drizzleorm", "pg-expense-prisma"]
)
def test_scanner_meets_reference_eval_bar(name):
    gt = json.load(open(GT))
    case = next(c for c in gt["test_cases"] if c["name"] == name)
    expected = case["expected"]
    result = scan_repo(os.path.join(REF, case["repo_path"]))

    exp = [_parse_gt_location(q["location"]) for q in expected["queries"]]
    got = [_block_range(q) for q in result.queries]

    # greedy 1:1 matching on IoU >= 0.5 within the same file
    matched = 0
    used = set()
    for epath, elo, ehi in exp:
        best, best_iou = None, 0.0
        for idx, (gpath, glo, ghi) in enumerate(got):
            if idx in used or gpath != epath:
                continue
            iou = _iou((elo, ehi), (glo, ghi))
            if iou >= 0.5 and iou > best_iou:
                best, best_iou = idx, iou
        if best is not None:
            used.add(best)
            matched += 1

    precision = matched / len(got) if got else 0.0
    recall = matched / len(exp) if exp else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0

    assert f1 >= 0.8, f"{name}: F1={f1:.2f} (P={precision:.2f}, R={recall:.2f})"
    assert abs(result.total_queries - expected["total_queries"]) <= 1
    assert result.tables == sorted(expected["tables"]), result.tables
