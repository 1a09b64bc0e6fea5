"""Regenerate QUERIES.md from the plans registry.

One row per registered query: name, oracle vs rows-only check, tags,
and the first docstring line as the summary. Run after adding or
renaming registry queries (QUERIES.md went stale at the r09 count
because regeneration lived in an ad-hoc snippet; this pins it).

Usage: python tools/query_report.py   # writes /root/repo/QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_build_spark.plans import REGISTRY  # noqa: E402

HEADER = """# Query inventory

Auto-generated from `clickhouse_build_spark.plans.REGISTRY` — one row
per registered query (the driver's correctness gate runs every
`oracle`-checked row against DuckDB at sf0.01; `rows-only` rows have
no SQL-expressible oracle).

| Query | Check | Tags | Summary |
|---|---|---|---|
"""


def summary_of(spec) -> str:
    doc = (spec.builder.__doc__ or "").strip()
    first = doc.splitlines()[0] if doc else ""
    return first[:64].replace("|", "\\|")


def main() -> int:
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUERIES.md")
    rows = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        check = "oracle" if spec.oracle is not None else "rows-only"
        tags = ", ".join(spec.tags)
        rows.append(f"| {name} | {check} | {tags} | {summary_of(spec)} |")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    print(f"QUERIES.md written ({len(REGISTRY)} queries, {n_oracle} oracled)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
