"""Standalone warm retimes for individual registry queries.

The full-registry bench records in-run walls, which fold in one-time
at-rest artifact (re)builds and post-heavy-row executor transients —
every round so far has had to adjudicate a handful of apparent
regressions that way (BASELINE.md r10/r12 notes). This tool isolates a
query: same session config as bench.py, N back-to-back runs, so run 1
absorbs the one-time costs and run N is the steady state.

Usage: python tools/retime.py [--sf-dir DIR] [--runs 2] name [name...]
Prints one JSON line: {name: [run1_s, ..., runN_s], ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_build_spark.plans import REGISTRY  # noqa: E402
from clickhouse_build_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    unknown = [n for n in args.names if n not in REGISTRY]
    if unknown:
        sys.exit(f"retime: not in REGISTRY: {unknown}")
    spark = get_spark(app_name="retime")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, list[float]] = {}
    for name in args.names:
        walls = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = REGISTRY[name].builder(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = walls
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
