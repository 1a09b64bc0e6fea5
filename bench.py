#!/usr/bin/env python
"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query materializes through the noop sink — full distributed compute,
no driver-side collect skew. A warmup run of the flagship query absorbs
JVM/codegen startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from clickhouse_build_spark.plans import REGISTRY
from clickhouse_build_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        sys.exit(f"bench: data dir not found: {sf_dir}")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: absorb session/codegen startup cost — and the Python
    # runner pool: a mapInPandas stage pays one worker fork per core
    # the first time one runs in the session, which otherwise lands on
    # whichever Arrow-kernel query sorts first (~5-9 s of session cost
    # booked to a random query). An identity kernel over one row per
    # core spins the pool up front.
    materialize(REGISTRY["q1_pricing_summary"].builder(spark, sf_dir))
    cores = spark.sparkContext.defaultParallelism
    materialize(
        spark.range(0, cores, 1, cores).mapInPandas(lambda it: it, "id long")
    )

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            materialize(spec.builder(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep benching; a failed query reports -1
            print(f"[bench] {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
