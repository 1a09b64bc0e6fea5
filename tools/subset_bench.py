"""A/B subset bench: run a fixed list of registry queries once each in a
fresh session (same config path as bench.py, including its warmups) and
print one JSON line of per-query walls. Used for same-window config
experiments where the full 182-row sweep would be too slow to repeat.

Usage: python tools/subset_bench.py name [name...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), plus whatever
config knob the experiment toggles (read by session.py / catalog.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_build_spark.plans import REGISTRY  # noqa: E402
from clickhouse_build_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"subset_bench: not in REGISTRY: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="subset_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's warmups: flagship query + python worker pool spin-up
    REGISTRY["q1_pricing_summary"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores, 1, cores).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
    out["_total"] = round(sum(v for k, v in out.items() if k != "_total"), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
