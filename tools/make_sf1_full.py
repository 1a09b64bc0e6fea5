"""Build the FULL sf1-scale dataset (all ten tables, 10× sf0.1) for the
whole-registry scale bench (VERDICT r05 "Next round" #6).

The r05 rehearsal tool (tools/sf1_rehearsal.py) scaled only the three
tables its guard-rail families read; a full `bench.py` run needs every
table. Scaling recipe: each fact/dimension table is unioned ``copies``
times with consistent key offsets, so FOREIGN-KEY JOIN SELECTIVITY IS
PRESERVED — copy i's lineitem rows still join copy i's orders/customer/
part/supplier rows (same offset on both sides), and the fixed
geography dims (region/nation) are left at natural size, exactly as a
real 10× corpus would look. Event ids/users offset together; document
and embedding ids offset identically so the cross-modal joins keep
their 1:1 id mapping.

Usage: python tools/make_sf1_full.py [--out /tmp/sf1] [--copies 10]
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_build_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# table -> columns to offset per copy (key spaces that must move in
# lockstep across tables keep join selectivity)
OFFSET_COLS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
OFFS = 10_000_000


def make_sf1_full(spark, out_dir: str, copies: int) -> None:
    for table, id_cols in OFFSET_COLS.items():
        path = os.path.join(out_dir, f"{table}.parquet")
        # a dir is only complete if Spark committed it (_SUCCESS);
        # an interrupted run leaves the dir without the marker and
        # must be rewritten, not skipped (ADVICE r06)
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        if not id_cols:  # fixed dims stay natural-size
            src.write.mode("overwrite").parquet(path)
            print(f"wrote {path} (natural size)", file=sys.stderr)
            continue
        parts = []
        for i in range(copies):
            df = src
            for c in id_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * OFFS))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(path)
        print(f"wrote {path} ({copies}x)", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark(app_name="make_sf1_full")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    make_sf1_full(spark, args.out, args.copies)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
