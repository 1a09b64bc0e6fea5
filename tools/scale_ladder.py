#!/usr/bin/env python
"""Scale-ladder probes past 10× (VERDICT r12 next-round #3).

Builds /tmp/ladder_sf{S} corpora at 10×/50×/100× sf0.1 rows and times
the heavy families at each rung, printing one JSON line per rung. The
100 TB claims rest on plan shape; this rests them on measured points.

Corpus recipe — the clone recipe of tools/make_sf1_full.py is WRONG
for dedup-family scaling (every clone is an exact/near dup, so true
pair mass grows ~copies² BY CONSTRUCTION — the adjudicated
doc_near_dup_jaccard artifact). Here copies carry NEW content the way
a real corpus grows:

- TPC-H tables + events: key-offset clones (join selectivity
  preserved — real growth looks like this for relational facts);
- documents: copy i suffixes EVERY token with ``_i`` — all shingles
  differ across copies, so the corpus's own dup structure replicates
  per copy and true pair mass scales LINEARLY in copies;
- embeddings: copy i flips each dimension's sign by a seeded ±1
  pattern — norms and per-dim scale preserved, cross-copy cosine ≈ 0,
  so semantic-dup structure also replicates per copy instead of
  collapsing every copy into one cluster.

Usage:
  python tools/scale_ladder.py --rungs 1,5,10        # build + probe
  python tools/scale_ladder.py --rungs 5 --build-only
Each rung's JSON: {"sf": S, "copies": C, "families": {...}, "queries":
{name: sec}}. Compare rungs from the SAME invocation (same host
window); linear-in-rows bound = wall(S)/wall(1) ≲ S with log-factor
slack.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_build_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

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
EMB_DIM = 64

# The heavy families the 100 TB claims lean on (VERDICT r12 #3). The
# build_* rows run first inside each family list (artifact before
# consumer — the bench ordering contract).
FAMILIES = {
    "semdedup": ["emb_semdedup_keepers", "emb_semdedup_probe2_keepers"],
    "fuzzy_dedup_cc": [
        "build_dedup_artifacts",
        "doc_fuzzy_dedup_keepers",
        "doc_dedup_cluster_sizes",
    ],
    # r15 (VERDICT #6): the simhash family now times the LINEAR-output
    # cluster summary — the scale-safe default (identical signatures
    # collapse before any pairwise work). The pair row stays
    # registered but refuses loudly past SIMHASH_PAIR_CAP on
    # signature-degenerate corpora like the upper rungs, so it is no
    # longer a ladder row; its quadratic-output tag is narrowed to the
    # explicit pair mode.
    "simhash": ["doc_simhash_clusters"],
    "ivfpq": ["build_ivfpq_index", "emb_ivfpq_topk"],
    "cdc_rollup": ["cdc_incremental_rollup"],
}


def _salt_documents(df, i: int):
    """Suffix every token with ``_i`` — all shingles become
    copy-specific, so copies are NOT near-dups of each other."""
    if i == 0:
        return df
    return df.withColumn(
        "text",
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit(f"_{i}")),
            ),
            " ",
        ),
    )


def _salt_embeddings(df, i: int):
    """Seeded ±1 sign pattern per copy: cross-copy cosine ≈ 0, norms
    preserved."""
    if i == 0:
        return df
    rng = random.Random(1000 + i)
    signs = [rng.choice((-1.0, 1.0)) for _ in range(EMB_DIM)]
    return df.withColumn(
        "embedding",
        F.zip_with(
            F.col("embedding"),
            F.array(*[F.lit(s) for s in signs]),
            lambda x, s: (x * s).cast("float"),
        ),
    )


def build_rung(spark, out_dir: str, copies: int) -> None:
    for table, id_cols in OFFSET_COLS.items():
        path = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        if not id_cols:
            src.write.mode("overwrite").parquet(path)
            continue
        parts = []
        for i in range(copies):
            df = src
            for c in id_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * OFFS))
            if table == "documents":
                df = _salt_documents(df, i)
            elif table == "embeddings":
                df = _salt_embeddings(df, i)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(path)
        print(f"[ladder] wrote {path} ({copies}x)", file=sys.stderr)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def probe_rung(spark, sf_dir: str) -> dict[str, float]:
    from clickhouse_build_spark.plans import REGISTRY

    timings: dict[str, float] = {}
    for fam, names in FAMILIES.items():
        for name in names:
            t0 = time.perf_counter()
            try:
                materialize(REGISTRY[name].builder(spark, sf_dir))
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:
                print(f"[ladder] {name} FAILED: {e}", file=sys.stderr)
                timings[name] = -1.0
    return timings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="1,5,10", help="sf multipliers of sf0.1×10")
    ap.add_argument("--out-root", default="/tmp")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument(
        "--families",
        default=None,
        help="comma-separated family subset (default: all)",
    )
    args = ap.parse_args()
    rungs = [int(r) for r in args.rungs.split(",")]
    if args.families:
        keep = set(args.families.split(","))
        unknown = keep - FAMILIES.keys()
        if unknown:
            raise SystemExit(f"unknown families: {sorted(unknown)}")
        for f in list(FAMILIES):
            if f not in keep:
                del FAMILIES[f]
    spark = get_spark(app_name="scale_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    for s in rungs:
        out_dir = os.path.join(args.out_root, f"ladder_sf{s}")
        os.makedirs(out_dir, exist_ok=True)
        build_rung(spark, out_dir, copies=10 * s)
        if args.build_only:
            continue
        t0 = time.perf_counter()
        timings = probe_rung(spark, out_dir)
        # Drop this rung's at-rest IVFPQ export after probing: a 4096-
        # cell ladder corpus leaves thousands of parquet files that the
        # semdedup oracle's cross-export glob would also open — the
        # full-suite DuckDB compare hit EMFILE on the leftovers (r13).
        try:
            import glob as _glob
            import hashlib
            import shutil

            from clickhouse_build_spark.plans.similarity import (
                _AT_REST_BASE,
            )

            h = hashlib.md5(out_dir.encode()).hexdigest()[:12]
            for d in _glob.glob(
                f"{_AT_REST_BASE}/*/ivfpq/{h}"
            ) + _glob.glob(f"{_AT_REST_BASE}/*/ivfpq_probes/*/{h}"):
                shutil.rmtree(d, ignore_errors=True)
        except Exception as e:
            print(f"[ladder] export cleanup failed: {e}", file=sys.stderr)
        fam_walls = {
            fam: round(sum(max(timings[n], 0) for n in names), 3)
            for fam, names in FAMILIES.items()
        }
        print(
            json.dumps(
                {
                    "sf": float(s),
                    "copies": 10 * s,
                    "wall": round(time.perf_counter() - t0, 3),
                    "families": fam_walls,
                    "queries": timings,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
