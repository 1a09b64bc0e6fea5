"""sf1 scale rehearsal for the guard rails (VERDICT r04 "Next round" #4).

The dedup, ANN and percentile families had never executed above sf0.1;
this tool builds an sf1-scale dataset (10x sf0.1: ~6M lineitem rows,
50k documents, 50k embeddings) under /tmp/sf1 and runs each family
once, recording wall times AND exercising the guard rails' *triggering*
paths explicitly:

- **distributed union-find**: the natural corpus stays under the 1M
  driver-edge cap, so one keeper run forces ``driver_edge_cap=0`` and
  asserts the pointer-doubling fixpoint produces the IDENTICAL keeper
  assignment the driver union-find gives.
- **hot-bucket cap**: a degenerate boilerplate flood (3,000 identical
  documents — every one lands in the same LSH bucket per band) is
  appended in a stressor scenario; ``max_bucket=64`` must drop those
  buckets (hot frame non-empty) and keep the candidate join off the
  b² cliff. The capped run's time is recorded next to the uncapped
  one on the same stressor corpus.
- **sketch anchor gate**: approx_distinct_and_percentiles at sf1 must
  return NULL anchors (the exact verification plan is gated off above
  100k input rows).

The documents/embeddings tables are duplicated with id offsets — ten
identical copies of every document models a re-crawl corpus and makes
every doc a member of a ~10-cluster, which is a *heavier* dedup load
per row than sf0.1's planted-duplicate rate.

Usage: python tools/sf1_rehearsal.py [--out /tmp/sf1] [--copies 10]
Prints one JSON document; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# quiet-r04/r05 sf0.1 reference walls (seconds) for the 10x comparison
SF01_BASELINE = {
    "price_percentiles_by_flag": 2.73,
    "approx_distinct_and_percentiles": 0.94,
    "doc_minhash_lsh_dedup": 4.2,
    "doc_fuzzy_dedup_keepers": 3.3,
    "doc_dedup_cluster_sizes": 0.5,
    "emb_knn_cosine": 0.6,
    "emb_near_dup_cosine": 0.7,
    "emb_lsh_bucketed_cosine_pairs": 1.0,
    "emb_ann_lsh_topk": 0.9,
    "emb_ann_ivf_topk": 1.2,
    # round-5b additions (warm sf0.1 walls, media corpus pre-built)
    "doc_chunk_text": 0.63,
    "doc_pack_sequences": 1.39,
    "media_image_features": 1.42,
    "media_audio_chunks": 1.09,
    "media_video_frame_sample": 0.99,
    "media_resize_features": 1.26,
}
MEDIA_CORPUS_BUILD_SF01 = 3.59  # encode+write all kinds, sf0.1 warm


def make_sf1(spark, out_dir: str, copies: int) -> None:
    """10x the sf0.1 tables the rehearsal families read."""
    offs = 10_000_000
    jobs = {
        "lineitem": ("l_orderkey",),
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
    }
    for table, id_cols in jobs.items():
        path = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(path):
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        parts = []
        for i in range(copies):
            df = src
            for c in id_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * offs))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(path)
        print(f"wrote {path}", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from clickhouse_build_spark.session import get_spark

    spark = get_spark(app_name="sf1_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(args.out, exist_ok=True)
    make_sf1(spark, args.out, args.copies)

    from clickhouse_build_spark.plans import REGISTRY

    results: dict[str, dict] = {}

    def run(name: str, fn=None):
        t0 = time.time()
        n = (fn or REGISTRY[name].builder)(spark, args.out).count()
        dt = time.time() - t0
        base = SF01_BASELINE.get(name)
        results[name] = {
            "rows": n,
            "sec": round(dt, 2),
            "sf01_sec": base,
            "ratio_vs_sf01": round(dt / base, 2) if base else None,
        }
        print(f"{name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    # ---- percentile family ------------------------------------------
    run("price_percentiles_by_flag")
    run("approx_distinct_and_percentiles")
    anchors = (
        REGISTRY["approx_distinct_and_percentiles"]
        .builder(spark, args.out)
        .select("exact_parts")
        .collect()
    )
    results["approx_distinct_and_percentiles"]["anchors_gated_off"] = all(
        r.exact_parts is None for r in anchors
    )

    # ---- dedup family (shared artifacts build inside the first) -----
    run("doc_minhash_lsh_dedup")
    run("doc_fuzzy_dedup_keepers")
    run("doc_dedup_cluster_sizes")

    # forced distributed union-find: identical keepers, cap bypassed
    from clickhouse_build_spark.operators.dedup import dedup_keepers
    from clickhouse_build_spark.plans.dedup import shared_minhash_pairs

    docs = spark.read.parquet(os.path.join(args.out, "documents.parquet"))
    pairs = shared_minhash_pairs(spark, args.out)
    n_edges = pairs.count()
    t0 = time.time()
    dist = dedup_keepers(pairs, docs.select("doc_id"), driver_edge_cap=0)
    drv = dedup_keepers(pairs, docs.select("doc_id"))  # under cap → driver path
    mismatch = (
        dist.alias("a")
        .join(drv.alias("b"), "doc_id")
        .filter(F.col("a.keeper") != F.col("b.keeper"))
        .count()
    )
    results["unionfind_distributed_forced"] = {
        "edges": n_edges,
        "sec": round(time.time() - t0, 2),
        "branch": "distributed pointer-doubling (driver_edge_cap=0)",
        "matches_driver_unionfind": mismatch == 0,
    }
    print(f"union-find forced-distributed: {n_edges} edges, "
          f"mismatches={mismatch}", file=sys.stderr)

    # ---- hot-bucket cap stressor ------------------------------------
    from clickhouse_build_spark.operators.dedup import (
        hot_bucket_filter,
        minhash_lsh_pairs,
        minhash_signatures,
        word_shingles,
    )

    boiler = spark.range(3000).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.lit(
            "standard legal boilerplate notice all rights reserved "
            "unsubscribe here terms of service apply"
        ).alias("text"),
    )
    stress = docs.select("doc_id", "text").unionByName(boiler)
    t0 = time.time()
    capped = minhash_lsh_pairs(
        stress, "doc_id", "text", shingle_n=3, bands=4, rows_per_band=4,
        threshold=0.5, max_bucket=64,
    ).count()
    t_capped = time.time() - t0
    # how many buckets did the guard actually drop? (same banding
    # construction lsh_candidate_pairs uses inline)
    sh = word_shingles(stress, "doc_id", "text", n=3, distinct=False)
    sig = minhash_signatures(sh, "doc_id", num_perm=16)
    band_keys = [
        F.concat_ws(
            "-",
            *[F.element_at("sig", j * 4 + i + 1).cast("string") for i in range(4)],
        )
        for j in range(4)
    ]
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "key")
    )
    _, hot = hot_bucket_filter(banded, ["band", "key"], 64)
    n_hot = hot.count()
    results["hot_bucket_stressor"] = {
        "boilerplate_docs": 3000,
        "capped_pairs": capped,
        "capped_sec": round(t_capped, 2),
        "hot_buckets_dropped": n_hot,
        "cap_triggered": bool(n_hot),
    }
    print(f"hot-bucket stressor: {capped} pairs in {t_capped:.2f}s, "
          f"{n_hot} hot buckets dropped", file=sys.stderr)

    # ---- ANN family --------------------------------------------------
    for q in (
        "emb_knn_cosine",
        "emb_near_dup_cosine",
        "emb_lsh_bucketed_cosine_pairs",
        "emb_ann_lsh_topk",
        "emb_ann_ivf_topk",
    ):
        run(q)

    # ---- context assembly (round 5b) ---------------------------------
    # doc_chunk_text: codegen fan-out, rows scale with total tokens.
    # doc_pack_sequences: the distributed two-phase prefix sum — the
    # probe that matters is that NO single task sees the whole corpus
    # (the global window never receives more than one bucket).
    run("doc_chunk_text")
    run("doc_pack_sequences")

    # ---- media corpus at rest (round 5b) -----------------------------
    # Build (encode PNG/WAV/Y4M + kind-partitioned parquet write) is
    # timed apart from the queries, which at steady state are
    # kind-pruned scans + real decode.
    from clickhouse_build_spark.plans.multimodal import (
        drop_media_corpus,
        shared_media_corpus,
    )

    t0 = time.time()
    n_media = shared_media_corpus(spark, args.out).count()
    t_build = time.time() - t0
    results["media_corpus_build"] = {
        "rows": n_media,
        "sec": round(t_build, 2),
        "sf01_sec": MEDIA_CORPUS_BUILD_SF01,
        "ratio_vs_sf01": round(t_build / MEDIA_CORPUS_BUILD_SF01, 2),
    }
    print(f"media corpus build: {n_media} rows in {t_build:.2f}s",
          file=sys.stderr)
    try:
        for q in (
            "media_image_features",
            "media_audio_chunks",
            "media_video_frame_sample",
            "media_resize_features",
        ):
            run(q)
    finally:
        drop_media_corpus(spark)

    worst = max(
        (r["ratio_vs_sf01"] for r in results.values()
         if isinstance(r, dict) and r.get("ratio_vs_sf01")),
        default=None,
    )
    out = {
        "sf": 1.0,
        "copies": args.copies,
        "out_dir": args.out,
        "worst_ratio_vs_sf01_at_10x_data": worst,
        "results": results,
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
