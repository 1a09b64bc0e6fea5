"""Streaming near-dup admission: the live-tail twin of
``doc_incremental_dedup``.

Batch-side, a daily crawl deduplicates its delta against the existing
corpus (plans/dedup.py:doc_incremental_dedup). This module runs the
same decision as an admission gate on a STREAM of arriving documents:
the reference corpus's MinHash signature index is materialized at rest
ONCE (signatures + LSH band keys + exact fingerprints — exactly what a
production system precomputes at ingest), and every micro-batch of new
documents is shingled, signed with the identical permutations, banded
with the identical band keys (``operators/dedup.py:lsh_band_keys`` is
shared code, not a re-implementation), and joined against the at-rest
index to classify each arrival BEFORE it lands:

- ``exact``  — its md5 fingerprint already exists in the reference
- ``near``   — some reference doc shares an LSH band and the signature
  agreement (MinHash Jaccard estimate) clears the batch threshold;
  the lowest matching reference id is reported
- ``new``    — admit

Equivalence contract (pytest-asserted, tests/test_streaming_dedup.py):
streamed verdicts over the drip-fed delta are row-identical to
``doc_incremental_dedup``'s batch output on the same corpus split.

100 TB notes: the index frames carry (id, 16 longs), (id, band, key)
and (id, 16-byte digest) — never text; per micro-batch work is
|batch|·bands bucket lookups via broadcast-able hash joins against the
band index (bucketable/partitionable by key at scale); the verdict sink
reuses the epoch-keyed overwrite pattern (streaming/media.py), so a
replayed micro-batch converges instead of duplicating verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_build_spark.catalog import SCHEMAS, load_tables
from clickhouse_build_spark.operators.dedup import (
    lsh_band_keys,
    minhash_signatures_text,
)
from clickhouse_build_spark.plans.dedup import (
    BANDS,
    MINHASH_THRESHOLD,
    NEW_BATCH_MOD,
    NEW_BATCH_REM,
    ROWS_PER_BAND,
)

NUM_PERM = BANDS * ROWS_PER_BAND


def _is_new(col):
    return (col % NEW_BATCH_MOD) == NEW_BATCH_REM


def build_signature_store(
    spark: SparkSession, sf_dir: str, store_dir: str
) -> None:
    """Materialize the reference corpus's dedup index AT REST: MinHash
    signatures, their LSH band keys, and exact fingerprints, written as
    parquet under ``store_dir`` — the ingest-time precomputation the
    admission stream probes. Bands land partitioned by ``band`` so a
    band-key lookup prunes; at 100 TB the key space would be bucketed
    too."""
    docs = load_tables(spark, sf_dir)["documents"].filter(
        ~_is_new(F.col("doc_id"))
    )
    sig = minhash_signatures_text(
        docs, "doc_id", "text", shingle_n=3, num_perm=NUM_PERM
    )
    sig.write.mode("overwrite").parquet(f"{store_dir}/signatures")
    bands = lsh_band_keys(
        spark.read.parquet(f"{store_dir}/signatures"),
        "doc_id",
        BANDS,
        ROWS_PER_BAND,
    )
    bands.write.mode("overwrite").partitionBy("band").parquet(
        f"{store_dir}/bands"
    )
    docs.select("doc_id", F.md5("text").alias("fp")).write.mode(
        "overwrite"
    ).parquet(f"{store_dir}/fingerprints")


def read_new_doc_stream(
    spark: SparkSession, stage_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    schema = T.StructType(list(SCHEMAS["documents"].fields))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(stage_dir)
    )


def classify_batch(
    batch: DataFrame,
    ref_sigs: DataFrame,
    ref_bands: DataFrame,
    ref_fps: DataFrame,
) -> DataFrame:
    """One micro-batch of documents → (doc_id, verdict, ref_doc_id),
    the exact decision ``doc_incremental_dedup`` makes batch-side:
    exact beats near, near reports the lowest-id reference match."""
    sig_new = minhash_signatures_text(
        batch, "doc_id", "text", shingle_n=3, num_perm=NUM_PERM
    )
    bands_new = lsh_band_keys(sig_new, "doc_id", BANDS, ROWS_PER_BAND).select(
        F.col("doc_id").alias("new_id"), "band", "key"
    )
    cand = (
        bands_new.join(
            ref_bands.select(F.col("doc_id").alias("ref_id"), "band", "key"),
            ["band", "key"],
        )
        .select("new_id", "ref_id")
        .dropDuplicates(["new_id", "ref_id"])
    )
    matches = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    near_best = (
        cand.join(
            sig_new.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sig_a")),
            "new_id",
        )
        .join(
            ref_sigs.select(F.col("doc_id").alias("ref_id"), F.col("sig").alias("sig_b")),
            "ref_id",
        )
        .filter(matches.cast("double") / NUM_PERM >= MINHASH_THRESHOLD)
        .groupBy("new_id")
        .agg(F.min("ref_id").alias("near_ref"))
    )
    exact_best = (
        batch.select("doc_id", F.md5("text").alias("fp"))
        .join(ref_fps.select(F.col("doc_id").alias("rid"), "fp"), "fp")
        .groupBy("doc_id")
        .agg(F.min("rid").alias("exact_ref"))
    )
    return (
        batch.select("doc_id")
        .join(exact_best, "doc_id", "left")
        .join(near_best, F.col("doc_id") == F.col("new_id"), "left")
        .select(
            "doc_id",
            F.when(F.col("exact_ref").isNotNull(), "exact")
            .when(F.col("near_ref").isNotNull(), "near")
            .otherwise("new")
            .alias("verdict"),
            F.coalesce("exact_ref", "near_ref").alias("ref_doc_id"),
        )
    )


def stream_near_dup_admission(
    spark: SparkSession,
    stage_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Drain staged new-document files through the admission gate:
    every micro-batch is classified against the at-rest signature store
    and its verdicts land under an epoch-keyed subdirectory (overwrite
    on replay — the idempotent-sink recipe streaming/media.py uses).
    Returns the terminated availableNow query."""
    ref_sigs = spark.read.parquet(f"{store_dir}/signatures")
    ref_bands = spark.read.parquet(f"{store_dir}/bands")
    ref_fps = spark.read.parquet(f"{store_dir}/fingerprints")
    stream = read_new_doc_stream(spark, stage_dir, max_files_per_trigger)

    def land_batch(batch: DataFrame, batch_id: int) -> None:
        verdicts = classify_batch(batch, ref_sigs, ref_bands, ref_fps)
        verdicts.write.mode("overwrite").parquet(
            f"{out_dir}/ingest_batch={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(land_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_admission_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Verdicts across all drained epochs, bookkeeping column hidden."""
    return spark.read.parquet(out_dir).select("doc_id", "verdict", "ref_doc_id")
