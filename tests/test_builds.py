"""Ingest/build entries (plans/builds.py): bench-order guarantee,
artifact reuse, and the non-SQL IVFPQ cell-histogram invariants."""

from pyspark.sql import functions as F

from clickhouse_build_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_build_entries_sort_before_their_consumers():
    # bench.py runs sorted(REGISTRY); the whole point of the build
    # entries is that they pay the one-time artifact cost BEFORE any
    # consumer row is timed.
    names = sorted(REGISTRY)
    order = {n: i for i, n in enumerate(names)}
    consumers = {
        "build_dedup_artifacts": [
            "doc_dedup_cluster_sizes",
            "doc_fuzzy_dedup_keepers",
            "doc_minhash_lsh_dedup",
            "doc_simhash",
        ],
        "build_ivfpq_index": ["emb_ivfpq_topk", "emb_pq_codes"],
        "build_media_corpus": [
            "media_adpcm_chunks",
            "media_audio_chunks",
            "media_image_features",
        ],
        "build_quality_model": [
            "corpus_quality_filter",
            "doc_quality_classifier",
            "doc_quality_classifier_model",
        ],
    }
    for build, deps in consumers.items():
        for c in deps:
            assert order[build] < order[c], (build, c)


def test_ivfpq_build_covers_every_vector_with_bounded_cells(spark):
    from clickhouse_build_spark.plans.similarity import (
        ivfpq_cells,
        shared_ivfpq_index,
    )

    n = REGISTRY["build_ivfpq_index"].builder(spark, SF).first()
    idx = shared_ivfpq_index(spark, SF)
    cells = idx.groupBy("cell").count().collect()
    assert len(cells) <= ivfpq_cells(spark, SF)
    assert sum(r["count"] for r in cells) == n["n_vectors_indexed"]
    assert all(r["count"] > 0 for r in cells)


def test_consumer_reuses_built_artifact(spark):
    # After the build entry runs, the consumer must read the SAME
    # persisted frame (session cache hit, no retrain).
    from clickhouse_build_spark.plans.dedup import shared_dedup_keepers

    REGISTRY["build_dedup_artifacts"].builder(spark, SF).collect()
    k1 = shared_dedup_keepers(spark, SF)
    k2 = shared_dedup_keepers(spark, SF)
    assert k1 is k2


def test_media_build_inventory_counts(spark):
    rows = REGISTRY["build_media_corpus"].builder(spark, SF).collect()
    total = sum(r["n_items"] for r in rows)
    import duckdb

    (n_docs,) = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()
    assert total == n_docs
    assert {(r["kind"], r["format"]) for r in rows} <= {
        ("image", "png"), ("image", "jpeg"),
        ("audio", "wav"), ("audio", "adpcm"), ("audio", "mdct"),
        ("video", "y4m"), ("video", "avi"), ("video", "pframe"),
    }
