"""Streaming corpus-ingest equivalence: the quality gate + watermarked
exact dedup over staged document chunks must admit the same fingerprint
set as the batch twin, and replayed chunks must not re-admit documents
inside the watermark horizon."""

from __future__ import annotations

import pathlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouse_build_spark.streaming.docs import (
    admission_counts,
    batch_clean_twin,
    clean_doc_stream,
    quality_gate,
    read_doc_stream,
    stage_doc_chunks,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stage(spark):
    d = tempfile.mkdtemp(prefix="doc_stage_")
    stage_doc_chunks(spark, SF_SMOKE, d, n_chunks=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_append(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return q


def test_stream_admits_batch_fingerprint_set(spark, stage):
    clean = clean_doc_stream(read_doc_stream(spark, stage))
    _run_append(clean.select("fingerprint", "doc_id", "lang"), "t_doc_clean")
    got = {
        r["fingerprint"]
        for r in spark.sql("SELECT fingerprint FROM t_doc_clean").collect()
    }
    want = {r["fingerprint"] for r in batch_clean_twin(spark, SF_SMOKE).collect()}
    assert got == want
    # exactly one admission per fingerprint
    n = spark.sql("SELECT count(*) AS n FROM t_doc_clean").head()["n"]
    assert n == len(want)


def test_quality_gate_rejects_before_state(spark, stage):
    docs = spark.read.schema(
        read_doc_stream(spark, stage).schema
    ).parquet(stage)
    gated = quality_gate(docs)
    words_ok = gated.select(
        F.size(F.split("text", " ")).alias("n")
    ).agg(F.min("n"), F.max("n")).head()
    assert words_ok[0] >= 20 and words_ok[1] <= 1000


def test_replayed_chunk_is_deduplicated(spark, stage, tmp_path):
    # Re-stage with chunk 0 duplicated as an extra file → same admitted set.
    replay = str(tmp_path / "replay")
    shutil.copytree(stage, replay)
    src = pathlib.Path(replay) / "__chunk=0"
    dst = pathlib.Path(replay) / "__chunk=9"
    shutil.copytree(src, dst)
    clean = clean_doc_stream(read_doc_stream(spark, replay))
    _run_append(clean.select("fingerprint"), "t_doc_replay")
    n = spark.sql("SELECT count(DISTINCT fingerprint) AS n FROM t_doc_replay").head()["n"]
    total = spark.sql("SELECT count(*) AS n FROM t_doc_replay").head()["n"]
    want = batch_clean_twin(spark, SF_SMOKE).count()
    assert n == want
    assert total == want  # replays dropped, not double-admitted


def test_admission_counts_match_batch_rollup(spark, stage):
    """Append mode emits only watermark-closed windows (final watermark
    = max event time - horizon), so the emitted set is every window
    whose end precedes it — checked cell-by-cell against the batch
    rollup of first-arrival keepers."""
    clean = clean_doc_stream(read_doc_stream(spark, stage), watermark="2 minutes")
    counts = admission_counts(clean, window="1 minute")
    q = (
        counts.writeStream.format("memory")
        .queryName("t_doc_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = {
        (r["start"], r["lang"]): r["n_admitted"]
        for r in spark.sql("SELECT * FROM t_doc_counts").collect()
    }
    twin = batch_clean_twin(spark, SF_SMOKE)
    max_ts = twin.agg(F.max("ingest_ts")).head()[0]
    import datetime

    final_wm = max_ts - datetime.timedelta(minutes=2)
    want = {
        ((r["w"]["start"]), r["lang"]): r["n"]
        for r in twin.groupBy(
            F.window("ingest_ts", "1 minute").alias("w"), "lang"
        )
        .agg(F.count("*").alias("n"))
        .collect()
        if r["w"]["end"] <= final_wm
    }
    assert want  # the horizon must leave some closed windows to check
    assert got == want
