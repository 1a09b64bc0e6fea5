"""Structured Streaming surface (SURVEY §2.9).

The reference's only streaming semantics are the CDC replication modes
(snapshot / cdc / cdc_only, ``src/tools/data_migrator.py:10-21``) —
ClickPipes handles the change feed opaquely. Here the live path is
real: file-source ``readStream`` → event-time windows with watermarks →
sinks, plus a ``foreachBatch`` loop that drives the same
``Replicator`` merge used by batch CDC (continuous sync, C2), and an
``applyInPandasWithState`` custom stateful operator.
"""

from clickhouse_build_spark.streaming.docs import (
    admission_counts,
    batch_clean_twin,
    clean_doc_stream,
    quality_gate,
    read_doc_stream,
    stage_doc_chunks,
)
from clickhouse_build_spark.streaming.pipeline import (
    cdc_stream_writer,
    enrich_with_static,
    views_after_errors_stream,
    dedup_stream,
    read_event_stream,
    running_user_totals,
    session_aggregates,
    sliding_counts,
    stage_event_chunks,
    tumbling_counts,
)

__all__ = [
    "admission_counts",
    "batch_clean_twin",
    "clean_doc_stream",
    "quality_gate",
    "read_doc_stream",
    "stage_doc_chunks",
    "cdc_stream_writer",
    "enrich_with_static",
    "views_after_errors_stream",
    "dedup_stream",
    "read_event_stream",
    "running_user_totals",
    "session_aggregates",
    "sliding_counts",
    "stage_event_chunks",
    "tumbling_counts",
]
