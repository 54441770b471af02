"""Structured Streaming surface (extension — SURVEY §2.12: the
reference is batch-only; `kafka` exists only as a config enum with no
implementation, `lakehouse_config_schema_v1.json`).

Design: the same Silver transform chain and Gold aggregates run over
``readStream`` sources; watermarks bound state; tumbling/sliding/
session windows cover the time-series rollups a streaming deployment
of the reference would need. Every operator is testable deterministically
with ``Trigger.AvailableNow`` (process-everything-then-stop), which also
makes the streaming results oracle-comparable to batch SQL.
"""

from nyc_taxi_data_ingestion_spark.streaming.ingest import (  # noqa: F401
    category_drift_scores,
    commit_stream_batch,
    read_parquet_stream,
    run_available_now,
    snapshot_append_sink,
    running_totals_stream,
    silver_stream,
    sliding_counts,
    session_windows,
    stateful_profile,
    stream_corpus_dedup,
    stream_dedupe,
    stream_incremental_dedup,
    stream_stream_join,
    stream_upsert_sink,
    tumbling_aggregate,
)
