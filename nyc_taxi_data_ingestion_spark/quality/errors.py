"""Row-level error capture (SURVEY §2.9 Q15).

Parity with ``src/data_quality/error_tracking.py:98-209,247-325``: for
a failing check, capture up to `sample_limit` offending rows, wrap them
in the 14-field error schema, and append to a partitioned error table.

Engine redesign: the error rows are built with Spark expressions (no
driver-side loop over collected rows except the final bounded sample),
and the sink is a day/layer-partitioned parquet append — the same
partition spec the reference uses (day(timestamp) + identity(layer),
``error_tracking.py:265-281``).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.sources.sinks import append_table

ERROR_COLUMNS = [
    "error_id",
    "error_timestamp",
    "layer",
    "table_name",
    "check_name",
    "check_type",
    "column_name",
    "error_type",
    "error_message",
    "severity",
    "row_data",
    "batch_id",
    "partition_day",
    "source_job",
]


def capture_errors(
    df: DataFrame,
    predicate,
    *,
    layer: str,
    table_name: str,
    check_name: str,
    check_type: str,
    column_name: str | None = None,
    severity: str = "medium",
    batch_id: str | None = None,
    source_job: str = "quality_orchestrator",
    sample_limit: int = 100,
) -> DataFrame:
    """Build the bounded error-row DataFrame for rows failing
    `predicate` (a Column). Caps at `sample_limit` rows (reference caps
    100/check, 1000/run — orchestrator.py:229-241)."""
    bad = df.filter(predicate).limit(sample_limit)
    row_json = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return bad.select(
        F.expr("uuid()").alias("error_id"),
        F.current_timestamp().alias("error_timestamp"),
        F.lit(layer).alias("layer"),
        F.lit(table_name).alias("table_name"),
        F.lit(check_name).alias("check_name"),
        F.lit(check_type).alias("check_type"),
        F.lit(column_name).cast("string").alias("column_name"),
        F.lit("row_level").alias("error_type"),
        F.lit(f"row failed {check_name}").alias("error_message"),
        F.lit(severity).alias("severity"),
        row_json.alias("row_data"),
        F.lit(batch_id or str(uuid.uuid4())).alias("batch_id"),
        F.current_date().alias("partition_day"),
        F.lit(source_job).alias("source_job"),
    )


def persist_errors(
    errors: DataFrame, path: str, csv_dir: str | None = None
) -> None:
    """Append to the (partition_day, layer)-partitioned error table.

    ``csv_dir``: optionally ALSO export the batch as CSV — the
    reference persists failing-row samples both to its error table and
    to a flat CSV for spreadsheet triage (ErrorTracker.save_to_csv,
    ``error_tracking.py:199-202``). Error frames are bounded samples
    (≤100/check, ≤1000/run), so a coalesce(1) single-file export is
    safe by construction — this is a human-triage artifact, never a
    data path."""
    if csv_dir is not None:
        (
            errors.coalesce(1)
            .write.mode("append")
            .option("header", "true")
            .csv(csv_dir)
        )
    append_table(errors, path, partition_by=["partition_day", "layer"])


def read_errors(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    since_day: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """S14 — predicate-pushdown scan of the error table (the reference's
    pyiceberg row_filter scan, error_tracking.py:327-387 — in Spark the
    filters below prune partitions statically)."""
    df = spark.read.parquet(path)
    if layer:
        df = df.filter(F.col("layer") == layer)
    if since_day:
        df = df.filter(F.col("partition_day") >= since_day)
    if limit:
        df = df.limit(limit)
    return df
