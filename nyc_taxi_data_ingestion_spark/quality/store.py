"""DQ metrics store + history feedback (SURVEY §2.9).

Parity: the reference persists one JSON metrics file per run
(``src/data_quality/metrics.py:299-345`` DataQualityReporter) and its
detectors consume stored history — null-spike compares the current
null rate against a historical rate
(``anomaly_detection.py:257-306``).

Engine redesign: instead of per-run JSON files, the store is a
run_day-partitioned parquet append table of flattened
``(run_id, run_ts, table_name, metric, column_name, value)`` rows —
scannable with partition pruning + predicate pushdown, mergeable
across thousands of runs, and joinable as a dimension for
history-driven checks at fleet scale (a JSON-file-per-run store is
unreadable at 100 TB operational history).
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from nyc_taxi_data_ingestion_spark.sources.sinks import append_table

METRICS_SCHEMA = (
    "run_id string, run_ts timestamp, run_day date, table_name string, "
    "metric string, column_name string, value double"
)

_VIOLATION_PREFIXES = ("out_of_range_", "outside_set_", "non_positive_")


def flatten_report(report: dict[str, Any]) -> list[tuple[str, str | None, float]]:
    """Flatten a validate_table report into (metric, column, value) rows
    — the long-format analogue of the reference's nested metrics JSON."""
    rows: list[tuple[str, str | None, float]] = []
    metrics = report.get("checks", {}).get("metrics", {})
    total = metrics.get("row_count")
    if total is not None:
        rows.append(("row_count", None, float(total)))
    for k, v in metrics.items():
        if k.startswith("null_count_"):
            col = k[len("null_count_") :]
            rows.append(("null_count", col, float(v)))
            if total:
                rows.append(("null_rate", col, float(v) / total))
        elif k.startswith(_VIOLATION_PREFIXES):
            rows.append((k, None, float(v)))
    for col, a in report.get("anomalies", {}).items():
        rows.append(("zscore_outliers", col, float(a.get("count", 0))))
    for col, s in report.get("null_spikes", {}).items():
        rows.append(("null_rate", col, float(s["null_rate"])))
    score = report.get("score", {})
    if score:
        rows.append(("quality_score", None, float(score["score"])))
        for comp, val in score.get("components", {}).items():
            rows.append((f"score_{comp}", None, float(val)))
    if "passed" in report:
        rows.append(("passed", None, 1.0 if report["passed"] else 0.0))
    # one null_rate row per (column, source); drop exact dupes from a
    # column appearing in both null-checks and spike config
    seen: set[tuple[str, str | None]] = set()
    out = []
    for m, c, v in rows:
        if (m, c) in seen:
            continue
        seen.add((m, c))
        out.append((m, c, v))
    return out


def save_report(
    spark: SparkSession,
    report: dict[str, Any],
    path: str,
    run_ts: datetime | None = None,
) -> str:
    """Append a flattened validate_table report to the metrics store.
    Returns the run_id (reference: save_metrics writes
    ``dq_{layer}_{table}_{timestamp}.json``)."""
    run_ts = run_ts or datetime.now(timezone.utc).replace(tzinfo=None)
    run_id = str(uuid.uuid4())
    table = report.get("table", "<unnamed>")
    rows = [
        (run_id, run_ts, run_ts.date(), table, metric, col, val)
        for metric, col, val in flatten_report(report)
    ]
    df = spark.createDataFrame(rows, METRICS_SCHEMA)
    append_table(df, path, partition_by=["run_day"])
    return run_id


def read_metrics(
    spark: SparkSession,
    path: str,
    table_name: str | None = None,
    metric: str | None = None,
    column_name: str | None = None,
    since_day: str | None = None,
) -> DataFrame:
    """Pushdown scan of the metrics store; ``since_day`` prunes
    partitions statically."""
    df = spark.read.parquet(path)
    if since_day:
        df = df.filter(F.col("run_day") >= since_day)
    for c, v in (
        ("table_name", table_name),
        ("metric", metric),
        ("column_name", column_name),
    ):
        if v is not None:
            df = df.filter(F.col(c) == v)
    return df


def historical_null_rate(
    spark: SparkSession,
    path: str,
    table_name: str,
    column: str,
    last_n: int = 5,
) -> float | None:
    """Mean stored null rate over the last `last_n` runs — the history
    input the reference's null-spike detector takes as
    ``historical_null_rate`` (``anomaly_detection.py:257-306``).
    Returns None when the store is absent/empty (detector falls back to
    its conservative default)."""
    try:
        df = read_metrics(spark, path, table_name, "null_rate", column)
        rows = (
            df.orderBy(F.col("run_ts").desc(), F.col("run_id"))
            .limit(last_n)
            .collect()
        )
    except AnalysisException:
        return None
    if not rows:
        return None
    return sum(r.value for r in rows) / len(rows)
