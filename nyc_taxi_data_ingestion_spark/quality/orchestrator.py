"""DQ orchestration (SURVEY §2.9 Q16).

Parity with ``src/data_quality/orchestrator.py:74-197`` validate_table:
counts → basic checks → anomaly → expectations → score → (optional)
error capture → optional raise. The whole basic+expectation stage is
two Spark jobs total (one agg per stage) instead of the reference's
one-job-per-check.

All five of the reference's weighted score components are wired
(``src/data_quality/metrics.py:178-270``): completeness + validity from
the one-pass check counters, consistency from the expectations suite,
accuracy from reconciliation results (fallback: the anomaly-rate
heuristic), timeliness from a timestamp-column freshness check. When a
metrics store path is configured, null-spike detection consumes the
stored historical rate (``anomaly_detection.py:257-306``) and the run's
report is appended back to the store (``metrics.py:299-345``) — the
history feedback loop the reference runs through JSON files.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.quality.anomaly import null_spike, zscore_anomalies
from nyc_taxi_data_ingestion_spark.quality.checks import Check, run_checks
from nyc_taxi_data_ingestion_spark.quality.expectations import (
    Expectation,
    run_expectations,
)
from nyc_taxi_data_ingestion_spark.quality.metrics import (
    accuracy_from_reconciliation,
    completeness_from_checks,
    quality_score,
    timeliness_from_freshness,
    validity_from_checks,
)


@dataclass
class ValidationConfig:
    checks: list[Check] = field(default_factory=list)
    expectations: list[Expectation] = field(default_factory=list)
    anomaly_columns: list[str] = field(default_factory=list)
    zscore_k: float = 3.0
    # accuracy: precomputed quality/reconciliation.py results (each a
    # dict with a "passed" key)
    reconciliations: list[dict[str, Any]] = field(default_factory=list)
    # timeliness: freshness of max(timestamp_column) relative to as_of
    # (as_of pinned for deterministic tests; None → wall clock)
    timestamp_column: str | None = None
    as_of: datetime | None = None
    # null-spike detection, optionally history-driven via metrics_store
    null_spike_columns: list[str] = field(default_factory=list)
    null_spike_factor: float = 2.0
    metrics_store: str | None = None
    save_metrics: bool = False
    raise_on_failure: bool = False


class ValidationError(RuntimeError):
    pass


def validate_table(
    df: DataFrame, config: ValidationConfig, table_name: str = "<unnamed>"
) -> dict[str, Any]:
    """Run the full validation pipeline; returns the report dict the
    reference persists as metrics JSON (metrics.py:312-337)."""
    report: dict[str, Any] = {"table": table_name}

    # The stages up to scoring are INDEPENDENT driver actions over the
    # same table (checks agg, expectations agg, per-column anomaly
    # passes, null-spike passes, freshness max). Running them
    # sequentially leaves the cluster idle in every driver round-trip
    # and every stage tail, so they overlap through a small thread
    # pool (guide §2.6: Spark's scheduler runs concurrent jobs FIFO,
    # later jobs back-fill executors freed by earlier tails). Each
    # task's result — and the assembled report — is identical to the
    # sequential form; exceptions propagate on .result() exactly as
    # they did inline. Threads are inheritable (r12 ADVICE) so job
    # groups/descriptions propagate under pinned-thread mode.
    from nyc_taxi_data_ingestion_spark.parallel import _inheritable
    from concurrent.futures import ThreadPoolExecutor

    def _anomaly(col: str) -> dict[str, Any]:
        return {
            k: v
            for k, v in zscore_anomalies(
                df, col, config.zscore_k, with_sample=False
            ).items()
            if k != "sample"
        }

    def _spike(col: str) -> dict[str, Any]:
        from nyc_taxi_data_ingestion_spark.quality.store import (
            historical_null_rate,
        )

        hist = (
            historical_null_rate(
                df.sparkSession, config.metrics_store, table_name, col
            )
            if config.metrics_store
            else None
        )
        return null_spike(
            df, col, historical_rate=hist, factor=config.null_spike_factor
        )

    def _freshness():
        return df.agg(F.max(config.timestamp_column)).first()[0]

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_checks = pool.submit(_inheritable(run_checks), df, config.checks)
        f_exp = pool.submit(
            _inheritable(run_expectations), df, config.expectations
        )
        f_anom = {
            col: pool.submit(_inheritable(_anomaly), col)
            for col in config.anomaly_columns
        }
        f_spike = {
            col: pool.submit(_inheritable(_spike), col)
            for col in config.null_spike_columns
        }
        f_fresh = (
            pool.submit(_inheritable(_freshness))
            if config.timestamp_column
            else None
        )
        check_result = f_checks.result()
        report["checks"] = check_result
        exp_result = f_exp.result()
        report["expectations"] = exp_result
        report["anomalies"] = {
            col: f.result() for col, f in f_anom.items()
        }
        if config.null_spike_columns:
            report["null_spikes"] = {
                col: f.result() for col, f in f_spike.items()
            }

    components = {
        "completeness": completeness_from_checks(check_result["metrics"]),
        "validity": validity_from_checks(check_result["metrics"]),
        "consistency": (
            100.0
            * sum(r["success"] for r in exp_result["results"])
            / len(exp_result["results"])
            if exp_result["results"]
            else 100.0
        ),
        "accuracy": accuracy_from_reconciliation(
            config.reconciliations,
            anomaly_findings=sum(
                int(a["count"] > 0) for a in report["anomalies"].values()
            )
            + sum(
                int(s["is_spike"]) for s in report.get("null_spikes", {}).values()
            ),
            total_rows=check_result["metrics"].get("row_count", 0),
        ),
    }
    if config.timestamp_column:
        max_ts = f_fresh.result()
        if max_ts is not None:
            as_of = config.as_of or datetime.now(timezone.utc).replace(tzinfo=None)
            if not isinstance(max_ts, datetime):  # DATE column
                max_ts = datetime.combine(max_ts, datetime.min.time())
            freshness_h = (as_of - max_ts).total_seconds() / 3600.0
            report["freshness_hours"] = freshness_h
            components["timeliness"] = timeliness_from_freshness(freshness_h)
    report["score"] = quality_score(components)

    report["passed"] = check_result["passed"] and exp_result["success"]

    if config.metrics_store and config.save_metrics:
        from nyc_taxi_data_ingestion_spark.quality.store import save_report

        save_report(df.sparkSession, report, config.metrics_store)

    if config.raise_on_failure and not report["passed"]:
        raise ValidationError(f"validation failed for {table_name}: {report}")
    return report
