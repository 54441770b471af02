"""DQ orchestration (SURVEY §2.9 Q16).

Parity with ``src/data_quality/orchestrator.py:74-197`` validate_table:
counts → basic checks → anomaly → expectations → score → (optional)
error capture → optional raise. The whole basic+expectation stage is
two Spark jobs total (one agg per stage) instead of the reference's
one-job-per-check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from nyc_taxi_data_ingestion_spark.quality.anomaly import zscore_anomalies
from nyc_taxi_data_ingestion_spark.quality.checks import Check, run_checks
from nyc_taxi_data_ingestion_spark.quality.expectations import (
    Expectation,
    run_expectations,
)
from nyc_taxi_data_ingestion_spark.quality.metrics import (
    completeness_from_checks,
    quality_score,
    validity_from_checks,
)


@dataclass
class ValidationConfig:
    checks: list[Check] = field(default_factory=list)
    expectations: list[Expectation] = field(default_factory=list)
    anomaly_columns: list[str] = field(default_factory=list)
    zscore_k: float = 3.0
    raise_on_failure: bool = False


class ValidationError(RuntimeError):
    pass


def validate_table(
    df: DataFrame, config: ValidationConfig, table_name: str = "<unnamed>"
) -> dict[str, Any]:
    """Run the full validation pipeline; returns the report dict the
    reference persists as metrics JSON (metrics.py:312-337)."""
    report: dict[str, Any] = {"table": table_name}

    check_result = run_checks(df, config.checks)
    report["checks"] = check_result

    exp_result = run_expectations(df, config.expectations)
    report["expectations"] = exp_result

    report["anomalies"] = {
        col: {
            k: v
            for k, v in zscore_anomalies(
                df, col, config.zscore_k, with_sample=False
            ).items()
            if k != "sample"
        }
        for col in config.anomaly_columns
    }

    exp_success_pct = (
        100.0
        * sum(r["success"] for r in exp_result["results"])
        / max(len(exp_result["results"]), 1)
        if exp_result["results"]
        else 100.0
    )
    score = quality_score(
        {
            "completeness": completeness_from_checks(check_result["metrics"]),
            "validity": validity_from_checks(check_result["metrics"]),
            "consistency": exp_success_pct,
        }
    )
    report["score"] = score

    report["passed"] = check_result["passed"] and exp_result["success"]
    if config.raise_on_failure and not report["passed"]:
        raise ValidationError(f"validation failed for {table_name}: {report}")
    return report
