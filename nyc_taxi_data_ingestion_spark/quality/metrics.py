"""Quality scoring (SURVEY §2.9 Q14) — driver-side arithmetic.

Parity with ``src/data_quality/metrics.py:73-105`` weighted composite:
completeness .25, validity .25, consistency .20, accuracy .20,
timeliness .10 → 0-100 score + level. Component inputs come from the
single-pass check results (quality/checks.py), so scoring adds no
Spark jobs.
"""

from __future__ import annotations

from typing import Any

DEFAULT_WEIGHTS = {
    "completeness": 0.25,
    "validity": 0.25,
    "consistency": 0.20,
    "accuracy": 0.20,
    "timeliness": 0.10,
}

LEVELS = [
    (95.0, "excellent"),
    (85.0, "good"),
    (70.0, "fair"),
    (50.0, "poor"),
    (0.0, "critical"),
]


def quality_score(
    components: dict[str, float], weights: dict[str, float] | None = None
) -> dict[str, Any]:
    """Weighted composite of component scores (each 0-100). Missing
    components redistribute their weight proportionally, matching the
    reference's behavior of scoring only computed dimensions."""
    weights = dict(weights or DEFAULT_WEIGHTS)
    present = {k: v for k, v in weights.items() if k in components}
    total_w = sum(present.values()) or 1.0
    score = sum(components[k] * w for k, w in present.items()) / total_w
    level = next(name for cutoff, name in LEVELS if score >= cutoff)
    return {"score": score, "level": level, "components": dict(components)}


def completeness_from_checks(metrics: dict[str, Any]) -> float:
    """Completeness % from a quality/checks.py one-pass result: share of
    non-null cells across all null-checked columns."""
    total = metrics.get("row_count", 0)
    null_counts = [v for k, v in metrics.items() if k.startswith("null_count_")]
    if not total or not null_counts:
        return 100.0
    cells = total * len(null_counts)
    nulls = sum(null_counts)
    return (cells - nulls) / cells * 100.0


def validity_from_checks(metrics: dict[str, Any]) -> float:
    """Validity % from range/set/positive one-pass counters."""
    total = metrics.get("row_count", 0)
    bad_counts = [
        v
        for k, v in metrics.items()
        if k.startswith(("out_of_range_", "outside_set_", "non_positive_"))
    ]
    if not total or not bad_counts:
        return 100.0
    cells = total * len(bad_counts)
    bad = sum(bad_counts)
    return (cells - bad) / cells * 100.0


def accuracy_from_reconciliation(
    reconciliations: list[dict[str, Any]] | None,
    anomaly_findings: int = 0,
    total_rows: int = 0,
) -> float:
    """Accuracy % — share of passed cross-table reconciliation checks
    (row_count / aggregation / key_integrity / completeness results from
    quality/reconciliation.py) when any ran; cross-layer agreement is
    the strongest accuracy signal available. Falls back to the
    reference's anomaly-rate heuristic (``metrics.py:238-252``: each
    finding assumed to affect ~100 rows, floor 50) when no
    reconciliation was configured."""
    if reconciliations:
        passed = sum(1 for r in reconciliations if r.get("passed"))
        return passed / len(reconciliations) * 100.0
    if not total_rows:
        return 100.0
    estimated_affected = anomaly_findings * 100
    if estimated_affected >= total_rows:
        return 50.0
    return max(50.0, 100.0 - estimated_affected / total_rows * 100.0)


def timeliness_from_freshness(
    freshness_hours: float | None = None,
    ingestion_lag_seconds: float | None = None,
) -> float:
    """Timeliness % — the reference's deduction formula
    (``metrics.py:256-270``): −2 points per hour of staleness past 24 h
    (capped at 50), −0.1 per second of ingestion lag past 60 s (capped
    at 25)."""
    score = 100.0
    if freshness_hours is not None and freshness_hours > 24:
        score -= min(50.0, (freshness_hours - 24) * 2)
    if ingestion_lag_seconds is not None and ingestion_lag_seconds > 60:
        score -= min(25.0, (ingestion_lag_seconds - 60) / 10)
    return max(0.0, score)
