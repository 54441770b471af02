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
