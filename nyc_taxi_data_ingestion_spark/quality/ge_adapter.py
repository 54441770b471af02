"""Great-Expectations delegation (SURVEY §2.9 Q9 parity surface).

The reference's validator can hand its suite to the real
``great_expectations`` package when installed, calling one
``expect_*`` method per expectation on a ``SparkDFDataset``
(``src/data_quality/great_expectations.py:150-214``), and falls back
to its own evaluators otherwise. This module is that delegation mode
for our :class:`~.expectations.Expectation` suite: the same suite a
user runs through :func:`~.expectations.run_expectations` can be
executed by GE itself, and the verdicts must agree.

Import-gated: the sandbox does not ship ``great_expectations``, so
the pure mapping (our kinds → GE method names/kwargs) is always
testable, and :func:`run_with_great_expectations` raises a clear
ImportError when the package is absent. When GE *is* present, note
the scale difference and keep it deliberate: GE issues one Spark job
per expectation (exactly like the reference), while
``run_expectations`` compiles the whole suite into one aggregate —
delegation is an interop/verification surface, not the scale path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from nyc_taxi_data_ingestion_spark.quality.expectations import Expectation

# our kind → GE SparkDFDataset method (the classic v2 / dataset API the
# reference targets; these names are stable through GE v3's
# validator.expect_* surface too)
_GE_METHOD = {
    "not_null": "expect_column_values_to_not_be_null",
    "between": "expect_column_values_to_be_between",
    "in_set": "expect_column_values_to_be_in_set",
    "mean_between": "expect_column_mean_to_be_between",
    "row_count_between": "expect_table_row_count_to_be_between",
    "unique_count_between": "expect_column_unique_value_count_to_be_between",
    "match_regex": "expect_column_values_to_match_regex",
}


def to_ge_call(exp: Expectation) -> tuple[str, dict[str, Any]]:
    """Map one Expectation to ``(ge_method_name, kwargs)`` — the pair
    the reference builds at ``great_expectations.py:183-192``. Pure
    and GE-independent, so the mapping itself is always under test."""
    if exp.kind not in _GE_METHOD:
        raise ValueError(f"unknown expectation kind: {exp.kind}")
    method = _GE_METHOD[exp.kind]
    kwargs: dict[str, Any] = {}
    if exp.column is not None:
        kwargs["column"] = exp.column
    if exp.kind in ("between", "mean_between", "row_count_between",
                    "unique_count_between"):
        if exp.min_value is not None:
            kwargs["min_value"] = exp.min_value
        if exp.max_value is not None:
            kwargs["max_value"] = exp.max_value
    if exp.kind == "in_set":
        kwargs["value_set"] = list(exp.values)
    if exp.kind == "match_regex":
        kwargs["regex"] = exp.regex
    return method, kwargs


def run_with_great_expectations(
    df: DataFrame, suite: list[Expectation]
) -> dict[str, Any]:
    """Execute the suite through the REAL great_expectations package
    (reference ``_validate_with_ge``). Returns the same summary shape
    as :func:`~.expectations.run_expectations` so callers can diff the
    two verdicts expectation-by-expectation. Raises ImportError when
    GE is not installed — callers choose the fallback explicitly, like
    the reference's ``use_ge`` flag."""
    try:
        from great_expectations.dataset import SparkDFDataset
    except ImportError as exc:  # pragma: no cover - GE absent in sandbox
        raise ImportError(
            "great_expectations is not installed; use "
            "quality.expectations.run_expectations (the single-pass "
            "evaluator) instead"
        ) from exc

    ge_df = SparkDFDataset(df)
    cols = set(df.columns)
    applicable = [e for e in suite if e.column is None or e.column in cols]
    results = []
    for exp in applicable:
        method_name, kwargs = to_ge_call(exp)
        method = getattr(ge_df, method_name, None)
        if method is None:  # reference logs-and-skips unsupported kinds
            results.append(
                {"name": exp.name, "observed": None, "success": False,
                 "error": f"GE method missing: {method_name}"}
            )
            continue
        out = method(**kwargs)
        # GE returns a plain dict (classic dataset API) or an
        # ExpectationValidationResult object (v3 validator surface) —
        # read both shapes symmetrically
        if isinstance(out, dict):
            res = out.get("result", {}) or {}
            success = out["success"]
        else:
            res = getattr(out, "result", {}) or {}
            success = getattr(out, "success")
        observed = res.get(
            "unexpected_count", res.get("observed_value")
        )
        results.append(
            {"name": exp.name, "observed": observed,
             "success": bool(success)}
        )
    return {
        "results": results,
        "success": all(r["success"] for r in results),
        "skipped": [e.name for e in suite if e not in applicable],
    }
