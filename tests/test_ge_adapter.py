"""GE delegation adapter (reference
``src/data_quality/great_expectations.py:150-214``): the kind→method
mapping is always under test; the execution path runs only where the
real package is installed and must agree verdict-for-verdict with our
single-pass evaluator."""

from __future__ import annotations

import pytest

from nyc_taxi_data_ingestion_spark.quality.expectations import (
    Expectation,
    run_expectations,
)
from nyc_taxi_data_ingestion_spark.quality.ge_adapter import (
    run_with_great_expectations,
    to_ge_call,
)


def _suite() -> list[Expectation]:
    return [
        Expectation("not_null", "amount"),
        Expectation("between", "amount", min_value=-10, max_value=1000),
        Expectation("in_set", "category", values=("a", "b", "c")),
        Expectation("mean_between", "qty", min_value=0, max_value=10),
        Expectation("row_count_between", None, min_value=1),
        Expectation("unique_count_between", "category", min_value=1,
                    max_value=5),
        Expectation("match_regex", "category", regex="^[a-z]$"),
    ]


def test_mapping_covers_all_seven_kinds():
    seen = set()
    for exp in _suite():
        method, kwargs = to_ge_call(exp)
        assert method.startswith("expect_")
        seen.add(method)
        if exp.column is not None:
            assert kwargs["column"] == exp.column
        else:
            assert "column" not in kwargs
    assert len(seen) == 7  # one distinct GE expectation per kind


def test_mapping_kwargs_shapes():
    m, kw = to_ge_call(Expectation("in_set", "c", values=("x", "y")))
    assert (m, kw) == (
        "expect_column_values_to_be_in_set",
        {"column": "c", "value_set": ["x", "y"]},
    )
    m, kw = to_ge_call(Expectation("match_regex", "c", regex="^a"))
    assert kw == {"column": "c", "regex": "^a"}
    m, kw = to_ge_call(Expectation("between", "c", min_value=0))
    assert kw == {"column": "c", "min_value": 0}  # open upper bound stays absent
    with pytest.raises(ValueError, match="unknown expectation kind"):
        to_ge_call(Expectation("nope", "c"))


def test_missing_ge_raises_clear_importerror(spark):
    try:
        import great_expectations  # noqa: F401
        pytest.skip("great_expectations installed; inverse test applies")
    except ImportError:
        pass
    df = spark.createDataFrame([(1.0, "a", 2.0)], "amount double, category string, qty double")
    with pytest.raises(ImportError, match="run_expectations"):
        run_with_great_expectations(df, _suite())


def test_ge_verdicts_match_single_pass_evaluator(spark):
    pytest.importorskip("great_expectations")
    df = spark.createDataFrame(
        [(1.0, "a", 2.0), (None, "b", 4.0), (5.0, "zz", 6.0)],
        "amount double, category string, qty double",
    )
    ours = run_expectations(df, _suite())
    ge = run_with_great_expectations(df, _suite())
    assert [r["name"] for r in ge["results"]] == [
        r["name"] for r in ours["results"]
    ]
    for a, b in zip(ours["results"], ge["results"]):
        assert a["success"] == b["success"], a["name"]
    assert ge["success"] == ours["success"]
