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


def test_delegation_path_with_stubbed_ge(spark, monkeypatch):
    """Exercise the GE-PRESENT code path without the real package: a
    stub SparkDFDataset implements the classic dataset API over the
    same DataFrame (dict results) plus one v3-style object result, and
    omits one method. This certifies OUR orchestration — applicability
    filtering, dispatch, both result shapes, the missing-method path —
    while test_ge_verdicts_match_single_pass_evaluator remains the
    real-package agreement gate wherever GE is installed."""
    import sys
    import types

    from pyspark.sql import functions as F

    class ObjResult:  # GE v3 ExpectationValidationResult shape
        def __init__(self, success, result):
            self.success = success
            self.result = result

    class StubSparkDFDataset:
        def __init__(self, df):
            self.df = df

        def expect_column_values_to_not_be_null(self, column):
            bad = self.df.filter(F.col(column).isNull()).count()
            return {"success": bad == 0,
                    "result": {"unexpected_count": bad}}

        def expect_column_values_to_be_between(
            self, column, min_value=None, max_value=None
        ):
            pred = F.lit(False)
            if min_value is not None:
                pred = pred | (F.col(column) < min_value)
            if max_value is not None:
                pred = pred | (F.col(column) > max_value)
            bad = self.df.filter(F.col(column).isNotNull() & pred).count()
            return {"success": bad == 0,
                    "result": {"unexpected_count": bad}}

        def expect_column_values_to_be_in_set(self, column, value_set):
            bad = self.df.filter(
                F.col(column).isNotNull() & ~F.col(column).isin(value_set)
            ).count()
            return {"success": bad == 0,
                    "result": {"unexpected_count": bad}}

        def expect_column_mean_to_be_between(
            self, column, min_value=None, max_value=None
        ):
            mean = self.df.agg(F.avg(column)).collect()[0][0]
            ok = (min_value is None or mean >= min_value) and (
                max_value is None or mean <= max_value
            )
            return ObjResult(ok, {"observed_value": mean})

        def expect_table_row_count_to_be_between(
            self, min_value=None, max_value=None
        ):
            n = self.df.count()
            ok = (min_value is None or n >= min_value) and (
                max_value is None or n <= max_value
            )
            return {"success": ok, "result": {"observed_value": n}}

        def expect_column_unique_value_count_to_be_between(
            self, column, min_value=None, max_value=None
        ):
            n = self.df.select(column).distinct().count()
            ok = (min_value is None or n >= min_value) and (
                max_value is None or n <= max_value
            )
            return {"success": ok, "result": {"observed_value": n}}

        # expect_column_values_to_match_regex deliberately ABSENT —
        # exercises the reference's log-and-mark-failed path

    ge_mod = types.ModuleType("great_expectations")
    ds_mod = types.ModuleType("great_expectations.dataset")
    ds_mod.SparkDFDataset = StubSparkDFDataset
    ge_mod.dataset = ds_mod
    monkeypatch.setitem(sys.modules, "great_expectations", ge_mod)
    monkeypatch.setitem(sys.modules, "great_expectations.dataset", ds_mod)

    df = spark.createDataFrame(
        [(1.0, "a", 2.0), (None, "b", 4.0), (5.0, "zz", 6.0)],
        "amount double, category string, qty double",
    )
    suite = _suite() + [
        Expectation("between", "no_such_column", min_value=0)  # skipped
    ]
    got = run_with_great_expectations(df, suite)

    ours = run_expectations(df, _suite()[:-1])  # all but match_regex
    by_name = {r["name"]: r for r in got["results"]}
    for r in ours["results"]:
        assert by_name[r["name"]]["success"] == r["success"], r["name"]

    regex_row = by_name[_suite()[-1].name]
    assert regex_row["success"] is False
    assert "GE method missing" in regex_row["error"]
    assert len(got["skipped"]) == 1  # the absent-column expectation
    assert got["success"] is False  # the missing method fails the suite
