"""Operator-level unit tests for transform.py extensions (the registry
oracle-parity sweep covers them end-to-end; these pin the semantic edge
cases and plan-shape claims that sf0.01 data may not exercise)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.operators.transform import scd2_history


def _scd2_fixture(spark):
    rows = [
        (1, "A", "2024-01-01 10:00:00", 1),
        (1, "A", "2024-01-01 11:00:00", 2),   # unchanged → same version
        (1, "B", "2024-01-02 10:00:00", 3),   # change
        (1, "A", "2024-01-03 10:00:00", 4),   # A returns → NEW version
        (2, "X", "2024-01-01 09:00:00", 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    return scd2_history(
        df, ["user_id"], ["event_type"], "ts", tie_breakers=["event_id"]
    )


def test_scd2_versions_reopen_and_close(spark):
    out = _scd2_fixture(spark)
    got = [
        (r.user_id, r.event_type, r.valid_to is None, r.is_current)
        for r in out.orderBy("user_id", "valid_from").collect()
    ]
    # A run of 2 events collapses to one version; A→B→A yields THREE
    # versions for user 1 (history, not distinct attributes)
    assert got == [
        (1, "A", False, False),
        (1, "B", False, False),
        (1, "A", True, True),
        (2, "X", True, True),
    ]
    closed = out.filter(~F.col("is_current")).collect()
    # each closed version's valid_to is the successor's valid_from
    by_user = {}
    for r in out.orderBy("user_id", "valid_from").collect():
        by_user.setdefault(r.user_id, []).append(r)
    for rows_ in by_user.values():
        for a, b in zip(rows_, rows_[1:]):
            assert a.valid_to == b.valid_from
    assert len(closed) == 2


def test_scd2_single_shuffle_plan(spark):
    """The three window passes + group-agg share one per-key Exchange —
    the operator's scale contract."""
    out = _scd2_fixture(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall("Exchange", plan)) == 1, plan
