"""Unit tests for the quality framework (mirroring the reference's
invariant-based test strategy, SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.quality.anomaly import (
    iqr_anomalies,
    moving_average_bands,
    null_spike,
    zscore_anomalies,
)
from nyc_taxi_data_ingestion_spark.quality.checks import (
    NullCheck,
    PositiveCheck,
    RangeCheck,
    SetCheck,
    run_checks,
)
from nyc_taxi_data_ingestion_spark.quality.expectations import (
    Expectation,
    run_expectations,
    standard_suite,
)
from nyc_taxi_data_ingestion_spark.quality.metrics import (
    completeness_from_checks,
    quality_score,
    validity_from_checks,
)
from nyc_taxi_data_ingestion_spark.quality.orchestrator import (
    ValidationConfig,
    ValidationError,
    validate_table,
)
from nyc_taxi_data_ingestion_spark.quality.reconciliation import (
    check_aggregation,
    check_column_completeness,
    check_key_integrity,
    check_row_count,
)


@pytest.fixture(scope="module")
def dirty(spark):
    """Small frame with injected defects, FIXTURES.md §2 style."""
    rows = [
        # (id, amount, qty, category)
        (1, 10.0, 2, "a"),
        (2, -5.0, 1, "a"),      # negative amount
        (3, 20.0, None, "b"),   # null qty
        (4, 30.0, 3, "zz"),     # bad category
        (5, 999.0, 4, "b"),     # out of range
        (6, 15.0, 5, "c"),
    ]
    return spark.createDataFrame(rows, "id long, amount double, qty int, category string")


def test_run_checks_single_pass(dirty):
    res = run_checks(
        dirty,
        [
            NullCheck("qty"),
            PositiveCheck("amount"),
            RangeCheck("amount", min_value=0, max_value=100),
            SetCheck("category", allowed=("a", "b", "c")),
            NullCheck("missing_col"),  # skipped
        ],
    )
    m = res["metrics"]
    assert m["row_count"] == 6
    assert m["null_count_qty"] == 1
    assert m["non_positive_amount"] == 1
    assert m["out_of_range_amount"] == 2  # -5 and 999
    assert m["outside_set_category"] == 1
    assert res["skipped"] == ["missing_col"]
    assert not res["passed"]


def test_expectations_suite(dirty):
    suite = [
        Expectation("not_null", "amount"),
        Expectation("between", "amount", min_value=-10, max_value=1000),
        Expectation("in_set", "category", values=("a", "b", "c", "zz")),
        Expectation("mean_between", "qty", min_value=0, max_value=10),
        Expectation("row_count_between", None, min_value=1, max_value=100),
        Expectation("unique_count_between", "id", min_value=6, max_value=6),
        Expectation("match_regex", "category", regex="^[a-z]+$"),
    ]
    res = run_expectations(dirty, suite)
    assert res["success"], res
    # and a failing one
    res2 = run_expectations(dirty, [Expectation("between", "amount", min_value=0)])
    assert not res2["success"]


def test_standard_suite(dirty):
    # id/category have no nulls, qty >= 0 where present, row_count >= 1
    res = run_expectations(dirty, standard_suite(["id", "category"], ["qty"]))
    assert res["success"]
    # amount has a negative value → 'between min 0' fails
    res2 = run_expectations(dirty, standard_suite(["id"], ["amount"]))
    assert not res2["success"]


def test_zscore_and_iqr(spark):
    vals = [(float(i % 10),) for i in range(200)] + [(500.0,)]
    df = spark.createDataFrame(vals, "v double")
    z = zscore_anomalies(df, "v", k=3.0)
    assert z["count"] == 1
    assert z["sample"][0]["v"] == 500.0
    assert z["sample"][0]["severity"] in ("medium", "high", "critical")
    iqr = iqr_anomalies(df, "v", k=1.5)
    assert iqr["count"] >= 1


def test_null_spike(spark):
    df = spark.createDataFrame([(None,), ("x",), (None,), ("y",)], "c string")
    res = null_spike(df, "c", historical_rate=0.05, factor=2.0)
    assert res["null_rate"] == 0.5
    assert res["is_spike"]


def test_moving_average_bands_matches_pandas(spark):
    import pandas as pd

    counts = [10, 11, 9, 10, 12, 10, 11, 50, 10, 9, 11, 10]
    pdf = pd.DataFrame({"t": range(len(counts)), "v": [float(c) for c in counts]})
    roll = pdf["v"].rolling(7, min_periods=1)
    expected_avg = roll.mean()
    expected_std = roll.std()

    df = spark.createDataFrame(pdf, "t long, v double")
    out = (
        moving_average_bands(df, "t", "v", window_size=7, k=2.0)
        .orderBy("t")
        .toPandas()
    )
    assert out["moving_avg"].tolist() == pytest.approx(expected_avg.tolist())
    got_std = out["moving_std"].tolist()
    exp_std = expected_std.tolist()
    assert got_std[0] != got_std[0] or got_std[0] is None  # NaN for 1-row frame
    assert got_std[1:] == pytest.approx(exp_std[1:])
    assert bool(out.loc[out["v"] == 50.0, "is_anomaly"].iloc[0])


def test_reconciliation(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rc = check_row_count(orders, orders, tolerance_pct=0.0)
    assert rc["passed"]
    agg = check_aggregation(orders, orders, "o_totalprice", "o_totalprice")
    assert agg["passed"] and agg["difference_pct"] == 0.0
    ki = check_key_integrity(orders, lineitem, ["o_orderkey"], ["l_orderkey"])
    assert ki["missing_count"] == 257  # orders with no lineitem rows
    assert len(ki["sample"]) == 10
    cc = check_column_completeness(orders, lineitem, [("o_orderkey", "l_orderkey")])
    assert cc["passed"]


def test_quality_score():
    s = quality_score({"completeness": 100, "validity": 90, "consistency": 80})
    assert 80 <= s["score"] <= 100
    assert s["level"] in ("good", "excellent")
    assert quality_score({"completeness": 10})["level"] == "critical"


def test_metrics_from_checks():
    m = {"row_count": 100, "null_count_a": 10, "null_count_b": 0, "out_of_range_c": 5}
    assert completeness_from_checks(m) == 95.0
    assert validity_from_checks(m) == 95.0


def test_orchestrator(dirty):
    cfg = ValidationConfig(
        checks=[NullCheck("qty"), RangeCheck("amount", 0, 100)],
        expectations=[Expectation("row_count_between", None, min_value=1)],
        anomaly_columns=["amount"],
    )
    report = validate_table(dirty, cfg, "dirty")
    assert not report["passed"]
    assert report["score"]["score"] > 0
    cfg.raise_on_failure = True
    with pytest.raises(ValidationError):
        validate_table(dirty, cfg, "dirty")


def test_accuracy_and_timeliness_components():
    from nyc_taxi_data_ingestion_spark.quality.metrics import (
        accuracy_from_reconciliation,
        timeliness_from_freshness,
    )

    # reconciliation-driven: share of passed checks
    recons = [{"passed": True}, {"passed": True}, {"passed": False}]
    assert accuracy_from_reconciliation(recons) == pytest.approx(200 / 3)
    # fallback heuristic (metrics.py:238-252): ~100 rows per finding
    assert accuracy_from_reconciliation(None, anomaly_findings=0, total_rows=1000) == 100.0
    assert accuracy_from_reconciliation(None, anomaly_findings=1, total_rows=1000) == 90.0
    assert accuracy_from_reconciliation(None, anomaly_findings=50, total_rows=1000) == 50.0

    # freshness deductions (metrics.py:256-270)
    assert timeliness_from_freshness(1.0) == 100.0
    assert timeliness_from_freshness(34.0) == 80.0  # (34-24)*2 = 20 off
    assert timeliness_from_freshness(10_000.0) == 50.0  # capped at -50
    assert timeliness_from_freshness(1.0, ingestion_lag_seconds=160.0) == 90.0
    assert timeliness_from_freshness(10_000.0, ingestion_lag_seconds=1e9) == 25.0


def test_orchestrator_five_component_weighting(dirty):
    """All five DEFAULT_WEIGHTS components computed, score = weighted sum."""
    import datetime as dt

    from nyc_taxi_data_ingestion_spark.quality.metrics import DEFAULT_WEIGHTS
    from nyc_taxi_data_ingestion_spark.quality.reconciliation import check_row_count

    ts_df = dirty.withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    cfg = ValidationConfig(
        checks=[NullCheck("qty"), RangeCheck("amount", 0, 100)],
        expectations=[Expectation("row_count_between", None, min_value=1)],
        anomaly_columns=["amount"],
        reconciliations=[check_row_count(ts_df, ts_df)],
        timestamp_column="ts",
        as_of=dt.datetime(2024, 1, 3),  # 48h stale → timeliness 52
        null_spike_columns=["qty"],
    )
    report = validate_table(ts_df, cfg, "dirty")
    comps = report["score"]["components"]
    assert set(comps) == set(DEFAULT_WEIGHTS)
    assert comps["accuracy"] == 100.0
    assert comps["timeliness"] == pytest.approx(100 - (48 - 24) * 2)
    expected = sum(comps[k] * w for k, w in DEFAULT_WEIGHTS.items())
    assert report["score"]["score"] == pytest.approx(expected)
    assert "qty" in report["null_spikes"]


def test_metrics_store_roundtrip_and_history(dirty, tmp_path):
    """Second run's null-spike consumes the first run's stored rate."""
    import datetime as dt

    from nyc_taxi_data_ingestion_spark.quality.store import (
        historical_null_rate,
        read_metrics,
        save_report,
    )

    store = str(tmp_path / "dq_metrics")
    spark = dirty.sparkSession
    # store missing → no history
    assert historical_null_rate(spark, store, "dirty", "qty") is None

    cfg = ValidationConfig(
        checks=[NullCheck("qty")],
        null_spike_columns=["qty"],
        metrics_store=store,
        save_metrics=True,
    )
    r1 = validate_table(dirty, cfg, "dirty")
    rate1 = r1["null_spikes"]["qty"]["null_rate"]
    # first run had no history → reference's conservative 5% default
    assert r1["null_spikes"]["qty"]["historical_rate"] == 0.05
    assert rate1 > 0

    hist = historical_null_rate(spark, store, "dirty", "qty")
    assert hist == pytest.approx(rate1)

    r2 = validate_table(dirty, cfg, "dirty")
    # second run consumed the stored historical rate → same rate, no spike
    assert r2["null_spikes"]["qty"]["historical_rate"] == pytest.approx(rate1)
    assert not r2["null_spikes"]["qty"]["is_spike"]

    stored = read_metrics(spark, store, table_name="dirty")
    metrics_present = {r.metric for r in stored.collect()}
    assert {"row_count", "null_rate", "quality_score", "passed"} <= metrics_present
    # two runs appended
    assert read_metrics(spark, store, metric="quality_score").count() == 2


def test_iqr_sketch_vs_exact_registry(spark, sf_dir):
    """The registered `iqr_outliers` (percentile_approx sketch) must
    agree with `iqr_outliers_exact` within the sketch's rank error."""
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    approx = REGISTRY["iqr_outliers"].fn(spark, sf_dir).collect()[0]
    exact = REGISTRY["iqr_outliers_exact"].fn(spark, sf_dir).collect()[0]
    for f in ("q1", "q3", "lower_fence", "upper_fence"):
        assert approx[f] == pytest.approx(exact[f], rel=0.01)
    # outlier counts within 5% of each other (fence shift is tiny)
    assert abs(approx["outlier_cnt"] - exact["outlier_cnt"]) <= max(
        5, 0.05 * exact["outlier_cnt"]
    )


def test_mad_sketch_vs_exact_registry(spark, sf_dir):
    """The registered `mad_outliers` (percentile_approx sketch) must
    agree with `mad_outliers_exact` within the sketch's rank error —
    the same twin contract as IQR."""
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    approx = REGISTRY["mad_outliers"].fn(spark, sf_dir).collect()[0]
    exact = REGISTRY["mad_outliers_exact"].fn(spark, sf_dir).collect()[0]
    for f in ("median", "mad", "lower_fence", "upper_fence"):
        assert approx[f] == pytest.approx(exact[f], rel=0.01)
    assert approx["n_rows"] == exact["n_rows"]
    assert abs(approx["n_outliers"] - exact["n_outliers"]) <= max(
        5, 0.05 * exact["n_outliers"]
    )


def test_distinct_sketch_within_rsd_of_exact(spark, sf_dir):
    """HLL++ twin must land within ~3x the configured 2% rsd of the
    exact distinct counts (same sketch/exact twin contract as IQR)."""
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    exact = REGISTRY["distinct_count"].fn(spark, sf_dir).collect()[0]
    approx = REGISTRY["distinct_count_sketch"].fn(spark, sf_dir).collect()[0]
    for col in ("distinct_parts", "distinct_supps"):
        e, a = exact[col], approx[col]
        assert abs(a - e) / e <= 0.06, (col, e, a)


def test_ks_drift_known_distributions(spark):
    from nyc_taxi_data_ingestion_spark.quality.anomaly import ks_drift

    old = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4, 5]], "v double")
    new = spark.createDataFrame([(float(x),) for x in [3, 4, 5, 6, 7]], "v double")
    r = ks_drift(old, new, "v").collect()[0]
    # ecdfs diverge most at v=2: old 2/5, new 0/5 -> D = 0.4
    assert r.d_stat == 0.4
    assert r.at_value == 2.0
    assert r.n_old == 5 and r.n_new == 5
    # identical samples -> D = 0
    same = ks_drift(old, old, "v").collect()[0]
    assert same.d_stat == 0.0


def test_mad_outliers_robust_to_extremes(spark):
    from nyc_taxi_data_ingestion_spark.quality.anomaly import mad_outliers

    vals = [float(x) for x in range(1, 101)] + [1e9, -1e9]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = mad_outliers(df, "v", k=3.0).collect()[0]
    # median/MAD ignore the two planted extremes entirely
    assert r.median == 50.5
    assert r.mad == 25.5
    assert r.n_outliers == 2  # exactly the planted extremes
    assert r.n_rows == 102


def test_ks_drift_empty_side_yields_null_not_error(spark):
    from nyc_taxi_data_ingestion_spark.quality.anomaly import ks_drift

    old = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    empty = spark.createDataFrame([], "v double")
    r = ks_drift(old, empty, "v").collect()[0]
    assert r.d_stat is None


def test_ks_drift_grouped_matches_single_and_handles_one_sided(spark):
    from nyc_taxi_data_ingestion_spark.quality.anomaly import ks_drift, ks_drift_grouped

    rows_old = [("a", float(x)) for x in [1, 2, 3, 4, 5]] + [("only_old", 9.0)]
    rows_new = [("a", float(x)) for x in [3, 4, 5, 6, 7]]
    old = spark.createDataFrame(rows_old, "g string, v double")
    new = spark.createDataFrame(rows_new, "g string, v double")
    out = {r.g: r for r in ks_drift_grouped(old, new, "v", ["g"]).collect()}
    single = ks_drift(
        old.filter("g='a'"), new.filter("g='a'"), "v"
    ).collect()[0]
    assert out["a"].d_stat == single.d_stat
    assert out["a"].at_value == single.at_value
    # group on one side only: NULL d_stat, zero count on the other side
    assert out["only_old"].d_stat is None
    assert out["only_old"].n_new == 0 and out["only_old"].n_old == 1


def test_psi_drift_matches_numpy_reference(spark, sf_dir):
    """PSI contributions must match an independent numpy computation
    with the same boundaries (the dsir rows-only contract: Spark's ln
    is libm-dependent, so no SQL oracle — numpy is the referee), and
    an identical-distribution comparison must score ~0."""
    import numpy as np

    from nyc_taxi_data_ingestion_spark.quality.anomaly import psi_drift
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("double")
    )
    old = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    new = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
    rows = psi_drift(old, new, "o_totalprice", n_buckets=10).collect()
    assert len(rows) == 10

    # numpy referee with the SAME boundaries Spark used
    bounds = old.agg(
        F.percentile_approx(
            "o_totalprice",
            F.array(*[F.lit(i / 10) for i in range(1, 10)]),
            F.lit(10000),
        ).alias("b")
    ).collect()[0]["b"]
    ov = np.array([r.o_totalprice for r in old.collect()])
    nv = np.array([r.o_totalprice for r in new.collect()])
    b = np.array(bounds)
    # bucket = #bounds <= v, i.e. searchsorted side='right'
    obk = np.searchsorted(b, ov, side="right")
    nbk = np.searchsorted(b, nv, side="right")
    eps = 1e-6
    for r in rows:
        fo = max((obk == r.bucket).sum() / len(ov), eps)
        fn = max((nbk == r.bucket).sum() / len(nv), eps)
        assert r.frac_old == pytest.approx(fo, rel=1e-12)
        assert r.frac_new == pytest.approx(fn, rel=1e-12)
        assert r.psi_contrib == pytest.approx(
            (fn - fo) * np.log(fn / fo), rel=1e-9, abs=1e-12
        )

    # identical distributions → PSI ≈ 0
    same = psi_drift(old, old, "o_totalprice", n_buckets=10).collect()
    assert sum(abs(r.psi_contrib) for r in same) < 1e-9


def test_benford_drift_conforming_and_uniform(spark):
    import math

    from nyc_taxi_data_ingestion_spark.quality.anomaly import (
        BENFORD_P,
        benford_drift,
    )
    from decimal import Decimal

    # Benford-conforming sample: {2^k} first digits follow the law
    vals = [Decimal(2) ** k for k in range(1, 120)]
    df = spark.createDataFrame([(v,) for v in vals], "v decimal(37,0)")
    out = {r.digit: r for r in benford_drift(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert abs(sum(r.obs_frac for r in out.values()) - 1.0) < 1e-12
    chi2 = sum(r.chi2_contrib for r in out.values())
    assert chi2 < 20.1  # conforming: below the chi2_8 0.99 critical value

    # uniform-first-digit data must light up the statistic
    uni = spark.createDataFrame(
        [(Decimal(d) * 100 + i,) for d in range(1, 10) for i in range(22)],
        "v decimal(10,0)",
    )
    chi2_u = sum(r.chi2_contrib for r in benford_drift(uni, "v").collect())
    assert chi2_u > 20.1
    # expected fractions are the module constants
    for d, r in out.items():
        assert r.benford_frac == BENFORD_P[d]

    # absent digits must still emit their row with the full n*p_d
    # chi-square mass (r3 advice: dropping them understates the
    # statistic exactly in the strongest-deviation cases)
    only9 = spark.createDataFrame(
        [(Decimal(900 + i),) for i in range(50)], "v decimal(10,0)"
    )
    rows = {r.digit: r for r in benford_drift(only9, "v").collect()}
    assert set(rows) == set(range(1, 10))
    for d in range(1, 9):
        assert rows[d].n_obs == 0
        assert rows[d].chi2_contrib == pytest.approx(50 * BENFORD_P[d])
    assert rows[9].n_obs == 50


@pytest.mark.slow
def test_mad_outliers_grouped_matches_single_per_group(spark):
    from nyc_taxi_data_ingestion_spark.quality.anomaly import (
        mad_outliers,
        mad_outliers_grouped,
    )

    rows = [("a", float(x)) for x in range(1, 51)] + [("a", 1e6)] + \
           [("b", float(x)) for x in [10, 10, 10, 10, 500]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in mad_outliers_grouped(df, "v", ["g"]).collect()}
    for g in ("a", "b"):
        single = mad_outliers(df.filter(F.col("g") == g), "v").collect()[0]
        assert out[g].median == single.median and out[g].mad == single.mad
        assert out[g].n_outliers == single.n_outliers
    assert out["a"].n_outliers == 1  # the planted 1e6


def test_seasonal_anomalies_flags_only_cell_outliers(spark):
    from datetime import datetime as dt

    from nyc_taxi_data_ingestion_spark.quality.anomaly import (
        seasonal_anomalies,
    )

    # cell (Monday 03:00): tight values + one spike. cell (Monday
    # 15:00): wide spread — the 3 a.m. spike must flag, the same value
    # at 3 p.m. must not.
    rows = []
    eid = 0
    for v in [10.0, 10.5, 9.5, 10.2, 9.8, 60.0]:
        eid += 1
        rows.append((eid, dt(2024, 1, 1, 3), 1, "x", v))
    for v in [10.0, 60.0, 110.0, 5.0, 200.0, 80.0]:
        eid += 1
        rows.append((eid, dt(2024, 1, 1, 15), 1, "x", v))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    flagged = {r["event_id"] for r in seasonal_anomalies(df, k=2.0).collect()}
    assert 6 in flagged  # the 3 a.m. spike
    assert not any(e > 6 for e in flagged)  # wide 3 p.m. cell stays quiet


def test_sequence_gap_stats_counts_runs_and_missing(spark):
    from nyc_taxi_data_ingestion_spark.quality.checks import (
        sequence_gap_stats,
    )

    # runs: [1..3], [7..8], [10] → 2 gaps, missing {4,5,6,9} = 4
    df = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 7, 8, 10, 7]], "seq long"
    )
    row = sequence_gap_stats(df, "seq").first()
    assert (row["min_id"], row["max_id"]) == (1, 10)
    assert row["n_present"] == 6  # distinct
    assert row["n_missing"] == 4
    assert row["n_gaps"] == 2
    # dense sequence → zero gaps
    dense = spark.createDataFrame([(i,) for i in range(5)], "seq long")
    row = sequence_gap_stats(dense, "seq").first()
    assert row["n_missing"] == 0 and row["n_gaps"] == 0


def test_persist_errors_csv_export_roundtrip(spark, tmp_path):
    """persist_errors(csv_dir=...) mirrors the reference's dual sink:
    error samples land in the partitioned parquet table AND a flat CSV
    for spreadsheet triage (error_tracking.py:199-202,295-325). The CSV
    must survive a read-back with the full 14-column schema and the
    JSON row payload intact through quoting."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.quality.errors import (
        ERROR_COLUMNS,
        capture_errors,
        persist_errors,
        read_errors,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "ok, with comma"), (3, None)], "id long, val string"
    )
    errs = capture_errors(
        df,
        F.col("val").isNull(),
        layer="silver",
        table_name="t",
        check_name="val_not_null",
        check_type="null_check",
        column_name="val",
        batch_id="b1",
    )
    pq = str(tmp_path / "errors_pq")
    csv_dir = str(tmp_path / "errors_csv")
    persist_errors(errs, pq, csv_dir=csv_dir)
    back_pq = read_errors(spark, pq)
    assert back_pq.count() == 2
    back_csv = (
        spark.read.option("header", "true").csv(csv_dir)
    )
    assert back_csv.count() == 2
    assert set(back_csv.columns) == set(ERROR_COLUMNS)
    payloads = [r.row_data for r in back_csv.collect()]
    import json as _json

    ids = sorted(_json.loads(p)["id"] for p in payloads)
    assert ids == [1, 3]
    # appending a second batch must not clobber the first
    persist_errors(errs, pq, csv_dir=csv_dir)
    assert spark.read.option("header", "true").csv(csv_dir).count() == 4


def test_quality_score_monotonic_across_layers(spark):
    """The reference's one e2e assertion not previously mirrored:
    silver overall quality score >= bronze on the corrupted fixture,
    with fewer (but >0) silver rows
    (tests/e2e/test_medallion_pipeline.py:99,147,337; defect mix from
    FIXTURES.md §2 — 5% null passenger_count, 2% negative fare, 3% zero
    distance, 2% over-capacity, 1% impossible distance)."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.quality.checks import (
        NullCheck,
        PositiveCheck,
        RangeCheck,
    )
    from nyc_taxi_data_ingestion_spark.quality.orchestrator import (
        ValidationConfig,
        validate_table,
    )

    n = 200
    rows = []
    for i in range(n):
        passenger = None if i % 20 == 0 else (10 if i % 50 == 7 else 2)
        fare = -10.0 if i % 50 == 3 else 12.5
        dist = 0.0 if i % 33 == 5 else (999.99 if i % 100 == 11 else 3.2)
        rows.append((i, passenger, fare, dist))
    bronze = spark.createDataFrame(
        rows,
        "trip_id long, passenger_count int, fare_amount double, "
        "trip_distance double",
    )
    cfg = ValidationConfig(
        checks=[
            NullCheck("passenger_count"),
            PositiveCheck("fare_amount"),
            PositiveCheck("trip_distance"),
            RangeCheck("passenger_count", min_value=1, max_value=6),
            RangeCheck("trip_distance", max_value=100.0),
        ],
    )
    bronze_report = validate_table(bronze, cfg, "bronze_taxi")
    assert not bronze_report["passed"]  # dirty table must flag errors

    # the reference's silver filter chain (test_medallion_pipeline.py:132-137)
    silver = bronze.filter(
        (F.col("fare_amount") > 0)
        & (F.col("trip_distance") > 0)
        & (F.col("trip_distance") <= 100.0)
        & F.col("passenger_count").between(1, 6)
    )
    silver_report = validate_table(silver, cfg, "silver_taxi")

    assert 0 < silver.count() < bronze.count()
    assert silver_report["passed"]
    assert (
        silver_report["score"]["score"] >= bronze_report["score"]["score"]
    ), (silver_report["score"], bronze_report["score"])
