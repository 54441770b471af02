"""Operator-level unit tests for transform.py extensions (the registry
oracle-parity sweep covers them end-to-end; these pin the semantic edge
cases and plan-shape claims that sf0.01 data may not exercise)."""

from __future__ import annotations

import pytest

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


def test_conform_schema_widen_null_and_drop(spark):
    from nyc_taxi_data_ingestion_spark.operators.transform import conform_schema

    df = spark.createDataFrame(
        [(1, "a", 5)], "id int, name string, extra int"
    )
    out = conform_schema(df, "id bigint, name string, added double")
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint", "name:string", "added:double",
    ]
    row = out.first()
    assert row.id == 1 and row.added is None
    assert "extra" not in out.columns


def test_conform_schema_rejects_narrowing_and_strict_extras(spark):
    import pytest as _pytest

    from nyc_taxi_data_ingestion_spark.operators.transform import conform_schema

    df = spark.createDataFrame([(2**40, "x")], "id bigint, name string")
    with _pytest.raises(ValueError, match="not a lossless widening"):
        conform_schema(df, "id int, name string")
    # forced narrowing is explicit
    forced = conform_schema(df, "id int, name string", allow_narrowing=True)
    assert dict(forced.dtypes)["id"] == "int"
    with _pytest.raises(ValueError, match="extra columns"):
        conform_schema(df, "id bigint", strict=True)


def test_union_conformed_drifting_snapshots(spark):
    from nyc_taxi_data_ingestion_spark.operators.transform import union_conformed

    old = spark.createDataFrame([(1, "a")], "id int, name string")
    new = spark.createDataFrame(
        [(2, "b", 3.5)], "id bigint, name string, score double"
    )
    # target defaults to the FIRST frame's schema — new's extra column
    # drops, its bigint id narrows only if forced; use new as target
    out = union_conformed([new, old])
    assert sorted(out.columns) == ["id", "name", "score"]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].score is None and rows[2].score == 3.5


def test_read_parquet_evolving_merges_schemas(spark, tmp_path):
    from nyc_taxi_data_ingestion_spark.sources.readers import read_parquet_evolving

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.0)], "id bigint, name string, score double"
    ).write.mode("append").parquet(p)
    out = read_parquet_evolving(spark, p)
    assert sorted(out.columns) == ["id", "name", "score"]
    assert out.count() == 2
    assert out.filter(F.col("score").isNull()).count() == 1


def test_skew_report_known_distribution(spark):
    from nyc_taxi_data_ingestion_spark.operators.transform import skew_report

    rows = [(i, "hot") for i in range(90)] + [(100 + i, f"k{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, key string")
    r = skew_report(df, ["key"]).first()
    assert r.n_rows == 100 and r.n_keys == 11
    assert r.max_cnt == 90 and r.hot_key == "hot"
    assert abs(r.avg_cnt - 100 / 11) < 1e-12
    assert abs(r.skew_ratio - 90 / (100 / 11)) < 1e-9
    assert r.p50_cnt == 1.0


def test_skew_report_multi_col_and_delimiter_safe(spark):
    from nyc_taxi_data_ingestion_spark.operators.transform import skew_report

    rows = [(1, "a|b", "x")] * 3 + [(2, "c", "y")]
    df = spark.createDataFrame(rows, "id long, k1 string, k2 string")
    r = skew_report(df, ["k1", "k2"]).first()
    assert r.hot_key == "a|b§x"   # pipes in keys must not truncate
    assert r.n_keys == 2 and r.max_cnt == 3


# -- event analytics: funnel + cohort ----------------------------------------


def _events_frame(spark, rows):
    """rows: (event_id, ts_str, user_id, event_type)"""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t, u, e) for (i, t, u, e) in rows],
        "event_id long, ts string, user_id long, event_type string",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_funnel_greedy_order_semantics(spark):
    from nyc_taxi_data_ingestion_spark.operators.analytics import (
        funnel_counts,
        funnel_depth,
    )

    rows = [
        # u1 completes the whole funnel in order
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:01:00", 1, "click"),
        (3, "2024-01-01 00:02:00", 1, "purchase"),
        # u2 purchases BEFORE viewing — depth must stop at view
        (4, "2024-01-01 00:00:00", 2, "purchase"),
        (5, "2024-01-01 00:01:00", 2, "view"),
        # u3 views then clicks, never purchases
        (6, "2024-01-01 00:00:00", 3, "view"),
        (7, "2024-01-01 00:05:00", 3, "click"),
        # u4 only irrelevant events
        (8, "2024-01-01 00:00:00", 4, "error"),
    ]
    ev = _events_frame(spark, rows)
    stages = ["view", "click", "purchase"]
    depth = {
        r["user"]: r["depth"]
        for r in funnel_depth(ev, stages).collect()
    }
    assert depth == {1: 3, 2: 1, 3: 2}
    out = {
        r["stage"]: r["users"] for r in funnel_counts(ev, stages).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_breaks_by_event_id(spark):
    from nyc_taxi_data_ingestion_spark.operators.analytics import funnel_depth

    # click shares the view's timestamp but has a LARGER event_id →
    # ordered after it → funnel advances
    ev = _events_frame(
        spark,
        [
            (10, "2024-01-01 00:00:00", 7, "view"),
            (11, "2024-01-01 00:00:00", 7, "click"),
        ],
    )
    d = funnel_depth(ev, ["view", "click"]).collect()
    assert d[0]["depth"] == 2
    # reversed ids → click orders BEFORE the view → depth stays 1
    ev2 = _events_frame(
        spark,
        [
            (11, "2024-01-01 00:00:00", 7, "view"),
            (10, "2024-01-01 00:00:00", 7, "click"),
        ],
    )
    d2 = funnel_depth(ev2, ["view", "click"]).collect()
    assert d2[0]["depth"] == 1


def test_cohort_retention_matrix(spark):
    from nyc_taxi_data_ingestion_spark.operators.analytics import cohort_retention

    rows = [
        # u1 first active Jan 1, returns Jan 9 (offset 1) and Jan 16 (offset 2)
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-09 10:00:00", 1, "view"),
        (3, "2024-01-16 10:00:00", 1, "view"),
        # u2 same cohort day, active only week 0 (twice on one day → 1 distinct)
        (4, "2024-01-01 11:00:00", 2, "view"),
        (5, "2024-01-01 12:00:00", 2, "view"),
        # u3 cohort Jan 2
        (6, "2024-01-02 09:00:00", 3, "view"),
    ]
    ev = _events_frame(spark, rows)
    out = {
        (str(r["cohort_date"]), r["period_offset"]): r["active_users"]
        for r in cohort_retention(ev, period_days=7).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_trend_slopes_recovers_known_slope(spark):
    from nyc_taxi_data_ingestion_spark.operators.analytics import trend_slopes

    # y = 2·x_hours + 5 exactly, for hours 0..9 → slope 2.0
    rows = [
        (i, f"2024-01-01 {i:02d}:00:00", 1, "m", 5.0 + 2.0 * i)
        for i in range(10)
    ]
    ev = _events_frame_with_value(spark, rows)
    out = trend_slopes(ev, group_cols=["event_type"]).collect()
    assert len(out) == 1
    assert out[0]["n_obs"] == 10
    assert abs(out[0]["slope_per_hour"] - 2.0) < 1e-12


def test_trend_slopes_degenerate_single_hour_is_null(spark):
    from nyc_taxi_data_ingestion_spark.operators.analytics import trend_slopes

    # all events inside one hour → zero x-variance → NULL slope
    rows = [(i, "2024-01-01 00:10:00", 1, "m", float(i)) for i in range(5)]
    ev = _events_frame_with_value(spark, rows)
    out = trend_slopes(ev, group_cols=["event_type"]).collect()
    assert out[0]["slope_per_hour"] is None


def _events_frame_with_value(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


# -- rolling distinct: exact vs HLL sketch twin ------------------------------


def test_rolling_distinct_hll_tracks_exact(spark, sf_dir):
    from nyc_taxi_data_ingestion_spark.operators.analytics import (
        rolling_distinct,
        rolling_distinct_hll,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["day"]: r["n_active"]
        for r in rolling_distinct(ev, "ts", "user_id", 7).collect()
    }
    approx = {
        r["day"]: r["approx_active"]
        for r in rolling_distinct_hll(ev, "ts", "user_id", 7).collect()
    }
    assert set(exact) == set(approx)  # same observed-day spine
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2.0, 0.05 * n)


def test_bm25_rank_orders_by_tf_and_rarity(spark):
    from nyc_taxi_data_ingestion_spark.llm.text import bm25_rank

    df = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad"),
            (2, "spark pad pad pad pad"),
            (3, "pad pad pad pad pad"),
            (4, "vector pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    out = bm25_rank(df, ["spark", "vector"], top_k=3).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r["term"], []).append((r["rank"], r["doc_id"]))
    # higher tf wins within a term; absent docs never appear
    assert sorted(by_term["spark"]) == [(1, 1), (2, 2)]
    assert sorted(by_term["vector"]) == [(1, 4)]
    # rarer term (df=1 vs df=2) gets the larger idf: compare the two
    # tf=1, equal-dl docs across terms
    scores = {(r["term"], r["doc_id"]): r["score"] for r in out}
    assert scores[("vector", 4)] > scores[("spark", 2)]


def test_event_transitions_counts_and_shares(spark):
    from datetime import datetime as dt

    from nyc_taxi_data_ingestion_spark.operators.analytics import (
        event_transitions,
    )

    rows = [
        # user 1: a -> b -> a   user 2: a -> b
        (1, dt(2024, 1, 1, 0), 1, "a", 0.0),
        (2, dt(2024, 1, 1, 1), 1, "b", 0.0),
        (3, dt(2024, 1, 1, 2), 1, "a", 0.0),
        (4, dt(2024, 1, 1, 0), 2, "a", 0.0),
        (5, dt(2024, 1, 1, 1), 2, "b", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["share"])
        for r in event_transitions(df).collect()
    }
    assert out[("a", "b")] == (2, 1.0)  # both a-followers go to b
    assert out[("b", "a")] == (1, 1.0)  # b's only outgoing transition
    # equal timestamps fall back to event_id order: no cross-user pairs
    assert ("b", "b") not in out and len(out) == 2


def test_partial_agg_state_merge_equals_full(spark, sf_dir):
    from pyspark.sql import types as T

    from nyc_taxi_data_ingestion_spark.operators.incremental import (
        finalize_agg_state,
        merge_agg_states,
        partial_agg_state,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = ["o_orderdate"]
    # three-way split merged in two different groupings — associativity
    parts = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    states = [partial_agg_state(p, keys, "o_totalprice") for p in parts]
    ab_c = merge_agg_states(
        [merge_agg_states(states[:2], keys), states[2]], keys
    )
    full = partial_agg_state(orders, keys, "o_totalprice")
    a = finalize_agg_state(ab_c, keys, "p").toPandas().sort_values(keys[0])
    b = finalize_agg_state(full, keys, "p").toPandas().sort_values(keys[0])
    assert (a.reset_index(drop=True) == b.reset_index(drop=True)).all().all()
    # the state keeps its sum in exact decimal — the merge-order
    # insensitivity contract
    assert isinstance(ab_c.schema["s"].dataType, T.DecimalType)


def test_min_hop_closure_semantics(spark):
    """BFS closure on a known graph: chain a→b→c→d, a 2-cycle x↔y,
    and an isolated self-loop z→z — min hops are shortest-path depths,
    cycles produce self-pairs, unreachable pairs are absent."""
    from nyc_taxi_data_ingestion_spark.operators.analytics import (
        min_hop_closure,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x"),
         ("z", "z"), ("a", "b")],  # duplicate edge must not matter
        "src string, dst string",
    )
    got = {
        (r.src, r.dst): r.min_hops for r in min_hop_closure(edges).collect()
    }
    assert got == {
        ("a", "b"): 1, ("a", "c"): 2, ("a", "d"): 3,
        ("b", "c"): 1, ("b", "d"): 2,
        ("c", "d"): 1,
        ("x", "y"): 1, ("y", "x"): 1, ("x", "x"): 2, ("y", "y"): 2,
        ("z", "z"): 1,
    }


def test_min_hop_closure_max_hops_truncates(spark):
    from nyc_taxi_data_ingestion_spark.operators.analytics import (
        min_hop_closure,
    )

    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {
        (r.src, r.dst): r.min_hops
        for r in min_hop_closure(chain, max_hops=2).collect()
    }
    assert ("a", "d") not in got and got[("a", "c")] == 2


def test_skyline_2d_known_frontier(spark):
    """Dominance semantics on a hand-built set: strict dominance in
    either measure removes a row; exact (max,min) ties dedupe to the
    smallest key; incomparable rows all survive; NULL measures drop."""
    from nyc_taxi_data_ingestion_spark.operators.analytics import skyline_2d

    rows = [
        # key, maxm (revenue-like), minm (cost-like)
        (1, 100.0, 5.0),   # frontier
        (2, 100.0, 5.0),   # exact tie of 1 -> deduped (key 1 wins)
        (3, 100.0, 4.0),   # dominates 1/2 at equal max -> 1,2 out? no:
                           # 3 has lower min at same max => 1,2 dominated
        (4, 90.0, 3.0),    # frontier (lower max, lower min)
        (5, 90.0, 3.5),    # dominated by 4 (same max, higher min)
        (6, 80.0, 3.0),    # dominated by 4 (lower max, same min)
        (7, 120.0, 9.0),   # frontier (highest max)
        (8, 70.0, 1.0),    # frontier (lowest min)
        (9, None, 1.0),    # null measure -> dropped
        (10, 60.0, None),  # null measure -> dropped
    ]
    df = spark.createDataFrame(rows, "k long, maxm double, minm double")
    got = sorted(
        r.k for r in skyline_2d(df, "maxm", "minm", "k", n_buckets=4).collect()
    )
    assert got == [3, 4, 7, 8], got
    # single row survives; empty input returns empty
    one = spark.createDataFrame([(1, 1.0, 1.0)], "k long, maxm double, minm double")
    assert [r.k for r in skyline_2d(one, "maxm", "minm", "k").collect()] == [1]
    empty = one.filter("k < 0")
    assert skyline_2d(empty, "maxm", "minm", "k").count() == 0


@pytest.mark.slow
def test_pagerank_matches_reference_power_iteration(spark):
    """pagerank == a pure-python power iteration with the same damping
    and dangling-mass redistribution, on a graph with a cycle, a hub,
    and a dangling node; ranks sum to ~1."""
    from nyc_taxi_data_ingestion_spark.operators.analytics import pagerank

    edges = [
        (1, 2), (2, 3), (3, 1),   # cycle
        (1, 4), (2, 4), (3, 4),   # 4 is a hub...
        # ...and dangling (no out-edges)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank(df, max_iter=50, tol=1e-12).collect()
    }

    nodes = [1, 2, 3, 4]
    out = {1: [2, 4], 2: [3, 4], 3: [1, 4], 4: []}
    d, n = 0.85, len(nodes)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(50):
        dangling = sum(ranks[v] for v in nodes if not out[v])
        new = {}
        for v in nodes:
            inflow = sum(
                ranks[u] / len(out[u]) for u in nodes if v in out[u]
            )
            new[v] = (1 - d) / n + d * (inflow + dangling / n)
        if sum(abs(new[v] - ranks[v]) for v in nodes) < 1e-12:
            ranks = new
            break
        ranks = new

    assert abs(sum(got.values()) - 1.0) < 1e-6
    for v in nodes:
        assert abs(got[v] - ranks[v]) < 1e-9, (v, got[v], ranks[v])
    # the hub everything points at outranks the cycle members
    assert got[4] > max(got[1], got[2], got[3])


def test_triangle_counts_degree_orientation_matches_id(spark):
    """Degree-oriented and id-oriented enumeration count the SAME
    triangles (orientation invariance) on a hub-skewed graph: one hub
    vertex 0 connected to everything (the power-law worst case the
    degree orientation exists for) plus a chain of hub-incident
    triangles and one hub-free triangle. Also pins exact per-vertex
    counts against a brute-force python enumeration."""
    from itertools import combinations
    from nyc_taxi_data_ingestion_spark.operators.analytics import (
        triangle_counts,
    )

    # hub 0 -- 1..8; ring edges (i, i+1) close triangles through the
    # hub; (6,7,8) is a hub-free triangle; plus a pendant (9) with no
    # triangle; duplicate + reversed edges exercise canonicalization
    edges = (
        [(0, i) for i in range(1, 9)]
        + [(1, 2), (2, 3), (3, 4), (4, 5)]
        + [(6, 7), (7, 8), (8, 6)]
        + [(8, 9), (2, 1), (0, 3)]
    )
    df = spark.createDataFrame(edges, "a long, b long")

    undirected = {tuple(sorted(e)) for e in edges}
    adj = {}
    for x, y in undirected:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    expect = {}
    for tri in combinations(sorted(adj), 3):
        p, q, r = tri
        if q in adj[p] and r in adj[p] and r in adj[q]:
            for v in tri:
                expect[v] = expect.get(v, 0) + 1

    by_degree = {
        r.node: r.tri_cnt
        for r in triangle_counts(df, orient="degree").collect()
    }
    by_id = {
        r.node: r.tri_cnt
        for r in triangle_counts(df, orient="id").collect()
    }
    assert by_degree == expect, (by_degree, expect)
    assert by_id == expect, (by_id, expect)
    # hub participates in every hub-incident triangle: 4 through the
    # ring edges (1,2)(2,3)(3,4)(4,5) + 3 through the (6,7,8) clique
    assert by_degree[0] == 7
