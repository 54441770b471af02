"""Physical-plan quality gates.

Correctness tests prove the small-SF answer; these prove the plan
would survive the 100 TB scale-up: filters reach the parquet scan,
projections prune the read schema, small dims broadcast instead of
shuffling the fact side, and aggregates keep their map-side partial
stage. A regression here is a silent 10-100x cost at scale even when
every value still matches.
"""

from __future__ import annotations

import pytest

from nyc_taxi_data_ingestion_spark.queries import REGISTRY


def plan_of(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_filters_push_to_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, "between_filter", sf_dir)
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan
    assert "LessThanOrEqual(l_quantity,20.0)" in plan
    # set-membership on l_returnflag is pushed too
    assert "In(l_returnflag" in plan


def test_projection_prunes_read_schema(spark, sf_dir):
    plan = plan_of(spark, "between_filter", sf_dir)
    # lineitem has 12 columns; the query needs 6 — the scan must not
    # read the rest
    scan_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "l_partkey" not in scan_schema
    assert "l_discount" not in scan_schema
    assert "l_tax" not in scan_schema


@pytest.mark.parametrize("name", ["top_groups", "left_join_dims", "od_matrix"])
def test_dim_joins_broadcast_not_shuffle(spark, sf_dir, name):
    plan = plan_of(spark, name, sf_dir)
    assert "BroadcastHashJoin" in plan
    # the fact side must never be shuffled for a dim join
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_aggregate_keeps_partial_stage(spark, sf_dir):
    # map-side combine: HashAggregate below AND above the exchange
    plan = plan_of(spark, "daily_stats", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_whole_stage_codegen_covers_transform_chain(spark, sf_dir):
    # the Silver chain (rename/cast/derive/filter) must stay inside
    # codegen — a Python UDF or RDD hop would break the span
    # AQE's AdaptiveSparkPlan wrapper hides codegen subtrees until
    # runtime; disable it for the static-plan introspection only
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["silver_transform"].fn(spark, sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "codegen"
        )
        plan = df._jdf.queryExecution().explainString(mode)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert "Found" in plan and "WholeStageCodegen subtrees" in plan
    assert "Found 0 WholeStageCodegen" not in plan
    formatted = plan_of(spark, "silver_transform", sf_dir)
    assert "BatchEvalPython" not in formatted
    assert "ArrowEvalPython" not in formatted


def test_no_python_eval_in_relational_queries(spark, sf_dir):
    # every non-LLM registry query must stay JVM-side end-to-end
    relational = [
        "daily_stats", "hourly_analysis", "revenue_by_group",
        "ratio_of_sums", "anti_join", "group_having", "topk_per_group",
        "expectations_suite", "reconcile_agg", "zscore_outliers",
    ]
    for name in relational:
        plan = plan_of(spark, name, sf_dir)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


@pytest.mark.slow
def test_pipeline_curation_scan_count(spark, sf_dir):
    # the curation stages compose into one lazy plan over the STAGED
    # frame, which is materialized exactly once (r13): the Gopher
    # filter + PII redaction fuse into the single documents scan
    # inside the checkpoint, and every later stage (line dedup's two
    # inherent references included) reads the staged RDD — the final
    # plan must therefore contain NO parquet re-read of `documents`,
    # and no stage may fall back to Python row evaluation.
    plan = plan_of(spark, "pipeline_curation", sf_dir)
    assert plan.count("documents.parquet") == 0, plan.count("documents.parquet")
    assert "Scan ExistingRDD" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_simhash_packed_aggregate_count(spark, sf_dir):
    # the striped-lane rewrite must keep the aggregate narrow: 16
    # packed counters + 1 count, not 64 CASE sums (a regression here
    # quadruples the agg arithmetic on every token at 100 TB).
    # Inspect simhash_signatures directly — the registry query
    # checkpoints the signature table (self-join reuse), which hides
    # the aggregate behind an opaque RDD scan.
    import re

    from nyc_taxi_data_ingestion_spark.llm.dedup import simhash_signatures
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table

    df = simhash_signatures(read_table(spark, sf_dir, "documents"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)

    agg_lines = [l for l in plan.splitlines() if "Functions [" in l]
    assert agg_lines, "no aggregate in simhash plan"
    n_funcs = max(len(re.findall(r"partial_sum|sum\(", l)) for l in agg_lines)
    assert n_funcs <= 20, f"simhash aggregate widened to {n_funcs} functions"


def test_bucketed_join_elides_exchange(spark, sf_dir):
    # the co-located fact-fact join pattern: bucket lineitem and orders
    # on the join key at write time; the join plan must then contain NO
    # Exchange on either side — at 100 TB this is the difference
    # between a one-time write cost and a full shuffle every run
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table
    from nyc_taxi_data_ingestion_spark.sources.sinks import create_bucketed_table

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    create_bucketed_table(
        spark, li, "bkt_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    create_bucketed_table(
        spark, orders, "bkt_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    try:
        a = spark.table("bkt_lineitem")
        b = spark.table("bkt_orders")
        joined = a.join(b, a["l_orderkey"] == b["o_orderkey"])
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = joined._jdf.queryExecution().explainString(mode)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sorted buckets: no extra Sort needed beyond the join's own
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_salted_topk_two_phase_plan(spark, sf_dir):
    # the skew path must actually plan TWO window stages — the local
    # (group, salt) pruning pass and the final per-group pass — and
    # match the unsalted output exactly
    plan = plan_of(spark, "topk_per_group_salted", sf_dir)
    assert plan.count("Window") >= 2, plan
    a = REGISTRY["topk_per_group"].fn(spark, sf_dir).collect()
    b = REGISTRY["topk_per_group_salted"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_interval_join_is_hash_join_not_nested_loop(spark, sf_dir):
    # the bucketed-bin rewrite must give Catalyst an equi-join: a raw
    # BETWEEN predicate would plan BroadcastNestedLoop/Cartesian —
    # O(n*m) row comparisons at scale
    plan = plan_of(spark, "interval_join", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_cube_rollup_single_expand_pass(spark, sf_dir):
    # CUBE/ROLLUP must plan as ONE Expand + aggregate, never a union of
    # per-grouping-set scans (k scans of the fact table at scale)
    for name, table in [("cube_agg", "lineitem"), ("rollup_agg", "orders")]:
        plan = plan_of(spark, name, sf_dir)
        assert "Expand" in plan, name
        assert plan.count(f"{table}.parquet") == 1, name


def test_window_dedup_span_removal_hot_key_shape(spark, sf_dir):
    # docs/SCALE.md's skew claim for the substring-dedup family, now a
    # gate (r3 verdict stretch item): corpus-wide window-hash totals
    # must come from a partial-aggregate pair (map-side combine — a hot
    # boilerplate hash collapses to one row per task before the
    # shuffle), NEVER a window over __wh (which would move every
    # occurrence of a hot hash into ONE partition); and the plan must
    # stay under AdaptiveSparkPlan so AQE can skew-split the join.
    import re

    for name in ("window_dedup", "span_removal"):
        plan = plan_of(spark, name, sf_dir)
        assert not re.search(r"\(\d+\) Window", plan), name
        assert "partial_count" in plan, name
        assert "hashpartitioning(__wh" in plan, name
        assert "AdaptiveSparkPlan" in plan, name


def test_exact_twins_use_rank_selection_not_percentile_buffer(spark, sf_dir):
    # exactness must not cost a single task: the exact-quantile twins
    # compute via distributed rank-selection (exact_quantiles), so no
    # plan may contain the single-buffer `percentile` aggregate
    import re

    for name in ("quantiles", "iqr_outliers_exact", "mad_outliers_exact"):
        plan = plan_of(spark, name, sf_dir)
        bare = re.sub(r"percentile_approx", "", plan)
        assert not re.search(r"\bpercentile\(", bare), name


def test_mad_default_uses_sketch_not_exact_percentile(spark, sf_dir):
    # the registered mad_outliers must aggregate with the mergeable GK
    # sketch (percentile_approx): exact `percentile` buffers EVERY value
    # in one aggregation buffer — the scale-killer the r3 verdict
    # flagged. The exact form survives only as the oracle twin.
    import re

    plan = plan_of(spark, "mad_outliers", sf_dir)
    assert "percentile_approx" in plan, plan
    bare = re.sub(r"percentile_approx", "", plan)
    assert not re.search(r"\bpercentile\(", bare), plan


def test_window_deltas_no_global_sort(spark, sf_dir):
    # the lag/lead window partitions by year — a global-order window
    # would plan Exchange SinglePartition (one task holds everything)
    plan = plan_of(spark, "window_deltas", sf_dir)
    assert "SinglePartition" not in plan, plan


def test_stream_join_condition_bounds_state(spark, sf_dir):
    # the stream-stream join's analyzed condition must bound right.ts
    # in BOTH directions relative to left.ts — that bound is what lets
    # the state store evict buffered rows; an unbounded condition
    # buffers the stream forever
    from nyc_taxi_data_ingestion_spark.streaming import (
        read_parquet_stream,
        stream_stream_join,
    )
    from nyc_taxi_data_ingestion_spark.queries import _staged_events
    from pyspark.sql import functions as F

    path = _staged_events(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    l = read_parquet_stream(spark, path, schema).filter(
        F.col("event_type") == "click"
    )
    r = read_parquet_stream(spark, path, schema).filter(
        F.col("event_type") == "purchase"
    )
    j = stream_stream_join(
        l, r, key="user_id", left_ts="ts", right_ts="ts",
        max_gap="30 MINUTE", watermark_delay="1 minute",
    )
    analyzed = j._jdf.queryExecution().analyzed().toString()
    assert "watermark" in analyzed.lower()
    assert ">=" in analyzed and "<" in analyzed


def test_snapshot_diff_single_join(spark, sf_dir):
    # row-level diff = ONE full-outer co-shuffle join, and the orders
    # scan appears exactly twice (old + new snapshot derivations)
    import re

    plan = plan_of(spark, "snapshot_diff", sf_dir)
    # exactly one join node: formatted explain assigns each node one id
    join_nodes = set(re.findall(r"\((\d+)\)\s+(\w*Join\w*)", plan))
    assert len(join_nodes) == 1, join_nodes
    assert "FullOuter" in plan
    assert "NestedLoop" not in plan
    assert plan.count("orders.parquet") == 2


def test_quality_classifier_single_shuffle_partial_agg(spark, sf_dir):
    # feature hashing must aggregate with a map-side partial stage and
    # shuffle only (doc_id, partial sums) — one Exchange total; tokens
    # never cross the wire. And the whole path stays JVM-side.
    plan = plan_of(spark, "quality_classifier", sf_dir)
    import re

    # formatted explain lists each node in the tree AND a detail block —
    # count detail headers, one per physical node
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, n_exchanges
    assert "partial_sum" in plan or "partial" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_domain_mixture_broadcasts_scalars(spark, sf_dir):
    # the corpus total and the normalizer are single-row frames — they
    # must broadcast to the per-domain rows, never shuffle them
    plan = plan_of(spark, "domain_mixture", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # per-domain token count keeps its map-side partial stage
    assert "partial_sum" in plan


def test_incremental_dedup_never_shuffles_corpus_text(spark, sf_dir):
    # the probe joins banded signature keys; document text appears in
    # narrow map stages only. No Exchange's partitioning key may be the
    # text column, and the final survivor join is id-keyed.
    plan = plan_of(spark, "incremental_dedup", sf_dir)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line.split("hashpartitioning", 1)[1].split(")")[0], line
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_plan_summary_api(spark, sf_dir):
    # the public introspection API must agree with the raw explain
    # parsing these gates use
    from nyc_taxi_data_ingestion_spark.plans import plan_summary

    # AQE's AdaptiveSparkPlan wrapper hides codegen-id tags in the
    # static plan — disable it for introspection only
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["quality_classifier"].fn(spark, sf_dir)
        s = plan_summary(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert s["n_exchanges"] == 1
    assert s["partial_aggregate"] is True
    assert s["python_eval"] is False
    assert s["n_scans"] >= 1 and s["read_schemas"]
    assert s["codegen_ids"], "no whole-stage codegen spans"

    hh = REGISTRY["heavy_hitters"].fn(spark, sf_dir)
    s2 = plan_summary(hh)
    # the MG sketch is a deliberate Arrow stage, NOT a per-expression
    # Python eval — the API tells them apart
    assert s2["python_eval"] is False
    assert s2["n_arrow_stages"] == 1


def test_funnel_single_user_shuffle(spark, sf_dir):
    # the funnel must be ONE user-key shuffle: the greedy walk runs as
    # Catalyst expressions over the collected array (ObjectHashAggregate
    # for collect_list), never as per-stage joins or windows
    plan = plan_of(spark, "funnel_counts", sf_dir)
    assert "Join" not in plan
    assert "Window" not in plan
    # event filter is pushed into the parquet scan
    assert "In(event_type" in plan


def test_keyword_extract_broadcasts_vocabulary(spark, sf_dir):
    # the df table (vocabulary-sized) broadcasts back onto the
    # (doc, token) counts — the corpus side must not sort-merge
    plan = plan_of(spark, "keyword_extract", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_score_buckets_histogram_not_global_sort(spark, sf_dir):
    # tier thresholds come from the bounded histogram: the corpus is
    # never globally sorted or range-partitioned, and the thresholds
    # broadcast back
    plan = plan_of(spark, "score_buckets", sf_dir)
    assert "rangepartitioning" not in plan.lower().replace(" ", "")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_trend_slopes_partial_agg_no_python(spark, sf_dir):
    # decimal moments combine map-side; nothing drops to Python
    plan = plan_of(spark, "trend_slopes", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_window_dedup_shuffles_hashes_not_text(spark, sf_dir):
    # every exchange after the scan must carry the 8-byte window hash
    # (and doc_id), never the window strings or the document text — at
    # 100 TB the difference is the whole job
    plan = plan_of(spark, "window_dedup", sf_dir)
    import re

    # formatted mode puts exchange keys on "Arguments: hashpartitioning(...)"
    parts = re.findall(r"hashpartitioning\(([^)]*)", plan)
    assert parts, "expected at least one hash exchange"
    for p_ in parts:
        assert "text" not in p_, p_
    # partial aggregation survives on both groupBys
    assert plan.count("HashAggregate") >= 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_diversity_partial_agg_no_python(spark, sf_dir):
    plan = plan_of(spark, "token_diversity", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the rollup keys are a prefix of the first aggregation's keys —
    # no third shuffle materializes beyond the two aggregations
    import re

    assert 1 <= len(re.findall(r"hashpartitioning\(", plan)) <= 2


def test_containment_pairs_shuffles_scalars_not_arrays(spark, sf_dir):
    # candidate generation must move (block, token) scalars; full
    # shingle arrays are only fetched for verified-candidate ids.
    # checkpoint=False: the registry form returns a materialized
    # checkpoint whose plan is an opaque RDD scan
    import re

    from nyc_taxi_data_ingestion_spark.llm.dedup import containment_pairs
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table

    df = containment_pairs(
        read_table(spark, sf_dir, "documents"),
        block_cols=["lang", "source"],
        threshold=0.9,
        k=2,
        checkpoint=False,
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    parts = re.findall(r"hashpartitioning\(([^)]*)", plan)
    assert parts, "expected at least one hash exchange"
    for p_ in parts:
        assert "text#" not in p_, p_
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sql_model_mart_same_plan_quality_as_native(spark, sf_dir):
    # SQL-string models must hit the same Catalyst quality bar as the
    # DataFrame API: pushed filter, partial aggregation, no Python
    plan = plan_of(spark, "sql_model_mart", sf_dir)
    assert "HashAggregate" in plan and "Exchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the silver model's value-filter reaches the parquet scan
    assert "PushedFilters" in plan and "IsNotNull(value)" in plan


def test_ks_drift_no_python_single_value_sort(spark, sf_dir):
    plan = plan_of(spark, "ks_drift", sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial aggregation on both per-side counts
    assert plan.count("HashAggregate") >= 2


def test_group_sample_single_window_exchange(spark, sf_dir):
    plan = plan_of(spark, "group_sample", sf_dir)
    import re

    # one group-keyed exchange for the window; no extra shuffles
    assert len(re.findall(r"hashpartitioning\(", plan)) == 1
    assert "WindowGroupLimit" in plan or "Window" in plan


def test_span_removal_no_python_partial_aggs(spark, sf_dir):
    plan = plan_of(spark, "span_removal", sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # both the (doc,window) agg and the corpus totals keep partial stages
    assert plan.count("HashAggregate") >= 4


def test_mad_outliers_broadcasts_fences_no_python(spark, sf_dir):
    plan = plan_of(spark, "mad_outliers", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_ratio_table_broadcasts(spark, sf_dir):
    # the bucket-ratio model must broadcast onto the corpus features;
    # the corpus side never sort-merges
    plan = plan_of(spark, "dsir_weights", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_profile_columns_single_scan(spark, sf_dir):
    # the profiler's contract: 4 columns profiled (nulls, exact
    # distinct, min, max each) in ONE aggregate over ONE parquet scan —
    # not a scan per column
    plan = plan_of(spark, "profile_columns", sf_dir)
    # formatted explain names each scan node twice (tree + detail
    # section) — count numbered detail headers, one per physical scan
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_rolling_active_no_event_log_self_join(spark, sf_dir):
    # presence table first: the ×7 day-cover explode must sit ABOVE a
    # (day, user) aggregate, and the plan must not range-join the raw
    # event log against itself (no BroadcastNestedLoopJoin / no
    # non-equi join condition)
    plan = plan_of(spark, "rolling_active_users", sf_dir)
    assert "NestedLoopJoin" not in plan
    assert plan.count("explode(sequence") == 1


def test_bm25_vocabulary_filter_precedes_shuffle(spark, sf_dir):
    # tokens are filtered to the 3-term query vocabulary before the
    # (doc, term) aggregate: the explode feeds a filter, and no text
    # column crosses an exchange
    plan = plan_of(spark, "bm25_rank", sf_dir)
    assert "array_contains" in plan
    for line in plan.splitlines():
        if "Arguments: hashpartitioning" in line:
            assert "text" not in line


def test_tpch_q3_q5_broadcast_dims_and_pushdown(spark, sf_dir):
    # Q3: the BUILDING-segment customer filter reaches the scan and the
    # filtered dim broadcasts; date predicates push into both fact scans
    p3 = plan_of(spark, "tpch_q3_sql", sf_dir)
    assert "BroadcastHashJoin" in p3
    assert "In(c_mktsegment" in p3 or "EqualTo(c_mktsegment,BUILDING)" in p3
    assert "LessThan(o_orderdate" in p3
    assert "GreaterThan(l_shipdate" in p3
    # Q5: the snowflake's small dims broadcast; the orders date range
    # is pushed down
    p5 = plan_of(spark, "tpch_q5_sql", sf_dir)
    assert p5.count("BroadcastHashJoin") >= 3
    assert "GreaterThanOrEqual(o_orderdate" in p5


def test_seasonal_anomaly_profile_broadcasts(spark, sf_dir):
    # the 168-cell profile must broadcast back onto the stream — a
    # shuffle join here would re-shuffle the whole event log on the
    # cell key
    plan = plan_of(spark, "seasonal_anomaly", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_event_transitions_single_user_shuffle(spark, sf_dir):
    # one user-key exchange for the lead window; the share
    # normalization must run over the types^2 count table, never
    # re-shuffle events
    plan = plan_of(spark, "event_transitions", sf_dir)
    user_exchanges = [
        l for l in plan.splitlines()
        if "Arguments: hashpartitioning" in l and "u#" in l
    ]
    assert len(user_exchanges) == 1, user_exchanges


def test_incremental_agg_state_partial_aggregates(spark, sf_dir):
    # every partial_agg_state and the merge re-aggregate must map-side
    # combine (HashAggregate below and above each exchange), and no
    # Python anywhere
    plan = plan_of(spark, "incremental_agg_state", sf_dir)
    assert plan.count("HashAggregate") >= 4
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_media_dedup_digest_only_grouping_shuffle(spark, sf_dir):
    # the grouping exchange must carry the 16-byte digest, never the
    # payload column
    plan = plan_of(spark, "media_dedup", sf_dir)
    for line in plan.splitlines():
        if "Arguments: hashpartitioning" in line and "__fp" in line:
            assert "payload" not in line
            break
    else:
        raise AssertionError("no digest-keyed exchange found")


@pytest.mark.slow
def test_registry_audits_clean_of_errors(spark, sf_dir):
    """Sweep: every registry query's plan passes its own reviewer
    (plans/audit) at error level, modulo an EXPLICIT whitelist of
    documented single-task windows:
    - ks_drift / score_buckets: the only ordered window runs over a
      ≤n_buckets subtotal/histogram table — bounded rows, which a
      static plan audit cannot know;
    - ks_drift_grouped: same — after the r9 bucketed-two-pass rewrite
      the only group-partitioned ordered window is the prefix-offset
      pass over the ≤ groups×n_buckets subtotal table (the cumulative
      itself windows on the high-cardinality (group, bucket) key);
    - moving_avg_band: a global time-series rolling band is inherently
      one ordered sequence (docstring-documented, mirrors the
      reference's pandas implementation);
    - prototype_prune_exact: O(N²)-class exact-verification twin kept
      only as an oracle cross-check of the registered scale path.
    Anything NEW that trips the audit must either be fixed (see
    media_shard_pack's constant-folded window, caught by this sweep)
    or argued onto this list."""
    from nyc_taxi_data_ingestion_spark.plans.audit import audit_plan

    allowed = {
        "ks_drift", "ks_drift_grouped", "score_buckets",
        "moving_avg_band", "prototype_prune_exact",
    }
    bad = {}
    for name, q in sorted(REGISTRY.items()):
        if name in allowed:
            continue
        errs = [
            f.code
            for f in audit_plan(q.fn(spark, sf_dir))
            if f.severity == "error"
        ]
        if errs:
            bad[name] = errs
    assert bad == {}, bad


def test_tpch_q6_all_predicates_pushed_no_join_shuffle(spark, sf_dir):
    plan = plan_of(spark, "tpch_q6_sql", sf_dir)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "LessThan(l_quantity" in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial


def test_promo_revenue_part_dim_broadcasts(spark, sf_dir):
    plan = plan_of(spark, "promo_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
