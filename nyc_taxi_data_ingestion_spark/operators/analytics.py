"""Event-analytics operators: ordered funnels and cohort retention.

The reference's event surface stops at sessionization-style grouping;
these are the two remaining classic event-table analyses a warehouse
user expects (funnel conversion, cohort retention), built shuffle-lean:

- ``funnel_stages``: ONE shuffle on the user key. Per-user event
  sequences are sorted arrays walked by a Catalyst ``aggregate``
  (higher-order function) — greedy sequential stage matching with no
  Python, no window, no per-stage join. An alternative k-1-join
  formulation exists for pathological per-user volumes; the array walk
  is right whenever per-user funnel-relevant events are bounded (the
  normal case — irrelevant event types are filtered before the
  shuffle).
- ``cohort_retention``: two partial-aggregations sharing one user-key
  shuffle layout + a user-key join. Output is the cohort/offset
  matrix, exact distinct counts.

Semantics doc for cross-engine parity: stage matching is greedy over
the total event order ``(ts, event_id)`` — stage i+1 must occur
STRICTLY AFTER the event that satisfied stage i in that order (equal
timestamps are broken by event_id). The SQL-oracle twin expresses the
same thing with ``row_number`` ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-user greedy funnel depth: how many of ``stages`` the user
    completed in order. Returns (user, depth) with depth in [1, k]
    for users having at least one stage-relevant event.

    One shuffle (user key); the sort + walk happen inside the hash
    aggregate's output expressions, never in Python.
    """
    k = len(stages)
    stage_arr = F.array(*[F.lit(s) for s in stages])
    seq = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"),
                                F.col(order_col).alias("o"),
                                F.col(type_col).alias("e")))
    )
    # Greedy walk: depth advances when the next event matches the
    # (depth+1)-th stage. element_at is 1-indexed.
    walk = F.aggregate(
        seq,
        F.lit(0),
        lambda acc, ev: F.when(
            (acc < k) & (ev["e"] == F.element_at(stage_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return (
        df.filter(F.col(type_col).isin(stages))
        .groupBy(F.col(user_col).alias("user"))
        .agg(walk.alias("depth"))
    )


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Funnel conversion table: one row per stage with the number of
    users whose greedy depth reaches it. Monotone non-increasing by
    construction."""
    depth = funnel_depth(df, stages, user_col, ts_col, type_col, order_col)
    counts = depth.groupBy().agg(
        *[
            F.count(F.when(F.col("depth") >= i + 1, 1)).alias(f"__s{i}")
            for i in range(len(stages))
        ]
    )
    # unpivot to (stage_idx, stage, users) — stack is a no-shuffle Expand
    pairs: list[Column] = []
    for i, s in enumerate(stages):
        pairs += [F.lit(i + 1), F.lit(s), F.col(f"__s{i}")]
    n = len(stages)
    return counts.select(
        F.expr(
            "stack({n}, {args}) AS (stage_idx, stage, users)".format(
                n=n,
                args=", ".join(
                    f"{i + 1}, '{s}', __s{i}" for i, s in enumerate(stages)
                ),
            )
        )
    ).select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "stage",
        F.col("users").cast("long").alias("users"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity date
    (their cohort), counted distinct per (cohort_date, period offset).

    Plan shape: both the first-activity aggregate and the distinct
    (user, day) set shuffle on the user key, so AQE can reuse one
    exchange layout; the join is user-key co-partitioned. The final
    matrix aggregate shuffles the (cohort, offset) pairs — tiny.
    """
    firsts = df.groupBy(F.col(user_col).alias("user")).agg(
        F.min(F.to_date(ts_col)).alias("cohort_date")
    )
    active = df.select(
        F.col(user_col).alias("user"), F.to_date(ts_col).alias("day")
    ).distinct()
    return (
        active.join(firsts, "user")
        .select(
            "cohort_date",
            F.floor(
                F.datediff("day", "cohort_date") / period_days
            ).cast("int").alias("period_offset"),
            "user",
        )
        .groupBy("cohort_date", "period_offset")
        .agg(F.count_distinct("user").alias("active_users"))
    )


def trend_slopes(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    epoch_offset_us: int = 1_704_067_200_000_000,  # 2024-01-01 UTC
) -> DataFrame:
    """Per-group ordinary-least-squares trend slope of value over time:
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), x in whole HOURS since
    a fixed offset.

    Bit-reproducible across engines and partitionings: every moment
    (Σx, Σy, Σxy, Σx²) accumulates in exact DECIMAL (associative) and
    the closing combination is a fixed-shape IEEE expression. The
    hour quantization of x is the part that makes the CROSS-ENGINE
    claim hold: it keeps each moment's magnitude under 2⁵³ at test
    scales, so the one decimal→double cast is exactly representable —
    engines disagree on correctly-rounding wide (>15 significant
    digit) decimals to double (DuckDB double-rounds int128·10⁻ˢ;
    Java's BigDecimal.doubleValue rounds once), and an exact cast
    sidesteps the discrepancy entirely. Across-partitioning
    determinism needs no such bound — decimal accumulation alone
    guarantees it at any scale. One map-side-combined shuffle on the
    group key; output is |groups| rows.
    """
    # floor((µs diff)/3.6e9): operands < 2^52 so the double division is
    # correctly rounded, and integer-µs remainders keep the true
    # quotient ≥ 0.4 µs away from floor boundaries — floor is stable.
    x = F.floor(
        (F.unix_micros(F.col(ts_col)) - F.lit(epoch_offset_us))
        / F.lit(3.6e9)
    ).cast("decimal(9,0)")
    y = F.col(value_col).cast("decimal(14,4)")
    agg = df.groupBy(*group_cols).agg(
        F.count("*").alias("__n"),
        F.sum(x.cast("decimal(38,0)")).alias("__sx"),
        F.sum(y.cast("decimal(38,4)")).alias("__sy"),
        F.sum((x * y).cast("decimal(38,4)")).alias("__sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    den = n * sxx - sx * sx
    slope = F.when(den == 0, F.lit(None).cast("double")).otherwise(
        (n * sxy - sx * sy) / den
    )
    return agg.select(
        *group_cols,
        F.col("__n").alias("n_obs"),
        slope.alias("slope_per_hour"),
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """EXACT rolling N-day distinct count (e.g. 7-day active users) per
    observed day: for each day d with ≥1 event, the number of distinct
    keys active in [d−N+1, d]. Returns (day, n_active).

    Scale shape: events collapse to the (day, key) presence table
    first (one partial-agg shuffle, dedupes within-day repeats early);
    each presence row then explodes to the ≤N window-days it covers —
    a bounded ×N expansion of the ALREADY-DEDUPED table, not of the
    event log — and one count-distinct per window day finishes. No
    window function, no self-join of the event log against itself.
    """
    du = (
        df.select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(key_col).alias("k"),
        )
        .where(F.col("day").isNotNull() & F.col("k").isNotNull())
        .distinct()
    )
    observed = du.select("day").distinct().withColumnRenamed(
        "day", "win_day"
    )
    covered = du.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), window_days - 1)
            )
        ).alias("win_day"),
        "k",
    )
    return (
        covered.join(observed, "win_day", "semi")
        .groupBy("win_day")
        .agg(F.countDistinct("k").alias("n_active"))
        .select(F.col("win_day").alias("day"), "n_active")
    )


def rolling_distinct_hll(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """Sketch twin of :func:`rolling_distinct` — the 100 TB path: one
    HyperLogLog sketch per day (Spark's Apache DataSketches
    ``hll_sketch_agg``; bounded bytes per day regardless of volume),
    then each day's sketch is UNIONED into the ≤N windows it covers —
    distinct counting becomes mergeable state, so a new day of data
    touches only N window rows instead of re-scanning N days of raw
    events. This is the pattern that also gives cross-run
    incrementality: persist the daily sketches and union on read.
    Returns (day, approx_active); estimate is deterministic for fixed
    input (no RNG), accuracy ~1.6%/√(2^lg_k). Not SQL-expressible
    cross-engine (sketch internals) → verified against the exact twin
    in pytest."""
    daily = df.select(
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(key_col).alias("k"),
    ).where(
        F.col("day").isNotNull() & F.col("k").isNotNull()
    ).groupBy("day").agg(
        F.hll_sketch_agg("k", F.lit(lg_k)).alias("sk")
    )
    observed = daily.select("day").withColumnRenamed("day", "win_day")
    covered = daily.select(
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), window_days - 1)
            )
        ).alias("win_day"),
        "sk",
    )
    return (
        covered.join(observed, "win_day", "semi")
        .groupBy("win_day")
        .agg(F.hll_union_agg("sk").alias("u"))
        .select(
            F.col("win_day").alias("day"),
            F.hll_sketch_estimate("u").alias("approx_active"),
        )
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """First-order path analysis: the Markov transition table over
    consecutive events within each user's totally-ordered stream —
    (from_type, to_type, n, share) where share is row-normalized per
    from_type. The exploratory companion to the funnel: funnels check
    a HYPOTHESIZED path, transitions surface the paths that exist.

    Scale shape: ONE user-key shuffle (the same layout the funnel and
    sessionizer use) with a per-user ``lead`` — per-user volumes are
    bounded in event analytics, and a pathological hot user is a data
    bug upstream, not a partitioning concern. The normalization sum
    runs over the |types|² count table, not the event log. Exact
    integer counts; share is one IEEE division."""
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy("t", "o")
    pairs = (
        df.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("t"),
            F.col(order_col).alias("o"),
            F.col(type_col).alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / F.sum("n").over(wf).cast("double")).alias("share"),
    )


def min_hop_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Directed transitive closure with minimum hop counts — level-
    synchronous BFS from EVERY node at once (the iterative-algorithm
    class Spark SQL's linear-recursion-only ``WITH RECURSIVE`` cannot
    express over a cyclic graph): returns (src, dst, min_hops) for
    every pair reachable in 1..max_hops hops, cycles included
    (a→…→a yields a self-pair).

    Per level: one edge-key shuffle (frontier ⋈ edges), a distinct on
    the discovered pairs, and an anti-join against everything already
    reached — BFS discovers each pair first at its minimum depth, so
    no re-visit or min-aggregation is needed. Each frontier is
    eagerly localCheckpoint-ed: iteration ``i`` must not re-derive
    levels 1..i-1 through an unbounded lineage (the same discipline as
    the connected-components loop in llm/dedup.py). Terminates when a
    frontier empties (diameter levels) or at ``max_hops``.

    Scale shape: levels are sequential barriers — the right tool for
    diameter-bounded closures (event-type graphs, lineage/impact
    graphs, org trees). For web-scale graphs, hash-to-min CC or
    pointer-doubling (O(log V) rounds) replace per-level BFS; the
    edge-key shuffle per round is the same.
    """
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        e.select(F.col("__s").alias("__root"), F.col("__d").alias("__node"))
        .distinct()
        .withColumn("__hops", F.lit(1))
        .localCheckpoint(eager=True)
    )
    reached = frontier
    for hops in range(2, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["__node"] == e["__s"])
            .select("__root", F.col("__d").alias("__node"))
            .distinct()
            .join(reached, ["__root", "__node"], "left_anti")
            .withColumn("__hops", F.lit(hops))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt)
        frontier = nxt
    return reached.select(
        F.col("__root").alias(src),
        F.col("__node").alias(dst),
        F.col("__hops").cast("int").alias("min_hops"),
    )


def skyline_2d(
    df: DataFrame,
    max_col: str,
    min_col: str,
    tie_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """2-D skyline (Pareto frontier): the rows NOT strictly dominated —
    no other row has ``max_col`` >= AND ``min_col`` <= with at least
    one strict. The classic "best suppliers by (revenue up, discount
    down)" / "best configs by (throughput up, cost down)" operator
    (Börzsönyi et al., ICDE 2001). Rows tied on BOTH measures are
    deduplicated to the smallest ``tie_col`` (deterministic); rows
    with a NULL measure are incomparable and dropped.

    Scale shape — the naive form is an O(N²) NOT-EXISTS self-join and
    the textbook sequential form is a sort + running strict-min, i.e.
    a GLOBAL ordered window (one task owns every row — the plan-audit
    reject). This uses the repo's distributed-prefix-scan discipline
    (gini/pareto pattern): range-bucket ``max_col`` against
    percentile_approx boundaries; per-bucket min(``min_col``) rows
    (<= n_buckets of them) come to the driver, where the
    strictly-higher-bucket suffix-min becomes a literal when-chain
    broadcast back; the residual running strict-min is a window
    partitioned PER BUCKET. Dominance never crosses buckets except
    through the driver-computed offsets (a higher bucket implies a
    strictly greater ``max_col`` by boundary construction), so the
    plan has no global sort, one bounded collect, and one bucket-local
    window."""
    from pyspark.sql import Window

    # three consumers read this frame (boundary sketch, bucket mins,
    # the scored pass) — materialize the comparable rows once instead
    # of re-running an arbitrary upstream plan per branch (the
    # partitioned_prefix_sum discipline)
    d = df.filter(
        F.col(max_col).isNotNull() & F.col(min_col).isNotNull()
    ).localCheckpoint(eager=True)
    fracs = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    bounds_row = d.agg(
        F.percentile_approx(max_col, fracs, F.lit(10000)).alias("__bs")
    ).collect()[0]
    bs = bounds_row["__bs"] or []
    bucket = F.lit(0)
    for b in bs:
        bucket = bucket + (F.col(max_col) > F.lit(b)).cast("int")
    bucketed = d.withColumn("__b", bucket)
    mins = {
        r["__b"]: r["__m"]
        for r in bucketed.groupBy("__b")
        .agg(F.min(min_col).alias("__m"))
        .collect()
    }
    # suffix strict-min over HIGHER buckets, driver-side (<= n_buckets)
    offs: dict[int, float] = {}
    running = None
    for b in sorted(mins, reverse=True):
        offs[b] = running
        running = mins[b] if running is None else min(running, mins[b])
    off_expr = F.lit(None).cast(dict(d.dtypes)[min_col])
    for b, v in offs.items():
        if v is not None:
            off_expr = F.when(F.col("__b") == b, F.lit(v)).otherwise(
                off_expr
            )
    w = (
        Window.partitionBy("__b")
        .orderBy(
            F.desc(max_col), F.asc(min_col), F.asc(tie_col)
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_min = F.min(min_col).over(w)
    kept = bucketed.withColumn("__off", off_expr).withColumn(
        "__prev", prev_min
    )
    return kept.filter(
        (F.col("__prev").isNull() | (F.col("__prev") > F.col(min_col)))
        & (F.col("__off").isNull() | (F.col("__off") > F.col(min_col)))
    ).drop("__b", "__off", "__prev")


def triangle_counts(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    orient: str = "degree",
) -> DataFrame:
    """Per-vertex triangle participation counts over an undirected edge
    list — the graph-mining cohesion primitive (clustering coefficient
    numerator). Returns (node, tri_cnt) for every vertex in >=1
    triangle; each triangle contributes 1 to each of its three corners.
    Input edges are canonicalized (least/greatest + distinct, self
    loops dropped), so callers may pass either or both directions.

    Enumeration is compact-forward: orient every undirected edge by a
    TOTAL order on vertices, then join e1(x,y) ⋈ e2(y,z) ⋈ e3(x,z) on
    the oriented list — each triangle {p,q,r} with p≺q≺r is found
    exactly once as its (p→q, q→r, p→r) orientation. The result set is
    orientation-invariant; only the join fan-out changes.

    orient="degree" (default, the 100 TB shape): order vertices by
    (degree, id), i.e. point each edge at its higher-degree endpoint.
    Max out-degree of the oriented list is O(sqrt(m)) regardless of
    the degree distribution, so the y-keyed join's per-key fan-out is
    bounded even on power-law graphs where a hot hub would otherwise
    make one shuffle partition quadratic (the straggler AQE can only
    partially split). Costs one extra degree aggregation + join over
    the (already support-pruned) edge list — (vertex,long) rows only.

    orient="id" (the oracle-twin shape): order by vertex id alone —
    matches the textbook SQL formulation literally, no degree pass;
    fan-out is bounded only by max degree, fine at test scale."""
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("__a"),
            F.greatest(F.col(a), F.col(b)).alias("__b"),
        )
        .filter(F.col("__a") != F.col("__b"))
        .distinct()
    )
    if orient == "degree":
        # two consumers (degree agg + orientation join) — materialize
        # the canonical edge list once instead of re-running the
        # caller's upstream plan per branch
        e = e.localCheckpoint(eager=True)
        deg = (
            e.select(F.col("__a").alias("__v"))
            .unionAll(e.select(F.col("__b").alias("__v")))
            .groupBy("__v")
            .agg(F.count("*").alias("__deg"))
        )
        ed = e.join(
            deg.select(
                F.col("__v").alias("__a"), F.col("__deg").alias("__da")
            ),
            "__a",
        ).join(
            deg.select(
                F.col("__v").alias("__b"), F.col("__deg").alias("__db")
            ),
            "__b",
        )
        fwd = (F.col("__da") < F.col("__db")) | (
            (F.col("__da") == F.col("__db"))
            & (F.col("__a") < F.col("__b"))
        )
        o = ed.select(
            F.when(fwd, F.col("__a")).otherwise(F.col("__b")).alias("__s"),
            F.when(fwd, F.col("__b")).otherwise(F.col("__a")).alias("__d"),
        )
    elif orient == "id":
        o = e.select(F.col("__a").alias("__s"), F.col("__b").alias("__d"))
    else:
        raise ValueError(f"unknown orient {orient!r}")
    # three triangle-join consumers read the oriented list
    o = o.localCheckpoint(eager=True)
    e1 = o.select(F.col("__s").alias("__x"), F.col("__d").alias("__y"))
    e2 = o.select(F.col("__s").alias("__y"), F.col("__d").alias("__z"))
    e3 = o.select(F.col("__s").alias("__x"), F.col("__d").alias("__z"))
    tri = e1.join(e2, "__y").join(e3, ["__x", "__z"])
    verts = (
        tri.select(F.col("__x").alias("node"))
        .unionAll(tri.select(F.col("__y").alias("node")))
        .unionAll(tri.select(F.col("__z").alias("node")))
    )
    return verts.groupBy("node").agg(F.count("*").alias("tri_cnt"))


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank power iteration in FIXED-POINT integer arithmetic —
    every quantity is a BIGINT in units of 1/``scale``, every step is
    an integer sum (exact, order-independent) or integer division
    (deterministic truncation), so the result is BIT-IDENTICAL across
    engines and an exact SQL oracle twin exists (chained CTEs, one per
    iteration — the ``twap_by_user`` integer-exactness discipline
    applied to an iterative algorithm). Returns (node, rank_fp) where
    rank_fp ≈ rank · scale; truncation error per step is < 1 unit of
    1/scale per term, so at the default 10⁻¹² granularity the ranking
    order matches the float form far beyond any realistic tie.

    Per-iteration plan shape (r12 optimization — one shuffle join
    per round): contributions = ONE (src)-keyed join of the rank
    vector onto the degree-annotated edge list (degree pre-joined
    ONCE outside the loop; the old shape joined rank onto outdeg and
    then onto the edge list — two shuffle joins every round), one
    (dst)-keyed partial agg, dangling mass as a plain aggregate over
    a dangling FLAG carried on the node frame (the old per-round
    semi-join against a dangling-node list is gone), rank vector
    localCheckpoint-ed per round. All arithmetic is integer, so the
    restructure is bit-identical by construction. Damping is the
    standard 0.85 expressed as ·85 div 100."""
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("__s").agg(F.count("*").alias("__deg"))
    # node frame with the static dangling flag (no out-edges) — the
    # flag rides along the per-round rebuild so dangling mass needs
    # no join, just a conditional sum over the rank vector
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .join(outdeg, F.col("node") == F.col("__s"), "left")
        .select("node", F.col("__s").isNull().alias("__dg"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node").withColumn(
            "rank_fp", F.lit(0).cast("long")
        )
    # degree-annotated edge list, computed once: (src, dst, out-degree)
    edeg = e.join(outdeg, "__s").localCheckpoint(eager=True)
    tele = (15 * scale) // (100 * n)  # (1-d)/n in fixed point, exact
    r = nodes.selectExpr(
        "node", "__dg", f"CAST({scale // n} AS BIGINT) AS r"
    )
    # LAZY per-round checkpoints (r13, guide §1.2): lineage still
    # truncates at every round (the LogicalRDD boundary is built
    # immediately), but materialization folds into the next action's
    # execution instead of one blocking driver job per round — each
    # round's dangling-mass broadcast forces the prior round's rank
    # RDD exactly once, so no recomputation. Integer arithmetic keeps
    # the result bit-identical under any execution grouping.
    r = r.localCheckpoint(eager=False)
    for _ in range(iters):
        dang = F.broadcast(
            r.agg(
                F.coalesce(
                    F.sum(F.when(F.col("__dg"), F.col("r"))), F.lit(0)
                )
                .cast("long")
                .alias("__dang")
            )
        )
        contrib = (
            r.join(edeg, F.col("node") == F.col("__s"))
            .selectExpr("__d", "r div __deg AS __c")
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum("__c").cast("long").alias("__in"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .crossJoin(dang)
            .selectExpr(
                "node",
                "__dg",
                f"CAST({tele} AS BIGINT)"
                f" + (85 * (coalesce(__in, CAST(0 AS BIGINT))"
                f" + (__dang div {n}))) div 100 AS r",
            )
            # lazy: see the init checkpoint's comment — truncation is
            # immediate, materialization folds into the next round's
            # broadcast instead of one blocking job per round
            .localCheckpoint(eager=False)
        )
    return r.select("node", F.col("r").alias("rank_fp"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank by power iteration over an edge list — the standard
    importance measure for link/citation/co-occurrence graphs, joining
    the repo's graph family (connected components, BFS closure,
    triangles). Returns (node, rank) with ranks summing to ~1.
    Dangling nodes (no out-edges) redistribute their mass uniformly,
    the textbook correction — without it rank mass leaks every
    iteration and the vector no longer sums to 1.

    Scale shape per iteration: contributions = one (src)-keyed join of
    the rank vector onto the out-degree-weighted edge list, then one
    (dst)-keyed partial agg — two shuffles of (node, double), never
    the full adjacency payload; the rank vector is localCheckpoint-ed
    each round so iteration i never re-derives i-1's lineage (the CC
    loop's discipline). Convergence is checked on the L1 delta
    (one-row agg) every iteration; floats here are honest numerics —
    power iteration is approximate by nature, so this operator is a
    rows-only/pytest surface, not an exact-oracle one."""
    from pyspark.sql import functions as F

    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("__s").agg(F.count("*").alias("__deg"))
    # node frame with the static dangling flag (no out-edges), derived
    # once — per round only the flagged mass is aggregated, with no
    # join (r12: the old shape paid a semi-join against a
    # dangling-node list every round)
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .join(outdeg, F.col("node") == F.col("__s"), "left")
        .select("node", F.col("__s").isNull().alias("__dg"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node").withColumn("rank", F.lit(0.0))
    # degree-annotated edge list, computed once — contributions are
    # then ONE (src)-keyed shuffle join per round instead of two
    # (rank onto outdeg, then onto the edge list)
    edeg = e.join(outdeg, "__s").localCheckpoint(eager=True)
    # LAZY per-round rank checkpoints (r13, guide §1.2): lineage still
    # truncates at every round, but materialization folds into the
    # next action (each round's dangling broadcast forces the prior
    # rank RDD exactly once) instead of one blocking driver job per
    # round — measured interleaved A/B ~10-15% off the whole query.
    # The per-round plan is unchanged, so floats are untouched.
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(
        eager=False
    )
    for i in range(max_iter):
        # mass from dangling nodes spreads uniformly — carried as a
        # broadcast ONE-ROW aggregate inside the plan, not a
        # per-iteration driver collect (2 extra jobs/round measured
        # ~2x the whole iteration cost on a dim-sized graph)
        dangling = F.broadcast(
            ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("__dg"), F.col("rank"))),
                    F.lit(0.0),
                ).alias("__dang")
            )
        )
        contrib = (
            ranks.join(edeg, F.col("node") == F.col("__s"))
            .select(
                "__d", (F.col("rank") / F.col("__deg")).alias("__c")
            )
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum("__c").alias("__in"))
        )
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                "__dg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        old, ranks = ranks, new_ranks
        # L1 convergence probe every 5th round: each probe is an extra
        # join+agg job, power iteration converges geometrically so
        # per-round checks are mostly wasted, and a probe on the final
        # pass could only break out of an already-finished loop
        if i % 5 == 4 and i != max_iter - 1:
            delta = (
                ranks.alias("a")
                .join(old.alias("b"), "node")
                .agg(
                    F.sum(
                        F.abs(F.col("a.rank") - F.col("b.rank"))
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            if delta is not None and delta < tol:
                break
    return ranks.select("node", "rank")
