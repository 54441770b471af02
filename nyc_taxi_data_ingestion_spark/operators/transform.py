"""Silver-layer transform operators (SURVEY §2.2 P1-P4, §2.5 W1).

Behavioral parity with the reference's transform chain
(``silver/jobs/bronze_to_silver.py:311-349``): rename → cast → derive →
filter → dedupe, in that order. Each op is a pure plan-builder — no
action is triggered, so Catalyst sees one logical plan for the whole
chain (the reference fires ~10 eager ``.count()`` jobs per run purely
for logging; we keep the plan lazy and let callers attach
``df.observe()`` metrics instead).

Scale notes:
- rename/cast/derive/filter are narrow (no shuffle), fully codegen'd,
  and filters expressed as SQL strings reach the Parquet scan as pushed
  predicates.
- dedupe is the only wide op (one hash shuffle on the dedupe keys).
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Config cast-type vocabulary, parity with bronze_to_silver.py:353-361.
_TYPE_MAP: dict[str, T.DataType] = {
    "timestamp": T.TimestampType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*(?:\(\s*(\d+)\s*,\s*(\d+)\s*\))?$", re.I)


def parse_type(name: str) -> T.DataType:
    """Parse a config type name (incl. ``decimal(p,s)``, defaults (10,2) —
    parity with bronze_to_silver.py:366-373)."""
    key = name.strip().lower()
    m = _DECIMAL_RE.match(key)
    if m:
        p = int(m.group(1)) if m.group(1) else 10
        s = int(m.group(2)) if m.group(2) else 2
        return T.DecimalType(p, s)
    try:
        return _TYPE_MAP[key]
    except KeyError:
        raise ValueError(f"unsupported cast type: {name!r}") from None


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P1 — rename columns, silently skipping ones not present
    (parity: bronze_to_silver.py:317-321 skips missing)."""
    present = {c for c in df.columns}
    effective = {old: new for old, new in mapping.items() if old in present}
    if not effective:
        return df
    return df.withColumnsRenamed(dict(effective))


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """P2 — per-column casts via the config type vocabulary
    (parity: bronze_to_silver.py:351-379). Missing columns skipped."""
    effective = {
        c: F.col(c).cast(parse_type(t)) for c, t in casts.items() if c in df.columns
    }
    if not effective:
        return df
    return df.withColumns(effective)


def derive_columns(df: DataFrame, exprs: Mapping[str, str]) -> DataFrame:
    """P3 — derived columns from arbitrary Spark-SQL scalar expressions
    (parity: bronze_to_silver.py:381-390, the YAML ``F.expr`` surface)."""
    if not exprs:
        return df
    return df.withColumns({name: F.expr(sql) for name, sql in exprs.items()})


def filter_rows(df: DataFrame, predicates: Iterable[str]) -> DataFrame:
    """P4 — conjunctive filter chain of SQL predicate strings
    (parity: bronze_to_silver.py:337-342). Sequential ``.filter`` calls
    collapse into one pushed predicate under Catalyst."""
    for pred in predicates:
        df = df.filter(pred)
    return df


def dedupe_keep_first(
    df: DataFrame,
    keys: list[str],
    order_by: str | None = None,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """W1 — keep-first dedup via row_number over a key window.

    Parity: bronze_to_silver.py:392-429 — ``order_by`` is a ``"col DIR"``
    string; no-op when ``keys`` is empty (reference warns and skips).

    Deviation (documented in SURVEY §7.3): the reference orders by a
    single column, so ties pick an arbitrary survivor. We append
    ``tie_breakers`` (ascending) to the ordering for deterministic,
    reproducible output — required for oracle hash-parity and for
    idempotent re-runs at scale.

    Scale: one shuffle on ``keys``; Spark plans a partial
    row_number per partition only after the exchange, so the cost is the
    exchange itself. For heavily-skewed keys AQE skew handling does not
    apply to window exchanges — callers with known-skewed dedupe keys
    should pre-salt or widen the key set.
    """
    if not keys:
        return df

    order_cols = []
    if order_by:
        parts = order_by.split()
        col, direction = parts[0], (parts[1].upper() if len(parts) > 1 else "ASC")
        order_cols.append(F.col(col).desc() if direction == "DESC" else F.col(col).asc())
    for tb in tie_breakers or []:
        order_cols.append(F.col(tb).asc())
    if not order_cols:
        # row_number requires an ordering; fall back to the key columns.
        order_cols = [F.col(k).asc() for k in keys]

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    rn = "__rn"
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1).drop(rn)


def apply_transformations(
    df: DataFrame,
    renames: Mapping[str, str] | None = None,
    casts: Mapping[str, str] | None = None,
    derived: Mapping[str, str] | None = None,
    filters: Iterable[str] | None = None,
    dedupe_keys: list[str] | None = None,
    dedupe_order_by: str | None = None,
    dedupe_tie_breakers: list[str] | None = None,
) -> DataFrame:
    """The full Silver chain in the reference's order
    (bronze_to_silver.py:311-349): rename → cast → derive → filter → dedupe."""
    df = rename_columns(df, renames or {})
    df = cast_columns(df, casts or {})
    df = derive_columns(df, derived or {})
    df = filter_rows(df, filters or [])
    if dedupe_keys:
        df = dedupe_keep_first(df, dedupe_keys, dedupe_order_by, dedupe_tie_breakers)
    return df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join (extension — Spark has no native ASOF JOIN): attach
    to each left row the most recent right row with
    ``right_ts <= left_ts`` per key, left-join semantics (no prior
    right row → NULL values).

    Spark-first plan: tag-and-union both sides, then one carry-forward
    window per key (``last(value, ignorenulls=True)`` over rows
    preceding) and keep the left rows. Right rows sort BEFORE left rows
    at equal timestamps, giving inclusive (<=) semantics. Cost: one
    shuffle per side on the key + one window sort — no range explode,
    no per-row subquery, no broadcast of either side; this is the
    standard distributed as-of shape (pandas ``merge_asof`` is the
    single-node analogue). For heavily-skewed keys the same caveat as
    ``dedupe_keep_first`` applies: AQE does not split window exchanges.

    The right side must be unique per (key, ts) — pre-reduce duplicates
    (e.g. ``max_by``) or the carried row is nondeterministic.
    """
    if direction != "backward":
        raise ValueError("only backward (<=) as-of is implemented")
    lcols = left.columns
    rvals = {c: right.schema[c].dataType for c in value_cols}
    l_tagged = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),
        *lcols,
        *[F.lit(None).cast(t).alias(f"__r_{c}") for c, t in rvals.items()],
    )
    r_tagged = right.filter(F.col(right_on).isNotNull()).select(
        F.col(right_on).alias("__key"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumns(
        {f"__r_{c}": F.last(f"__r_{c}", ignorenulls=True).over(w) for c in rvals}
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__r_{c}").alias(c) for c in rvals]
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    salt_col: str | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-k rows per group (T2). ``order_cols`` are ready-made
    ascending/descending Columns and MUST form a total order (append a
    unique tie-breaker) for deterministic output.

    ``salt_col`` enables the SKEW-RESISTANT two-phase plan — the
    answer to "AQE skew handling does not split window exchanges": a
    hot group's rows are first spread over ``salt_buckets`` sub-
    partitions by hashing ``salt_col``, local top-k runs per
    (group, salt), and only ≤ buckets·k survivors per group reach the
    final per-group window. The hot partition shrinks from |group| to
    |group|/buckets rows at the cost of one extra (cheap, pre-pruned)
    window pass; output is IDENTICAL to the unsalted plan — top-k is
    a selection, so pruning non-candidates locally is lossless.
    """
    w_final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    drop = ["__rn"]
    if salt_col is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets))
        w_local = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
        df = (
            df.withColumn("__salt", salt)
            .withColumn("__lrn", F.row_number().over(w_local))
            .filter(F.col("__lrn") <= k)
            .drop("__lrn")
        )
        drop.append("__salt")
    return (
        df.withColumn("__rn", F.row_number().over(w_final))
        .filter(F.col("__rn") <= k)
        .drop(*drop)
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_days: int = 7,
) -> DataFrame:
    """Range join (extension — Spark plans a raw ``t BETWEEN s AND e``
    join as BroadcastNestedLoop or a cartesian filter): match each
    point to every interval of the same key containing it,
    ``start <= t < end``.

    Bucketed-bin plan: both sides are binned to ``bin_width_days``-day
    buckets — an interval explodes into the (few) bins it spans, a
    point lands in exactly one — then a plain EQUI-join on
    (key, bin) + exact range filter. Catalyst gets a hash join with
    full shuffle-pruning instead of an O(n·m) nested loop; bin width
    tunes fan-out vs selectivity (match it to the typical interval
    length). This is the standard distributed interval-join shape
    (cf. Spark's own SPARK-8682 range-join discussions).
    """
    day_bin = lambda c: F.floor(  # noqa: E731
        F.unix_date(F.col(c).cast("date")) / bin_width_days
    ).cast("long")
    p = points.withColumn("__bin", day_bin(point_ts))
    i = intervals.withColumn(
        "__bins",
        F.sequence(day_bin(start_ts), day_bin(end_ts)),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    cond = (
        (F.col(f"p.{point_key}") == F.col(f"i.{interval_key}"))
        & (F.col("p.__bin") == F.col("i.__bin"))
        & (F.col(f"p.{point_ts}") >= F.col(f"i.{start_ts}").cast("timestamp"))
        & (F.col(f"p.{point_ts}") < F.col(f"i.{end_ts}").cast("timestamp"))
    )
    return (
        p.alias("p")
        .join(i.alias("i"), cond)
        .select(
            *[F.col(f"p.{c}") for c in points.columns],
            *[
                F.col(f"i.{c}")
                for c in intervals.columns
                if c != interval_key
            ],
        )
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Build SCD Type-2 history from an event/snapshot log: collapse
    consecutive rows with unchanged ``attr_cols`` per key into one
    validity interval — (keys, attrs, valid_from, valid_to, is_current),
    ``valid_to`` = next version's start, NULL while current.

    Gaps-and-islands: a change flag (null-safe ``<=>`` comparison vs
    the LAG of each attribute) cumulatively summed into a version id,
    then one group-agg per version and a LEAD for the closing
    timestamp. Three window passes over the SAME (key × time)
    partitioning — Catalyst plans one Exchange reused by all of them,
    so the operator costs a single shuffle. Partitioning is per-key,
    never global; ``tie_breakers`` make the order total so version
    boundaries are deterministic under concurrent equal timestamps.
    """
    tb = tie_breakers or []
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tb)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    ver = (
        df.withColumn(
            "__chg",
            F.when(F.lag(ts_col).over(w).isNull() | changed, 1).otherwise(0),
        )
        .withColumn("__ver", F.sum("__chg").over(w))
    )
    versions = ver.groupBy(*key_cols, "__ver", *attr_cols).agg(
        F.min(ts_col).alias("valid_from")
    )
    # __ver breaks valid_from ties (adjacent versions can share a
    # timestamp when the change happens within one tick)
    w_ver = Window.partitionBy(*key_cols).orderBy("valid_from", "__ver")
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(w_ver))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__ver")
    )


# -- schema evolution --------------------------------------------------------

# Safe (lossless) widenings for schema drift — anything else is either
# identity or a narrowing that silently corrupts at scale.
_WIDENINGS: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint", "double", "decimal"},
    "smallint": {"int", "bigint", "double", "decimal"},
    "int": {"bigint", "double", "decimal"},
    "bigint": {"decimal"},
    "float": {"double"},
    "date": {"timestamp"},
}


def conform_schema(
    df: DataFrame,
    target: T.StructType | str,
    strict: bool = False,
    allow_narrowing: bool = False,
) -> DataFrame:
    """Align a frame to a target schema — the engine's schema-evolution
    contract (the reference evolves by permissiveness: unknown columns
    pass through, checks skip missing ones — SURVEY §1.4; Iceberg would
    do this in the table format. Without a table format the rule must
    live in an operator).

    - missing target columns are added as typed NULLs (the reference
      declares every field nullable — ``helpers.py:50``);
    - present columns are cast when the cast is a documented lossless
      widening (int→bigint, float→double, date→timestamp, …);
      narrowing/lossy casts raise unless ``allow_narrowing=True`` —
      a silent long→int at 100 TB is data corruption, not evolution;
    - extra columns are dropped (``strict=True`` raises instead —
      use strict for Gold, permissive for Bronze);
    - output column order = target order (positional consumers and
      UNION by position stay stable).

    Pure plan-builder: projections only, no action, fuses into the scan.
    """
    if isinstance(target, str):
        target = T.StructType.fromDDL(target)
    have = {f.name: f for f in df.schema.fields}
    extras = [c for c in df.columns if c not in {f.name for f in target.fields}]
    if strict and extras:
        raise ValueError(f"extra columns not in target schema: {extras}")
    out = []
    for f in target.fields:
        if f.name not in have:
            out.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        cur = have[f.name].dataType
        if cur == f.dataType:
            out.append(F.col(f.name))
            continue
        cur_base = cur.simpleString().split("(")[0]
        tgt_base = f.dataType.simpleString().split("(")[0]
        widening = tgt_base in _WIDENINGS.get(cur_base, set()) or (
            cur_base == tgt_base and cur_base in ("decimal", "varchar", "char")
        )
        if not widening and not allow_narrowing:
            raise ValueError(
                f"column {f.name}: {cur.simpleString()} → "
                f"{f.dataType.simpleString()} is not a lossless widening; "
                "pass allow_narrowing=True to force"
            )
        out.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*out)


def union_conformed(
    dfs: list[DataFrame],
    target: T.StructType | str | None = None,
    allow_narrowing: bool = False,
) -> DataFrame:
    """Union frames with drifting schemas by conforming each to a
    shared target first (default: the first frame's schema, the
    "current" table schema). The month-over-month ingestion case:
    upstream added/dropped/widened columns across snapshots; reading
    them as one corpus must not depend on which file Spark lists
    first."""
    if not dfs:
        raise ValueError("union_conformed needs at least one frame")
    target = target or dfs[0].schema
    conformed = [
        conform_schema(d, target, allow_narrowing=allow_narrowing) for d in dfs
    ]
    out = conformed[0]
    for d in conformed[1:]:
        out = out.unionByName(d)
    return out


def partitioned_prefix_sum(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str,
    n_buckets: int = 64,
    assert_unique_order: bool = False,
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` in ``order_col`` order
    within each ``part_cols`` group, WITHOUT a group-per-task window.

    ``Window.partitionBy(part_cols).orderBy(order_col)`` moves each
    whole group into ONE task — for low-cardinality groups (a handful
    of corpus sources over 100 TB) that is a single-task scan of the
    largest group. Instead, the standard two-pass distributed scan:
    ``percentile_approx`` boundaries over ``order_col`` split each
    group into ``n_buckets`` monotone ranges; per-(group, bucket)
    subtotals (a bounded table: |groups|·n_buckets rows) produce
    broadcast prefix OFFSETS via the only ordered window in the plan —
    over those subtotal rows; the in-bucket exclusive sum is a window
    partitioned by (group, bucket). Sketch boundary placement only
    affects bucket balance, never the sum (integer adds commute).

    Plan/materialization shape: the (group, order, value) projection
    is materialized ONCE (``localCheckpoint`` — three scalars per row,
    the same at-rest-index class as the MinHash signature table, ~1%
    of corpus bytes); boundaries and offsets derive from it, so the
    upstream plan is evaluated exactly twice total (the checkpoint
    build + the returned plan) instead of once per derived branch —
    left lazy, a composed pipeline upstream re-runs 4×. The boundary
    row is additionally checkpointed (KB-sized) because two branches
    consume it.

    Requires a NUMERIC or TEMPORAL ``order_col`` (the boundary sketch
    is ``percentile_approx``, which admits date/timestamp; give string
    ids a numeric surrogate upstream — raised as ValueError, not a
    cast crash) UNIQUE within each group: duplicate order keys land in
    one bucket and their within-bucket prefix order is ambiguous — set
    ``assert_unique_order=True`` to pay one aggregate that raises on
    duplicates instead of trusting the caller. NULL group keys form
    their own group (null-safe joins). Output = input columns +
    ``out_col``; ``value_col`` nulls count as 0. The sum keeps
    ``value_col``'s own sum type (long for integers, double for
    doubles — for floats the result is deterministic for a fixed
    bucket count but associates differently than a sequential scan;
    use decimal inputs for bit-exactness)."""
    order_type = dict(df.dtypes)[order_col]
    if order_type.split("(")[0] not in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "decimal", "date", "timestamp", "timestamp_ntz",
    ):
        raise ValueError(
            f"partitioned_prefix_sum needs a numeric/temporal order_col; "
            f"got {order_col}: {order_type}. Provide a numeric surrogate "
            "(e.g. xxhash64 breaks ties but not order — derive a rank "
            "first) or use an ordered window if the group count is known "
            "to be large."
        )
    if assert_unique_order:
        dup = (
            df.groupBy(*part_cols, order_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"partitioned_prefix_sum: duplicate order key within a "
                f"group — {dict(dup[0].asDict())}; the within-bucket "
                f"prefix over tied keys is ambiguous. Disambiguate the "
                f"order column (e.g. add a row id) first."
            )
    fracs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    narrow = df.select(*part_cols, order_col, value_col).localCheckpoint(
        eager=True
    )
    bounds = narrow.groupBy(*part_cols).agg(
        F.percentile_approx(order_col, fracs, F.lit(10000)).alias("__bs")
    ).localCheckpoint(eager=True)
    bucket_of = F.size(F.filter("__bs", lambda b: b <= F.col(order_col)))

    def _nullsafe_join(left: DataFrame, right: DataFrame, cols: list[str]):
        # join on part_cols must keep NULL group keys (they form their
        # own group in the aggregates above); plain `on=cols` drops them
        r = right
        cond = None
        for c in cols:
            r = r.withColumnRenamed(c, f"__r_{c}")
            piece = left[c].eqNullSafe(r[f"__r_{c}"])
            cond = piece if cond is None else cond & piece
        return left.join(F.broadcast(r), cond).drop(
            *[f"__r_{c}" for c in cols]
        )

    bucketed = _nullsafe_join(df, bounds, part_cols).withColumn(
        "__b", bucket_of
    )
    sub = (
        _nullsafe_join(narrow, bounds, part_cols)
        .withColumn("__b", bucket_of)
        .groupBy(*part_cols, "__b")
        .agg(F.sum(F.coalesce(F.col(value_col), F.lit(0))).alias("__s"))
    )
    wb = (
        Window.partitionBy(*part_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sub.select(
        *part_cols,
        "__b",
        F.coalesce(F.sum("__s").over(wb), F.lit(0)).alias("__off"),
    )
    wl = (
        Window.partitionBy(*part_cols, "__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = F.coalesce(
        F.sum(F.coalesce(F.col(value_col), F.lit(0))).over(wl), F.lit(0)
    )
    joined = _nullsafe_join(bucketed, offsets, [*part_cols, "__b"])
    return (
        joined.withColumn(out_col, F.col("__off") + loc)
        .drop("__bs", "__b", "__off")
    )


def skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Join/aggregation-key skew diagnostic: per-key count distribution
    in ONE pass over the keys — the measurement you take BEFORE
    deciding to salt a join or enable AQE skew handling at scale
    (`topk_per_group_salted` is the fix; this is the detector).

    Returns one row: n_rows, n_keys, avg_cnt, p50/p90/p99_cnt, max_cnt,
    skew_ratio (max/avg — ~1 means uniform; the AQE skew-join default
    fires at 5x median), and hot_key (heaviest key, ties broken by key
    value so the report is deterministic).

    Scale shape: one partial-agg shuffle keyed by the key (the same
    shuffle the join under diagnosis would do — run it on a sample if
    even that is too hot), then a single-row reduce. The hot key rides
    the same reduce via an order-embedding string (zero-padded count |
    key) so no second pass or join is needed."""
    key = (
        F.col(key_cols[0]).cast("string")
        if len(key_cols) == 1
        else F.concat_ws("§", *[F.col(c).cast("string") for c in key_cols])
    )
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count("*").alias("cnt")
    )
    packed = F.format_string("%020d|%s", F.col("cnt"), F.col("key"))
    agg = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.50)").alias("p50_cnt"),
        F.expr("percentile(cnt, 0.90)").alias("p90_cnt"),
        F.expr("percentile(cnt, 0.99)").alias("p99_cnt"),
        F.max(packed).alias("__top"),
    )
    avg = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return agg.select(
        "n_rows",
        "n_keys",
        avg.alias("avg_cnt"),
        "p50_cnt",
        "p90_cnt",
        "p99_cnt",
        "max_cnt",
        (F.col("max_cnt").cast("double") / avg).alias("skew_ratio"),
        # fixed offset (20-digit count + "|"), NOT substring_index —
        # a key containing the delimiter must not truncate
        F.substring("__top", 22, 2_000_000).alias("hot_key"),
    )
