"""Named query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 gets a named entry here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB-compatible oracle SQL string over the same
parquet tables. ``__spark_entry__.py`` re-exports this registry.

Determinism contract (see functions/numeric.py): every aggregate over
doubles goes through exact decimal accumulation in BOTH the Spark query
and the oracle SQL, so results are bit-identical regardless of
partitioning. Every LIMIT is preceded by a total order. Every computed
column is aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from nyc_taxi_data_ingestion_spark.operators.transform import apply_transformations
from nyc_taxi_data_ingestion_spark.sources.readers import read_table


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible, rows-only check
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: list[str] | None = None):
    def deco(fn):
        REGISTRY[name] = Query(fn=fn, oracle=oracle, tags=tags or [])
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Silver transform chain (P1 rename, P2 cast, P3 derive, P4 filter, W1 dedupe)
# Parity: bronze_to_silver.py:311-429 order rename→cast→derive→filter→dedupe.
# ---------------------------------------------------------------------------

_SILVER_ORACLE = """
SELECT * FROM (
  SELECT event_id,
         ts AS event_ts,
         user_id,
         event_type,
         value AS amount,
         props,
         CAST(year(ts) AS INT) AS event_year,
         CAST(month(ts) AS INT) AS event_month,
         CAST(hour(ts) AS INT) AS hour_of_day,
         CAST(value AS DECIMAL(10,2)) AS amount_dec
  FROM events
  WHERE value IS NOT NULL AND value > 0
)
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id, event_type
  ORDER BY event_ts DESC, event_id ASC
) = 1
"""


@register("silver_transform", _SILVER_ORACLE, tags=["P1", "P2", "P3", "P4", "W1"])
def q_silver_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Silver chain on `events` (rename→cast→derive→filter→dedupe)."""
    return apply_transformations(
        _t(spark, sf_dir, "events"),
        renames={"ts": "event_ts", "value": "amount"},
        casts={"user_id": "long", "event_id": "long"},
        derived={
            "event_year": "CAST(year(event_ts) AS INT)",
            "event_month": "CAST(month(event_ts) AS INT)",
            "hour_of_day": "CAST(hour(event_ts) AS INT)",
            "amount_dec": "CAST(amount AS DECIMAL(10,2))",
        },
        filters=["amount IS NOT NULL", "amount > 0"],
        dedupe_keys=["user_id", "event_type"],
        dedupe_order_by="event_ts DESC",
        dedupe_tie_breakers=["event_id"],
    )


# ---------------------------------------------------------------------------
# Gold aggregates (A1-A3 analogues on the synthetic star schema)
# Parity: build_gold_layer.py:62-184.
# ---------------------------------------------------------------------------

_DAILY_STATS_ORACLE = f"""
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(month(l_shipdate) AS INT) AS ship_month,
       l_returnflag,
       COUNT(*) AS total_rows,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_price,
       {davg_sql('l_extendedprice')} AS avg_price,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY 1, 2, 3
"""


@register("daily_stats", _DAILY_STATS_ORACLE, tags=["A1"])
def q_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — multi-measure GROUP BY (daily_trip_stats analogue).

    Scale: partial+final hash aggregate; one shuffle on the (year,
    month, flag) grain. Column pruning keeps the scan to 4 columns.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.year("l_shipdate").cast("int").alias("ship_year"),
            F.month("l_shipdate").cast("int").alias("ship_month"),
            "l_returnflag",
        )
        .agg(
            F.count("*").alias("total_rows"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            davg("l_extendedprice", "avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


_TOP_GROUPS_ORACLE = f"""
SELECT n.n_name,
       COUNT(*) AS order_cnt,
       {davg_sql('o.o_totalprice')} AS avg_totalprice
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY order_cnt DESC, n.n_name ASC
LIMIT 15
"""


@register("top_groups", _TOP_GROUPS_ORACLE, tags=["J2", "T2"])
def q_top_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/T2 — inner equi-join + group-agg + deterministic top-k.

    Scale: `nation` (25 rows) and `customer` (dim) are broadcast, so the
    only wide op is the final aggregation on 25 group keys; top-k plans
    as TakeOrderedAndProject (no global sort).
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            davg("o_totalprice", "avg_totalprice"),
        )
        .orderBy(F.desc("order_cnt"), F.asc("n_name"))
        .limit(15)
    )


_GLOBAL_AGG_ORACLE = f"""
SELECT COUNT(*) AS row_cnt,
       {dsum_sql('l_quantity')} AS sum_qty,
       {davg_sql('l_quantity')} AS avg_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
"""


@register("global_agg", _GLOBAL_AGG_ORACLE, tags=["A5"])
def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — global (no-key) aggregate, one row (reconciliation.py:180-191)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("row_cnt"),
        dsum("l_quantity", "sum_qty"),
        davg("l_quantity", "avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


_NULL_CHECK_ORACLE = """
SELECT COUNT(*) AS total_rows,
       COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS nulls_event_id,
       COUNT(CASE WHEN ts IS NULL THEN 1 END) AS nulls_ts,
       COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS nulls_user_id,
       COUNT(CASE WHEN event_type IS NULL THEN 1 END) AS nulls_event_type,
       COUNT(CASE WHEN value IS NULL THEN 1 END) AS nulls_value,
       COUNT(CASE WHEN props IS NULL THEN 1 END) AS nulls_props
FROM events
"""


@register("null_check", _NULL_CHECK_ORACLE, tags=["Q1"])
def q_null_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — per-column null counts in ONE pass (the reference runs one
    filter+count job per column — quality_checks.py:16-32; we fold all
    columns into a single aggregate, one scan at any scale)."""
    ev = _t(spark, sf_dir, "events")
    aggs = [F.count("*").alias("total_rows")]
    for c in ev.columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
    return ev.agg(*aggs)


_ANTI_JOIN_ORACLE = """
SELECT o_orderkey
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""


@register("anti_join", _ANTI_JOIN_ORACLE, tags=["J4", "U1", "Q12"])
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/U1 — key-integrity anti-join (reconciliation.py:268-297):
    orders whose key never appears in lineitem (non-empty in testdata).

    Scale: left_anti; only the key column of the probe side moves, and
    AQE can demote to broadcast when the build side's distinct keys fit.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select("o_orderkey")


_VALUE_COUNTS_ORACLE = """
SELECT event_type, COUNT(*) AS cnt
FROM events
GROUP BY event_type
"""


@register("value_counts", _VALUE_COUNTS_ORACLE, tags=["A8"])
def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — categorical frequency (anomaly_detection.py:222-234)."""
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("cnt"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
