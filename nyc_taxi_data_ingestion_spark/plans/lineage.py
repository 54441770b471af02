"""Lineage tracking (SURVEY §2.10 L1-L4).

Parity with ``src/data_quality/lineage.py``: record
ingestion/transformation/aggregation events with row deltas (L1),
extract column-level lineage from the declarative config (L2 — renames
→ RENAME edges, derived-expression token heuristic → DERIVE edges),
table-level upstream/downstream + transitive impact via BFS over the
event log (L3), and an event-log query (L4).

The event log is a plain Spark DataFrame (appendable to parquet via
``sources.sinks.append_table``); graph traversal is driver-side over
collected events — the event log is metadata-sized (one row per job
step), never data-sized, so collecting it is correct at any scale.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 16-col event schema, parity with lineage.py:170-191 (JSON-string
# payload columns included).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("pipeline", T.StringType(), True),
        T.StructField("layer", T.StringType(), True),
        T.StructField("source_table", T.StringType(), True),
        T.StructField("target_table", T.StringType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("row_delta", T.LongType(), True),
        T.StructField("columns_json", T.StringType(), True),
        T.StructField("transforms_json", T.StringType(), True),
        T.StructField("event_time", T.TimestampType(), True),
    ]
)


@dataclass
class LineageTracker:
    """L1 — driver-side event recorder. Events are dicts until
    ``to_df``/``persist`` turns them into a Spark DataFrame."""

    pipeline: str
    events: list[dict] = field(default_factory=list)

    def record(
        self,
        event_type: str,
        layer: str | None = None,
        source_table: str | None = None,
        target_table: str | None = None,
        rows_in: int | None = None,
        rows_out: int | None = None,
        columns: list[str] | None = None,
        transforms: dict | None = None,
    ) -> dict:
        evt = {
            "event_id": str(uuid.uuid4()),
            "event_type": event_type,
            "pipeline": self.pipeline,
            "layer": layer,
            "source_table": source_table,
            "target_table": target_table,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "row_delta": (rows_out - rows_in)
            if rows_in is not None and rows_out is not None
            else None,
            "columns_json": json.dumps(columns) if columns is not None else None,
            "transforms_json": json.dumps(transforms) if transforms is not None else None,
        }
        self.events.append(evt)
        return evt

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            {**e, "event_time": None} for e in self.events
        ]
        df = spark.createDataFrame(rows, EVENT_SCHEMA)
        return df.withColumn("event_time", F.current_timestamp())

    def persist(self, spark: SparkSession, path: str) -> None:
        """S13 — append sink for the event table."""
        self.to_df(spark).write.mode("append").parquet(path)


# -- L2: column lineage from config ------------------------------------------

_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

_SQL_KEYWORDS = {
    "cast", "as", "int", "integer", "long", "bigint", "double", "float",
    "string", "boolean", "decimal", "date", "timestamp", "year", "month",
    "day", "hour", "minute", "second", "dayofweek", "when", "then", "else",
    "end", "case", "and", "or", "not", "null", "is", "in", "between",
    "coalesce", "round", "abs", "unix_timestamp", "current_timestamp",
    "true", "false", "if", "concat", "substr", "substring", "trim",
}


def column_lineage(cfg: dict) -> list[dict]:
    """Edges {source_column, target_column, edge_type} from a validated
    pipeline config — RENAME from silver.renames, DERIVE from the
    identifier tokens of silver.derived expressions (same heuristic as
    ``lineage.py:455-495``), CAST from silver.casts."""
    edges: list[dict] = []
    silver = cfg.get("silver", {})
    renamed = silver.get("renames", {})
    for old, new in renamed.items():
        edges.append({"source_column": old, "target_column": new, "edge_type": "RENAME"})
    for col in silver.get("casts", {}):
        edges.append({"source_column": col, "target_column": col, "edge_type": "CAST"})
    for name, expr in silver.get("derived", {}).items():
        for tok in _TOKEN_RE.findall(expr):
            if tok.lower() in _SQL_KEYWORDS or tok == name:
                continue
            edges.append(
                {"source_column": tok, "target_column": name, "edge_type": "DERIVE"}
            )
    # dedupe, stable order
    seen, out = set(), []
    for e in edges:
        key = (e["source_column"], e["target_column"], e["edge_type"])
        if key not in seen:
            seen.add(key)
            out.append(e)
    return out


# -- L3: table graph + impact analysis ---------------------------------------


def _graph(events: list[dict]) -> dict[str, set[str]]:
    g: dict[str, set[str]] = {}
    for e in events:
        s, t = e.get("source_table"), e.get("target_table")
        if s and t:
            g.setdefault(s, set()).add(t)
    return g


def downstream_impact(events: list[dict], table: str) -> list[str]:
    """Transitive downstream closure (BFS — ``lineage.py:376-435``)."""
    g = _graph(events)
    seen: list[str] = []
    frontier = [table]
    visited = {table}
    while frontier:
        nxt = []
        for node in frontier:
            for child in sorted(g.get(node, ())):
                if child not in visited:
                    visited.add(child)
                    seen.append(child)
                    nxt.append(child)
        frontier = nxt
    return seen


def upstream_sources(events: list[dict], table: str) -> list[str]:
    """Transitive upstream closure."""
    rev: dict[str, set[str]] = {}
    for e in events:
        s, t = e.get("source_table"), e.get("target_table")
        if s and t:
            rev.setdefault(t, set()).add(s)
    seen: list[str] = []
    frontier = [table]
    visited = {table}
    while frontier:
        nxt = []
        for node in frontier:
            for parent in sorted(rev.get(node, ())):
                if parent not in visited:
                    visited.add(parent)
                    seen.append(parent)
                    nxt.append(parent)
        frontier = nxt
    return seen


# -- L4: event-log query ------------------------------------------------------


def query_events(events_df: DataFrame, table: str, limit: int = 100) -> DataFrame:
    """L4 — events touching ``table`` (source or target), newest first
    with a deterministic tie-breaker (``lineage.py:498-551``)."""
    return (
        events_df.filter(
            (F.col("source_table") == table) | (F.col("target_table") == table)
        )
        .orderBy(F.desc("event_time"), F.asc("event_id"))
        .limit(limit)
    )
