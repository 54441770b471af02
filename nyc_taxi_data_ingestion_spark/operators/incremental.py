"""Algebraic incremental view maintenance: aggregation marts as
MERGEABLE PARTIAL STATE.

The M1 path (``plans/compiler.py`` merge-incremental) refreshes marts
by rewriting partition-scoped ROWS. This module is the other classic
refresh strategy: keep the mart as commutative-monoid state
(count / decimal-exact sum / min / max per key) and fold each new
batch in with a state-sized merge — the nightly 100 TB pattern where
re-aggregating history is unaffordable but yesterday's state + today's
partial agg is a key-count-sized job. AVG is derived at read time from
(sum, count), the standard decomposition; the state keeps SUM in
decimal so merge order can never perturb a float accumulation
(the repo-wide exactness contract).

merge(partial(A), partial(B)) == partial(A ∪ B) exactly — the
registered query proves it cross-engine by rebuilding a mart from a
90/10 split and oracle-checking against the full-table aggregation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_ACC = "decimal(30,4)"


def partial_agg_state(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-key mergeable state: (keys…, n, s, mn, mx) with ``s``
    accumulated in exact decimal. One partial-agg shuffle on the mart
    grain — the same shuffle a full rebuild would do, over only the
    batch."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v.cast(_STATE_ACC)).alias("s"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def merge_agg_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold partial states: counts and decimal sums add, min/max
    compare — key-count-sized work, no raw-data scan. Output schema
    equals :func:`partial_agg_state`'s, so merging is associative and
    repeatable across runs (state tables persist as plain parquet)."""
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("s").cast(_STATE_ACC).alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize_agg_state(
    state: DataFrame, keys: list[str], prefix: str
) -> DataFrame:
    """Read-time mart view over the state: exact-decimal totals cast
    to double, AVG derived from (s, n) — the dsum/davg contract."""
    return state.select(
        *keys,
        F.col("n").alias(f"n_{prefix}"),
        F.col("s").cast("double").alias(f"total_{prefix}"),
        (F.col("s").cast("double") / F.col("n")).alias(f"avg_{prefix}"),
        F.col("mn").cast("double").alias(f"min_{prefix}"),
        F.col("mx").cast("double").alias(f"max_{prefix}"),
    )


def changelog_agg_delta(
    changelog: DataFrame,
    keys: list[str],
    value_col: str,
    change_type_col: str = "_change_type",
) -> DataFrame:
    """A commit changelog (``snapshots.snapshot_changelog`` — Delta CDF
    row schema) reduced to a RETRACTABLE per-key aggregation delta:
    insert/update_postimage rows weigh +1, delete/update_preimage
    weigh −1, so ``(Σw, Σw·value)`` is exactly the (n, s) adjustment
    that turns the pre-commit mart state into the post-commit one.
    COUNT and decimal SUM form a group (subtraction exists), which is
    why a mart maintained from a changelog carries (n, s [, avg]) —
    MIN/MAX are only monoids (no retraction) and need the
    partition-rewrite path or a full recompute when a commit removes
    their extremes. Delta volume bounds the work: an update commit
    touching 0.01% of keys folds in a 0.01%-sized job."""
    w = (
        F.when(
            F.col(change_type_col).isin("insert", "update_postimage"),
            F.lit(1),
        )
        .when(
            F.col(change_type_col).isin("delete", "update_preimage"),
            F.lit(-1),
        )
        .otherwise(F.lit(None))
    )
    v = F.col(value_col)
    return changelog.select(
        *keys, w.alias("__w"), v.alias("__v")
    ).groupBy(*keys).agg(
        F.sum(F.when(F.col("__v").isNotNull(), F.col("__w"))).alias("n"),
        F.sum(F.col("__w") * F.col("__v").cast(_STATE_ACC)).cast(
            _STATE_ACC
        ).alias("s"),
    )


def apply_agg_delta(
    state: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold an aggregation delta into (n, s) mart state: counts and
    exact-decimal sums ADD (negative deltas retract); keys whose count
    reaches zero leave the mart — key-count-sized work, no raw-data
    scan. The (n, s)-projected twin of :func:`merge_agg_states` for
    changelog-maintained marts."""
    u = state.select(*keys, "n", "s").unionByName(
        delta.select(*keys, "n", "s")
    )
    return (
        u.groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").cast(_STATE_ACC).alias("s"),
        )
        .where(F.col("n") > 0)
    )
