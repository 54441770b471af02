"""Local re-implementation of the driver's oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, schema shape, and
order-insensitive values (columns sorted by name, rows sorted by all
columns). Exact equality is the bar — the engine's determinism contract
(decimal-accumulated aggregates) makes that achievable.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from nyc_taxi_data_ingestion_spark.session import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_query(spark, sf_dir: str, name: str) -> None:
    """Assert Spark result == DuckDB oracle result for registry entry `name`."""
    from nyc_taxi_data_ingestion_spark.queries import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spd = sdf.toPandas()

    if q.oracle is None:
        assert len(spd) >= 0  # rows-only check
        return

    con = duck_connection(sf_dir)
    try:
        opd = con.execute(q.oracle).df()
    finally:
        con.close()

    assert len(spd) == len(opd), f"{name}: row count {len(spd)} vs oracle {len(opd)}"
    assert sorted(spd.columns) == sorted(opd.columns), (
        f"{name}: columns {sorted(spd.columns)} vs oracle {sorted(opd.columns)}"
    )

    a, b = _normalize(spd), _normalize(opd)
    mismatches = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # Dtype-kind gate: the driver's hasher distinguishes 60000 from
        # 60000.0, so an integer column on one side rendered as float on
        # the other (DuckDB HUGEINT -> float64 is the classic case —
        # r3's three hash-fails) must fail locally too. A float upcast
        # that merely encodes NULLs (NaN present) is pandas' nullable-int
        # representation on BOTH engines and is exempt.
        int_a = pd.api.types.is_integer_dtype(av)
        int_b = pd.api.types.is_integer_dtype(bv)
        if int_a != int_b:
            other = bv if int_a else av
            if not (pd.api.types.is_float_dtype(other) and other.isna().any()):
                mismatches.append(
                    f"col {c}: dtype-kind drift {av.dtype} vs oracle "
                    f"{bv.dtype} — integer SUMs in the oracle need "
                    f"CAST(... AS BIGINT) (DuckDB HUGEINT renders float64)"
                )
                continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            bad = ~(
                (av.isna() & bv.isna())
                | (av == bv)
            )
            if bad.any():
                i = bad.idxmax()
                diff = abs(float(av[i]) - float(bv[i]))
                rel = diff / max(abs(float(bv[i])), 1e-300)
                mismatches.append(
                    f"col {c}: {int(bad.sum())} diffs, first at row {i}: "
                    f"{av[i]!r} vs {bv[i]!r} (abs {diff:.3e}, rel {rel:.3e})"
                )
        else:
            eq = (av.astype(str).where(~av.isna(), "<NA>")) == (
                bv.astype(str).where(~bv.isna(), "<NA>")
            )
            if not eq.all():
                i = (~eq).idxmax()
                mismatches.append(
                    f"col {c}: {int((~eq).sum())} diffs, first at row {i}: "
                    f"{av[i]!r} vs {bv[i]!r}"
                )
    assert not mismatches, f"{name}: value mismatches:\n" + "\n".join(mismatches)
