"""Every registry query must match its DuckDB oracle exactly (the
driver's t2 correctness gate, run locally at sf0.01)."""

from __future__ import annotations

import pytest

from nyc_taxi_data_ingestion_spark.queries import REGISTRY
from tests.oracle import compare_query


# Lifecycle/iterative queries whose in-suite oracle compare runs >5 s
# each (durations run, r13): marked slow so the driver's budgeted
# default verify finishes. Coverage is not lost — the round driver's
# own CORRECTNESS gate and tools/driver_sim.py compare the SAME
# queries against the SAME oracle, and the full suite remains one
# `-m ""` away.
_SLOW_PARITY = {
    "pagerank_exact", "snapshot_manifest_shards",
    "snapshot_format_stream_chain", "snapshot_shard_skip",
    "snapshot_stream_tail", "synthetic_source_dedup",
    "stream_stream_join", "dedup_clusters", "snapshot_rewrite_debt",
    "snapshot_merge_mor", "fingerprint_collisions", "pagerank_parts",
    "transition_reachability", "snapshot_format_partitioned",
    "snapshot_update_mor", "snapshot_pruned_scan_2d",
    "snapshot_format_partitioned_write", "stream_late_data",
    "dsir_weights",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
        for n in sorted(REGISTRY)
    ],
)
def test_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_registry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())


def test_unverified_oracle_queries_fit_driver_budget():
    """The driver's correctness run evaluates a ~50-entry prefix of the
    registry, and _export_order front-loads oracle queries without a
    prior driver verdict. Verification opportunity is the scarce
    resource (r3 verdict item 5): registering more never-verified
    oracle queries than the budget means some ship without a driver
    verdict for a full round. Adding a query must come with a
    _PRIOR_GREEN refresh from the newest CORRECTNESS_r{N}.json."""
    from nyc_taxi_data_ingestion_spark.queries import (
        _PRIOR_GREEN,
        _REFRESH_FIRST,
        REGISTRY,
    )

    from nyc_taxi_data_ingestion_spark.queries import _export_order

    prior = set(_PRIOR_GREEN)
    unverified = [
        n for n, q in REGISTRY.items()
        if q.oracle is not None and n not in prior
    ]
    # the budget the prefix must cover = everything up to and including
    # the LAST never-verified query in the actual export order (r8
    # verdict item 1: counting tiers separately missed a stale-green
    # tier sorted between refreshes and unverified queries, starving
    # chunk_windows at position 51)
    order = _export_order()
    if unverified:
        spent = 1 + max(order.index(n) for n in unverified)
        assert spent <= 50, (
            f"the last never-verified oracle query sits at prefix "
            f"position {spent} > the ~50-entry driver budget: "
            f"{sorted(unverified)}"
        )
    # never-verified queries must outrank every non-refresh green: a
    # stale green re-check must not starve a first-time verdict
    first_green = next(
        i for i, n in enumerate(order)
        if n in prior and n not in set(_REFRESH_FIRST)
    )
    late = [n for n in unverified if order.index(n) > first_green]
    assert not late, f"never-verified queries sorted after greens: {late}"
    # green/refresh lists must reference real registry entries only
    assert prior <= set(REGISTRY), sorted(prior - set(REGISTRY))
    assert set(_REFRESH_FIRST) <= set(REGISTRY)


def test_doc_counts_match_registry():
    """README.md and SURVEY.md self-report the registry size; keep the
    prose in lockstep with len(queries())/len(oracle_sql()) so the
    counts can't silently drift (r6 verdict item 4)."""
    import re

    import __spark_entry__ as e

    n_q, n_o = len(e.queries()), len(e.oracle_sql())
    readme = open("README.md").read()
    survey = open("SURVEY.md").read()
    m = re.search(
        r"(\d+) named queries: (\d+) hash-checked.*?(\d+) rows-only",
        readme,
        re.S,
    )
    assert m, "README.md lost its registry-count sentence"
    assert tuple(int(g) for g in m.groups()) == (n_q, n_o, n_q - n_o), (
        f"README.md says {m.groups()}, registry is "
        f"({n_q}, {n_o}, {n_q - n_o})"
    )
    m = re.search(
        r"Registry:\s+(\d+)\s+driver\s+queries,\s+(\d+)\s+DuckDB", survey
    )
    assert m, "SURVEY.md lost its registry-count sentence"
    assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o), (
        f"SURVEY.md says {m.groups()}, registry is ({n_q}, {n_o})"
    )
