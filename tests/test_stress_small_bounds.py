"""Forced-small-bound stress sweep over the whole registry.

Scale-only code paths hide crashes: the multi-round branch of
``exact_quantiles`` rank selection only executes when a value range
exceeds its per-task row bound, every Arrow-batched UDF only sees its
multi-batch path when a partition splits, and shuffle-partition edge
cases (empty partitions, one-row partitions) only appear when the
partition count exceeds the row count of small groups. At the test
scale those paths never run under production bounds — the r4 review
caught a crash (None-bound range sort) that ONLY fires in the
multi-round regime. This sweep runs EVERY registry query at sf0.001
with all such bounds forced tiny, so the scale paths execute and any
crash surfaces in CI rather than at 100 TB:

- ``spark.sql.files.maxPartitionBytes`` = 64 KiB → every parquet scan
  splits into many input partitions (empty/tiny task regime);
- ``spark.sql.shuffle.partitions`` = 7 → odd, small, exercises empty
  post-shuffle partitions and AQE coalescing;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` = 16 → every
  pandas UDF / mapInPandas stage sees MANY batches per partition (the
  accumulate-across-batches logic actually runs);
- ``exact_quantiles`` monkeypatched to ``max_task_rows=64,
  n_buckets=4`` → iterative rank selection is forced through 3-5
  refinement rounds instead of resolving in one.

Crash sweep, not an oracle sweep: the oracle-parity suite
(test_oracle_parity) already proves values; this proves the SCALE
paths don't throw and still return a well-formed frame.
"""

from __future__ import annotations

import functools
import os

import pytest

from nyc_taxi_data_ingestion_spark.functions import numeric as _numeric
from nyc_taxi_data_ingestion_spark.queries import REGISTRY

from conftest import SF_DIR  # tests/ is rootdir-relative, not a package

# the sf0.001 sibling of the configured test SF dir — honors the same
# SPARK_GRAFT_TEST_SF_DIR override every other test goes through
_SMALL_SF_DIR = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")

_TINY_CONFS = {
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "16",
}


@pytest.fixture()
def tiny_bounds(spark, monkeypatch):
    """Shrink every scale bound, restore on exit. Runtime SQL confs are
    per-session mutable, so the shared session fixture is reused."""
    saved = {}
    for k, v in _TINY_CONFS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    orig = _numeric.exact_quantiles
    monkeypatch.setattr(
        _numeric,
        "exact_quantiles",
        functools.partial(orig, max_task_rows=64, n_buckets=4, max_rounds=12),
    )
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


# slow: the whole-registry sweep is ~4-5 min of the suite; it guards
# scale-only code paths, not per-change correctness, so it runs in the
# full (-m "") suite and in CI-style manual runs, not in the driver's
# budgeted default verify (r13 — VERIFY_r12 timed out at ~66%).
@pytest.mark.slow
@pytest.mark.stress
@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_query_survives_tiny_bounds(name, tiny_bounds):
    df = REGISTRY[name].fn(tiny_bounds, _SMALL_SF_DIR)
    # a well-formed result: schema resolves and the full plan executes
    assert df.columns
    assert df.count() >= 0
