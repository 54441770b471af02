"""Every registry query must match its DuckDB oracle exactly (the
driver's t2 correctness gate, run locally at sf0.01)."""

from __future__ import annotations

import pytest

from nyc_taxi_data_ingestion_spark.queries import REGISTRY
from tests.oracle import compare_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
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
