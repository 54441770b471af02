"""Property-based tests (hypothesis) for the algorithmic operators —
randomized adversaries the fixed oracle fixtures can't provide."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nyc_taxi_data_ingestion_spark.llm.curation import rate_to_hex_threshold


# -- pure-python properties: cheap, run many examples ------------------------


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_rate_threshold_bounds(rate):
    # regression: rates within an ulp of 1.0 used to round to a 9-hex
    # threshold that string-compares BELOW most md5 prefixes
    t = rate_to_hex_threshold(rate)
    v = max(0, round(rate * 16**8))
    if v >= 16**8:
        assert t == "g"
    else:
        assert len(t) == 8 and int(t, 16) == v


@given(
    st.floats(min_value=0.0, max_value=0.999, allow_nan=False),
    st.floats(min_value=0.0, max_value=0.999, allow_nan=False),
)
def test_rate_threshold_monotone(a, b):
    # a higher sampling rate must never produce a lower threshold —
    # monotonicity is what makes per-stratum rates composable
    lo, hi = sorted((a, b))
    assert rate_to_hex_threshold(lo) <= rate_to_hex_threshold(hi)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


# -- distributed properties: few examples, real Spark jobs -------------------


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with sequential union-find on
    arbitrary random graphs (chains, cliques, self-merging stars)."""
    from nyc_taxi_data_ingestion_spark.llm.dedup import connected_components

    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r.node: r.label for r in connected_components(df, max_iterations=50).collect()}
    want = _union_find_components(edges)
    assert got == want


def test_simhash_lane_width_invariance(spark, sf_dir):
    """lane_bits=32 (the >65k-token-doc configuration) must produce
    identical signatures to the default 16-bit lanes."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.llm.dedup import simhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    a = simhash_signatures(docs, lane_bits=16)
    b = (
        simhash_signatures(docs, lane_bits=32)
        .withColumnsRenamed({"__sh": "__sh32"})
    )
    diffs = a.join(b, "__id").filter(F.col("__sh") != F.col("__sh32")).count()
    assert diffs == 0
