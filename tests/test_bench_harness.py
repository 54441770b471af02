"""Harness-logic tests for bench.py (no Spark session needed).

r12 verdict items 2 and 3: the fresh-process retry must never adopt a
SLOWER number for the inflated-vs-prior class, and non-canonical
configurations (core count / SF dir) must not clobber the canonical
in-repo BENCH_full artifact.
"""

import bench


class TestAdoptRetry:
    def test_inflated_slower_retry_keeps_sweep(self):
        # the r12 failure case: sweep-warm 4.5 s, retry 11.1 s — keep
        # the sweep number
        assert bench._adopt_retry(False, 4.5, 11.1) is False

    def test_inflated_faster_retry_adopted(self):
        assert bench._adopt_retry(False, 12.3, 2.3) is True

    def test_unstable_adopts_regardless_of_direction(self):
        assert bench._adopt_retry(True, 1.0, 3.0) is True
        assert bench._adopt_retry(True, 3.0, 1.0) is True

    def test_inflated_equal_keeps_sweep(self):
        assert bench._adopt_retry(False, 2.0, 2.0) is False


class TestArtifactSuffix:
    def test_canonical_config_unsuffixed(self):
        assert bench._artifact_suffix("32", "/root/testdata/sf0.1", 0.1) == ""

    def test_noncanonical_cpus_suffixed(self):
        assert (
            bench._artifact_suffix("8", "/root/testdata/sf0.1", 0.1) == "_c8"
        )

    def test_noncanonical_sf_dir_suffixed(self):
        assert (
            bench._artifact_suffix("32", "/root/testdata/sf0.01", 0.01)
            == "_sf0.01"
        )

    def test_both_noncanonical(self):
        assert (
            bench._artifact_suffix("8", "/root/testdata/sf0.01", 0.01)
            == "_c8_sf0.01"
        )

    def test_trailing_slash_is_canonical(self):
        assert (
            bench._artifact_suffix("32", "/root/testdata/sf0.1/", 0.1) == ""
        )
