"""Maintenance cycle: partition expiry, orphan cleanup, orchestrator
(reference ``scripts/iceberg_maintenance.py:97-216``)."""

from __future__ import annotations

import os
import time
from datetime import date

from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.sources.maintenance import (
    expire_partitions,
    remove_orphan_files,
    run_maintenance,
)


def _write_day_partitioned(spark, path: str, days: list[str]) -> None:
    df = spark.createDataFrame(
        [(d, i) for d in days for i in range(5)], "partition_day string, v int"
    )
    df.write.mode("overwrite").partitionBy("partition_day").parquet(path)


def test_expire_partitions_drops_only_old_days(spark, tmp_path):
    path = str(tmp_path / "errors")
    _write_day_partitioned(spark, path, ["2026-01-01", "2026-08-10", "2026-08-13"])
    removed = expire_partitions(
        path, "partition_day", retention_days=7, today=date(2026, 8, 13)
    )
    assert removed == ["partition_day=2026-01-01"]
    remaining = spark.read.parquet(path)
    days = {
        str(r[0])
        for r in remaining.select("partition_day").distinct().collect()
    }
    assert days == {"2026-08-10", "2026-08-13"}


def test_expire_partitions_retains_newest_even_if_old(spark, tmp_path):
    # retain_last=1 semantics: a stale table never loses its final state
    path = str(tmp_path / "stale")
    _write_day_partitioned(spark, path, ["2025-01-01", "2025-01-02"])
    removed = expire_partitions(
        path, "partition_day", retention_days=7, today=date(2026, 8, 13)
    )
    assert removed == ["partition_day=2025-01-01"]
    assert spark.read.parquet(path).count() == 5


def test_expire_partitions_ignores_non_date_values(spark, tmp_path):
    path = str(tmp_path / "layers")
    df = spark.createDataFrame([("silver", 1), ("gold", 2)], "layer string, v int")
    df.write.mode("overwrite").partitionBy("layer").parquet(path)
    assert expire_partitions(path, "layer", 0, today=date(2026, 8, 13)) == []
    assert spark.read.parquet(path).count() == 2


def test_remove_orphans_age_guarded(spark, tmp_path):
    path = str(tmp_path / "ds")
    spark.range(10).write.parquet(path)
    old_tmp = path + "__compact_tmp"
    fresh_stage = os.path.join(path, "_temporary")
    os.makedirs(old_tmp)
    os.makedirs(fresh_stage)
    stale = time.time() - 100 * 3600
    os.utime(old_tmp, (stale, stale))
    removed = remove_orphan_files(path, retention_hours=72)
    assert removed == [old_tmp]
    assert not os.path.exists(old_tmp)
    # a fresh staging dir (in-progress write) must survive
    assert os.path.exists(fresh_stage)
    assert spark.read.parquet(path).count() == 10


def test_run_maintenance_cycle_and_fault_isolation(spark, tmp_path):
    good = str(tmp_path / "events")
    _write_day_partitioned(spark, good, ["2026-08-12", "2026-08-13"])
    report = run_maintenance(
        spark,
        [
            {"path": good, "partition_by": ["partition_day"],
             "expire_on": "partition_day"},
            {"path": str(tmp_path / "absent")},
        ],
        retention_days=365_000,  # nothing old enough to expire
    )
    assert report[0]["compacted_to_files"] >= 1
    assert report[0]["expired_partitions"] == []
    assert report[0]["removed_orphans"] == []
    assert report[1]["skipped"] == "missing"
    out = spark.read.parquet(good)
    assert out.count() == 10
    assert out.filter(F.col("partition_day") == "2026-08-13").count() == 5


def test_skipping_report_measures_clustering(spark, sf_dir, tmp_path):
    """The footer-stats audit must show what clustering buys: a range
    predicate prunes most files of a write_clustered layout and ~none
    of a hash-shuffled one; prunability never overstates (prunable
    files contain zero matching rows)."""
    from nyc_taxi_data_ingestion_spark.sources.maintenance import (
        skipping_report,
        skipping_summary,
    )
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table
    from nyc_taxi_data_ingestion_spark.sources.sinks import write_clustered

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    lo, hi = 30.0, 31.0  # narrow l_quantity band

    rnd = str(tmp_path / "random")
    li.repartition(8).write.parquet(rnd)
    clu = str(tmp_path / "clustered")
    write_clustered(li, clu, sort_cols=["l_quantity"], target_files=8)

    s_rnd = skipping_summary(skipping_report(spark, rnd, "l_quantity", lo, hi))
    s_clu = skipping_summary(skipping_report(spark, clu, "l_quantity", lo, hi))
    assert s_rnd["rows"] == s_clu["rows"] == li.count()
    # hash-shuffled: every file spans the full quantity range
    assert s_rnd["prunable_row_groups"] == 0
    # clustered: the band lives in ~1 of 8 range slices
    assert s_clu["prunable_row_group_fraction"] >= 0.5
    # soundness: pruning must never drop matching rows — matching rows
    # all live in non-prunable files
    import pyspark.sql.functions as F

    matching = li.filter(F.col("l_quantity").between(lo, hi)).count()
    readable = (
        skipping_report(spark, clu, "l_quantity", lo, hi)
        .filter("prunable_row_groups < row_groups")
        .select("file")
        .collect()
    )
    kept = spark.read.parquet(*[r.file for r in readable]).filter(
        F.col("l_quantity").between(lo, hi)
    )
    assert kept.count() == matching


def test_skipping_report_conservative_on_missing_column(spark, tmp_path):
    from nyc_taxi_data_ingestion_spark.sources.maintenance import (
        skipping_report,
        skipping_summary,
    )

    p = str(tmp_path / "t")
    spark.range(100).write.parquet(p)
    s = skipping_summary(skipping_report(spark, p, "no_such_col", 0, 1))
    assert s["prunable_row_groups"] == 0 and s["rows"] == 100


def test_run_maintenance_rewrites_delete_debt(spark, tmp_path):
    """The maintenance cycle compacts merge-on-read debt for versioned
    tables by default: with vectors present the rewrite commits and
    zeroes the debt; a debt-free table commits NOTHING (the cycle can
    never rotate identical history through the retention window)."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.sources.maintenance import (
        run_maintenance,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        current_version,
        delete_debt,
        snapshot_delete_mor,
        snapshot_write,
    )

    path = str(tmp_path / "t")
    snapshot_write(
        spark.range(0, 20).select(F.col("id").alias("k")), path
    )
    snapshot_delete_mor(spark, path, F.col("k") < 3)
    assert delete_debt(path)["delete_files"] > 0

    (row,) = run_maintenance(
        spark,
        [{"path": path, "snapshot_keep_last": 5}],
    )
    assert row["delete_debt_rewrite"]["rewritten_files"] >= 1
    assert delete_debt(path)["delete_files"] == 0
    head = current_version(path)

    # second cycle: no debt -> no commit, no report entry
    (row2,) = run_maintenance(
        spark, [{"path": path, "snapshot_keep_last": 5}]
    )
    assert "delete_debt_rewrite" not in row2
    assert current_version(path) == head


def test_run_maintenance_compacts_manifest_shards(spark, tmp_path, monkeypatch):
    """The maintenance cycle compacts a versioned table's manifest
    shards once the descriptor list outgrows the threshold — metadata
    maintenance in the same loop as data compaction, committing
    nothing below the threshold."""
    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.sources.maintenance import (
        run_maintenance,
    )

    monkeypatch.setattr(S, "_SHARD_INLINE_MAX", 2)
    path = str(tmp_path / "t")
    for i in range(6):
        S.snapshot_write(
            spark.range(i * 10, i * 10 + 10).repartition(2),
            path,
            mode="append" if i else "overwrite",
        )
    head = S.current_version(path)
    n_before = len(S._load_manifest(path, head).get("shards") or [])
    assert n_before > 3
    rows = run_maintenance(
        spark,
        [{
            "path": path,
            "snapshot_keep_last": 10,
            "rewrite_delete_debt": False,
            "rewrite_manifests_over": 3,
        }],
        remove_orphans=False,
    )
    rep = rows[0]["manifests_rewritten"]
    assert rep["shards_after"] <= 3 < rep["shards_before"]
    got = sorted(r.id for r in S.read_snapshot(spark, path).collect())
    assert got == list(range(60))
    # below the threshold: the next cycle commits nothing
    head2 = S.current_version(path)
    rows2 = run_maintenance(
        spark,
        [{
            "path": path,
            "snapshot_keep_last": 10,
            "rewrite_delete_debt": False,
            "rewrite_manifests_over": 3,
        }],
        remove_orphans=False,
    )
    assert "manifests_rewritten" not in rows2[0]
    assert S.current_version(path) == head2
