"""Sink / maintenance tests (S8-S13, S15 analogue, M1)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.sources.sinks import (
    compact_parquet_dir,
    overwrite_partitions,
    write_partitioned,
)


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # fragment into 64 small files
    before = len(glob.glob(f"{path}/*.parquet"))
    total_before = spark.read.parquet(path).agg(F.sum("v")).first()[0]

    n = compact_parquet_dir(spark, path, target_file_bytes=10 * 1024 * 1024)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after < before and after <= n + 1
    assert spark.read.parquet(path).agg(F.sum("v")).first()[0] == total_before
    assert spark.read.parquet(path).count() == 10_000


def test_overwrite_partitions_touches_only_affected(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "c", 30)], "p int, k string, v int"
    )
    write_partitioned(base, path, ["p"])

    patch = spark.createDataFrame([(1, "z", 99)], "p int, k string, v int")
    overwrite_partitions(spark, patch, path, ["p"])

    got = {(r.p, r.k, r.v) for r in spark.read.parquet(path).collect()}
    # partition p=1 replaced wholesale; p=2 untouched
    assert got == {(1, "z", 99), (2, "c", 30)}


def test_merge_upsert_last_writer_wins(spark, tmp_path):
    from nyc_taxi_data_ingestion_spark.sources.sinks import merge_upsert

    path = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ver long"
    )
    merge_upsert(spark, path, base, keys=["k"], order_col="ver")

    upd = spark.createDataFrame(
        [(2, "B2", 20),   # newer version → replaces
         (3, "C0", 5),    # OLDER version → must NOT replace
         (4, "d", 10)],   # new key → inserted
        "k long, v string, ver long",
    )
    merge_upsert(spark, path, upd, keys=["k"], order_col="ver")
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("B2", 20), 3: ("c", 10), 4: ("d", 10)}

    # equal-version tie: the update wins (MERGE INTO WHEN MATCHED)
    tie = spark.createDataFrame([(1, "A_TIE", 10)], "k long, v string, ver long")
    merge_upsert(spark, path, tie, keys=["k"], order_col="ver")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[1] == "A_TIE"

    # idempotent re-run: applying the same updates changes nothing
    merge_upsert(spark, path, tie, keys=["k"], order_col="ver")
    assert spark.read.parquet(path).count() == 4
