"""Custom Python DataSource (Spark 4 API): partition planning,
determinism across parallelism, planted-duplicate ground truth."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
    register_synthetic_corpus,
)


def _load(spark, **opts):
    register_synthetic_corpus(spark)
    r = spark.read.format("synthetic_corpus")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _content_hash(df) -> int:
    # bit_xor is order-independent and cannot overflow
    return df.agg(
        F.expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))")
    ).collect()[0][0]


def test_partition_planning_and_row_count(spark):
    df = _load(spark, rows=1000, numPartitions=7)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 1000
    assert df.select(F.countDistinct("doc_id")).collect()[0][0] == 1000
    # schema is the declared one
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]


def test_content_deterministic_across_parallelism(spark):
    """Byte-identical corpus whatever the partition count — content is
    a pure function of (seed, doc_id), never of the slice layout."""
    a = _content_hash(_load(spark, rows=500, numPartitions=2, seed=7))
    b = _content_hash(_load(spark, rows=500, numPartitions=13, seed=7))
    assert a == b
    # a different seed is a different corpus
    c = _content_hash(_load(spark, rows=500, numPartitions=2, seed=8))
    assert a != c


def test_planted_duplicates_exact_count(spark):
    """dupRate plants a known number of exact copies — the dedup
    operators' ground truth."""
    rows, rate = 1000, 0.1
    df = _load(spark, rows=rows, numPartitions=5, dupRate=rate)
    extra = (
        df.groupBy("text")
        .count()
        .where(F.col("count") > 1)
        .agg(F.sum(F.col("count") - 1))
        .collect()[0][0]
    )
    # every planted copy collides with exactly its predecessor doc,
    # so surplus rows == planted count == floor((rows-1)/dup_every)
    assert extra == (rows - 1) // int(1 / rate)
    # and the engine's own exact dedup recovers the unique set
    from nyc_taxi_data_ingestion_spark.llm.dedup import exact_dedup

    assert exact_dedup(df).count() == df.count() - extra


@pytest.mark.slow
def test_snapshot_stream_tails_appends_exactly_once(spark, tmp_path):
    """Streaming FROM a versioned table (the Delta table-as-stream read
    path): offsets are snapshot versions, so across restarts each
    append commit's rows land exactly once; a rewrite between runs
    fails the stream instead of silently double-reading."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        snapshot_compact,
        snapshot_write,
    )

    register_snapshot_stream(spark)
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    snapshot_write(
        spark.range(0, 100).withColumn("v", F.col("id") * 2),
        path,
        mode="append",
    )

    def run_once():
        q = (
            spark.readStream.format("snapshot_stream")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 100
    # second append lands exactly once on restart from the checkpoint
    snapshot_write(
        spark.range(100, 250).withColumn("v", F.col("id") * 2),
        path,
        mode="append",
    )
    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 250
    assert got.select("id").distinct().count() == 250
    assert got.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(250))
    # no new commits: an idle run adds nothing
    run_once()
    assert spark.read.parquet(sink).count() == 250
    # a rewrite breaks incremental soundness and must FAIL the stream
    snapshot_compact(spark, path, target_partitions=1)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(StreamingQueryException, match="not append"):
        run_once()


def test_snapshot_stream_carries_partition_values(spark, tmp_path):
    """Partitioned tables stream with their directory-encoded partition
    column reconstructed per row (r8 — streaming them was previously
    rejected outright)."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import snapshot_write
    from nyc_taxi_data_ingestion_spark.streaming.ingest import (
        run_available_now,
    )

    register_snapshot_stream(spark)
    path = str(tmp_path / "t")
    snapshot_write(
        spark.range(0, 10).withColumn("p", F.col("id") % 2),
        path,
        mode="append",
        partition_by=["p"],
    )
    got = run_available_now(
        spark.readStream.format("snapshot_stream")
        .option("path", path)
        .load(),
        "snap_stream_part_values",
    )
    assert {(r.id, r.p) for r in got.collect()} == {
        (i, i % 2) for i in range(10)
    }


def test_snapshot_batch_format_time_travel_and_pushdown(spark, tmp_path):
    """spark.read.format('snapshot'): manifest-planned batch reads with
    time travel options, and pushFilters pruning files against the
    manifest bounds (unit-asserted on the reader: Spark's own filter
    evaluation still runs, so pruning can only drop proven-empty
    files)."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
        snapshot_write,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    base = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    v1 = snapshot_write(
        base.repartitionByRange(4, "id"), path, stats_cols=["id"]
    )
    snapshot_write(
        spark.range(5000, 5100).withColumn("v", F.lit(0)),
        path,
        mode="append",
    )

    head = spark.read.format("snapshot").option("path", path).load()
    assert head.count() == 1100
    old = (
        spark.read.format("snapshot")
        .option("path", path)
        .option("version", v1)
        .load()
    )
    assert old.count() == 1000

    # end-to-end: filtered read returns exact rows
    got = sorted(
        r.id for r in head.filter(F.col("id").between(0, 10)).collect()
    )
    assert got == list(range(0, 11))

    # unit: pushFilters prunes proven-empty files from the plan
    from pyspark.sql.datasource import GreaterThan, LessThanOrEqual

    m = _load_manifest(path, current_version(path))
    r_all = SnapshotBatchReader(path, m)
    total = len(r_all.partitions())
    r_rng = SnapshotBatchReader(path, m)
    unhandled = r_rng.pushFilters(
        [GreaterThan(("id",), 0), LessThanOrEqual(("id",), 10)]
    )
    assert list(unhandled)  # everything returned for Spark to re-check
    kept = len(r_rng.partitions())
    assert kept < total and kept >= 1


@pytest.mark.slow
def test_snapshot_format_schema_union_across_evolved_appends(spark, tmp_path):
    """Schema is the PERMISSIVE UNION across commits: appends that add
    a column or losslessly widen a type must read back whole — the
    oldest-commit anchoring previously dropped new columns silently
    and crashed on widened ints (both measured). Applies to the batch
    format and the stream source alike."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import snapshot_write

    register_snapshot_format(spark)
    register_snapshot_stream(spark)
    path = str(tmp_path / "t")
    snapshot_write(
        spark.range(0, 10).select(
            F.col("id"), F.col("id").cast("int").alias("v")
        ),
        path,
        mode="append",
    )
    snapshot_write(
        spark.range(10, 20).select(
            F.col("id"),
            (F.lit(2**40) + F.col("id")).alias("v"),  # widened to long
            F.lit("fresh").alias("w"),  # new column
        ),
        path,
        mode="append",
    )
    df = spark.read.format("snapshot").option("path", path).load()
    assert set(df.columns) == {"id", "v", "w"}
    assert dict(df.dtypes)["v"] == "bigint"
    rows = {r.id: (r.v, r.w) for r in df.collect()}
    assert rows[0] == (0, None)  # old rows: widened v, null new column
    assert rows[15] == (2**40 + 15, "fresh")

    # the stream source derives the same union schema
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("snapshot_stream")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "v", "w"}
    assert got.count() == 20
    assert got.filter("w = 'fresh'").count() == 10


@pytest.mark.slow
def test_snapshot_stream_bootstraps_over_rewritten_history(spark, tmp_path):
    """A stream starting fresh on a table whose HISTORY contains
    rewrites (or partitioned versions) must bootstrap from the head
    state — only the head's files are read, so only they matter."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        snapshot_compact,
        snapshot_write,
    )

    register_snapshot_stream(spark)
    path = str(tmp_path / "t")
    # history: partitioned v1, appended v2, compacting REWRITE v3
    snapshot_write(
        spark.range(0, 50).withColumn("p", F.col("id") % 2),
        path,
        mode="append",
        partition_by=["p"],
    )
    snapshot_write(
        spark.range(50, 80).withColumn("p", F.lit(0)), path, mode="append",
        partition_by=[],
    )
    snapshot_compact(spark, path, target_partitions=2, partition_by=[])
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("snapshot_stream")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 80  # full head state, history rewrites ignored
    # incremental continuation still works after bootstrap
    snapshot_write(
        spark.range(80, 90).withColumn("p", F.lit(0)), path, mode="append",
        partition_by=[],
    )
    q = (
        spark.readStream.format("snapshot_stream")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 90


@pytest.mark.slow
def test_snapshot_format_write_roundtrip_and_stats(spark, tmp_path):
    """The write half of the format API (r8): executor tasks stage
    Arrow batches as parquet under a fresh commit dir; the driver-side
    commit lands the manifest through snapshots.commit_staged_files —
    append/overwrite versioning, statsCols option enabling manifest
    bounds, empty tasks contributing no file."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        current_version,
        list_snapshots,
        read_snapshot,
        scan_prune_stats,
        stats_coverage,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    base = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    (
        base.repartitionByRange(4, "id")
        .write.format("snapshot")
        .mode("append")
        .option("path", path)
        .option("statsCols", "id")
        .save()
    )
    assert current_version(path) == 1
    got = read_snapshot(spark, path)
    assert got.count() == 100 and set(got.columns) == {"id", "v"}
    cov = stats_coverage(path)
    assert cov["stats_cols"] == ["id"]
    assert cov["fully_covered_files"] == cov["total_files"] >= 4

    # append inherits the stats property; format read sees the union
    (
        spark.range(100, 150).withColumn("v", F.col("id") * 2)
        .coalesce(1)
        .write.format("snapshot")
        .mode("append")
        .option("path", path)
        .save()
    )
    assert current_version(path) == 2
    via_format = spark.read.format("snapshot").option("path", path).load()
    assert via_format.count() == 150
    st = scan_prune_stats(path, "id", lower=100)
    assert st["pruned_files"] >= 4  # v1's range files all proven empty

    # overwrite replaces the file set as a NEW version; history stays
    (
        spark.range(0, 7).withColumn("v", F.lit(0).cast("long"))
        .coalesce(1)
        .write.format("snapshot")
        .mode("overwrite")
        .option("path", path)
        .save()
    )
    assert current_version(path) == 3
    assert read_snapshot(spark, path).count() == 7
    assert read_snapshot(spark, path, version=2).count() == 150
    assert [s["version"] for s in list_snapshots(path)] == [1, 2, 3]

    # empty frame: a version with zero files, not a crash
    (
        base.filter("id < 0")
        .write.format("snapshot")
        .mode("append")
        .option("path", path)
        .save()
    )
    assert current_version(path) == 4
    assert read_snapshot(spark, path).count() == 7


@pytest.mark.slow
def test_snapshot_format_stream_write_exactly_once(spark, tmp_path):
    """The stream-write half of the format API (r8): snapshot table A
    streamed through the snapshot_stream source into table B via
    writeStream.format('snapshot') under AvailableNow — a versioned
    medallion chain through format APIs alone. Each micro-batch is one
    append commit carrying the stream_state high-water mark; a
    REPLAYED batch id is skipped with its staged files dropped
    (manifest dedup over checkpointed at-least-once = exactly-once)."""
    import os
    import time

    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamWriter,
        _SnapshotCommitMessage,
        register_snapshot_format,
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        current_version,
        read_snapshot,
        snapshot_write,
        stream_state,
    )

    register_snapshot_format(spark)
    register_snapshot_stream(spark)
    src = str(tmp_path / "a")
    dst = str(tmp_path / "b")
    for lo, hi in [(0, 40), (40, 70), (70, 100)]:
        snapshot_write(
            spark.range(lo, hi).withColumn("v", F.col("id") * 3),
            src,
            mode="append",
        )
    q = (
        spark.readStream.format("snapshot_stream")
        .option("path", src)
        .load()
        .writeStream.format("snapshot")
        .option("path", dst)
        .option("sourceId", "test_chain")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert sorted(r.id for r in read_snapshot(spark, dst).collect()) == list(
        range(100)
    )
    marks = stream_state(dst)
    assert marks.get("test_chain", -1) >= 0

    # replay unit: committing an ALREADY-APPLIED batch id must skip —
    # version unchanged, staged file dropped, no duplicate rows
    w = SnapshotStreamWriter(dst, {"sourceid": "test_chain"})
    os.makedirs(os.path.join(dst, "_staging"), exist_ok=True)
    stale = "part-replay.parquet"
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": [999], "v": [0]}),
        os.path.join(dst, "_staging", stale),
    )
    head = current_version(dst)
    w.commit(
        [_SnapshotCommitMessage(files=[stale], rows=1)],
        marks["test_chain"],  # an already-applied batch id
    )
    assert current_version(dst) == head  # no new version
    assert read_snapshot(spark, dst).filter("id = 999").count() == 0
    time.sleep(0)  # staged file was consumed (moved then dropped)
    assert not os.path.exists(os.path.join(dst, "_staging", stale))


@pytest.mark.slow
def test_snapshot_format_reads_partitioned_tables(spark, tmp_path):
    """Partitioned (Hive-layout) tables now read through BOTH format
    sources (r8 — previously rejected): partition columns are
    reconstructed from the directory-encoded values (typed by
    whole-version inference, NULL sentinel honored), pushFilters
    prunes on a partition value as an exact [v, v] bound, and the
    stream source tails partitioned appends whole."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        read_snapshot,
        snapshot_write,
    )
    from nyc_taxi_data_ingestion_spark.streaming.ingest import (
        run_available_now,
    )

    register_snapshot_format(spark)
    register_snapshot_stream(spark)
    path = str(tmp_path / "t")
    df = spark.range(0, 300).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("bucket"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 4).cast("string")))
        .alias("grp"),
    )
    snapshot_write(df, path, partition_by=["bucket", "grp"])

    got = spark.read.format("snapshot").option("path", path).load()
    assert set(got.columns) == {"id", "bucket", "grp"}
    # typed inference: bucket int, grp string; NULLs round-trip
    assert dict(got.dtypes)["bucket"] == "int"
    assert dict(got.dtypes)["grp"] == "string"
    want = {(r.id, r.bucket, r.grp) for r in read_snapshot(spark, path).collect()}
    assert {(r.id, r.bucket, r.grp) for r in got.collect()} == want
    assert got.filter("grp IS NULL").count() == 60

    # partition pruning through pushFilters: a bucket predicate must
    # cut the planned file set (unit-level, same style as the stats
    # pruning test)
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
        _table_arrow_schema,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
    )
    from pyspark.sql.datasource import EqualTo

    m = _load_manifest(path, current_version(path))
    schema = _table_arrow_schema(path, m)
    r_all = SnapshotBatchReader(path, m, schema)
    total = len([p for p in r_all.partitions() if p.file_abs])
    r_eq = SnapshotBatchReader(path, m, schema)
    r_eq.pushFilters([EqualTo(("bucket",), 1)])
    kept = len([p for p in r_eq.partitions() if p.file_abs])
    assert 0 < kept < total
    # end-to-end filtered read stays exact
    assert (
        spark.read.format("snapshot").option("path", path).load()
        .filter("bucket = 1").count()
        == 100
    )

    # stream source tails the partitioned table whole
    streamed = run_available_now(
        spark.readStream.format("snapshot_stream")
        .option("path", path)
        .load()
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n")),
        "snap_stream_partitioned",
        output_mode="complete",
    )
    assert {(r.bucket, r.n) for r in streamed.collect()} == {
        (0, 100), (1, 100), (2, 100)
    }


@pytest.mark.slow
def test_snapshot_stream_starting_version_and_rate_limit(spark, tmp_path):
    """Delta-parity stream-source options (r8; r9 made startingVersion
    INCLUSIVE, Delta's actual contract — the named version's own
    commit is consumed) and maxVersionsPerTrigger bounds each
    micro-batch's commit window — chained into a snapshot sink, the
    union of rows proves nothing was lost or duplicated by the
    gating."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        current_version,
        read_snapshot,
        snapshot_write,
    )

    register_snapshot_format(spark)
    register_snapshot_stream(spark)
    src = str(tmp_path / "a")
    for lo, hi in [(0, 10), (10, 25), (25, 45), (45, 70), (70, 100)]:
        snapshot_write(spark.range(lo, hi), src, mode="append")
    assert current_version(src) == 5

    # startingVersion=3, INCLUSIVE (Delta): commits 3, 4, 5 (ids 25..99)
    dst1 = str(tmp_path / "b1")
    q = (
        spark.readStream.format("snapshot_stream")
        .option("path", src)
        .option("startingVersion", 3)
        .load()
        .writeStream.format("snapshot")
        .option("path", dst1)
        .option("sourceId", "sv_test")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert sorted(r.id for r in read_snapshot(spark, dst1).collect()) == list(
        range(25, 100)
    )

    # maxVersionsPerTrigger: the gate binds from the SECOND window of
    # a run (the python DS API has no admission-control hook and Spark
    # resolves availability before the reader learns the checkpoint
    # cursor — observed: latestOffset precedes initialOffset even on a
    # fresh stream), so it is the steady-state bound for tables whose
    # commits arrive faster than triggers. Unit-driven for
    # determinism: drive the reader's offset protocol directly.
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamReader,
    )

    r = SnapshotStreamReader(
        src, None, starting_version=0, max_versions_per_trigger=2
    )
    first = r.latestOffset()
    assert first == {"version": 5}  # first window of the run: ungated
    parts = r.partitions({"version": 0}, first)
    assert len(parts) > 0
    # five more commits land; subsequent windows advance <= 2 versions
    for lo, hi in [(100, 110), (110, 120), (120, 130), (130, 140),
                   (140, 150)]:
        snapshot_write(spark.range(lo, hi), src, mode="append")
    nxt = r.latestOffset()
    assert nxt == {"version": 7}  # gated: 5 + 2
    r.partitions(first, nxt)
    assert r.latestOffset() == {"version": 9}
    r.partitions({"version": 7}, {"version": 9})
    assert r.latestOffset() == {"version": 10}  # clamped at head
    # the gate never walks an offset backwards past a checkpointed
    # cursor it has seen
    r2 = SnapshotStreamReader(
        src, None, starting_version=0, max_versions_per_trigger=2
    )
    r2.partitions({"version": 8}, {"version": 9})  # restart mid-history
    assert r2.latestOffset() == {"version": 10}


@pytest.mark.slow
def test_snapshot_format_applies_mor_delete_vectors(spark, tmp_path):
    """Both format sources must apply positional delete vectors: the
    batch read at head hides deleted rows (while a pinned pre-delete
    version read still shows them), pushdown pruning coexists with the
    vectors, and a fresh stream's bootstrap batch applies them too."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        snapshot_delete_mor,
        snapshot_write,
    )

    register_snapshot_format(spark)
    register_snapshot_stream(spark)
    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("grp")
    )
    v1 = snapshot_write(
        df.repartitionByRange(4, "id").sortWithinPartitions("id"),
        path,
        stats_cols=["id"],
    )
    snapshot_delete_mor(spark, path, F.col("id") % 2 == 0)

    head = spark.read.format("snapshot").option("path", path).load()
    assert sorted(r.id for r in head.collect()) == list(range(1, 100, 2))
    pinned = (
        spark.read.format("snapshot")
        .option("path", path)
        .option("version", v1)
        .load()
    )
    assert pinned.count() == 100  # time travel resurrects
    filtered = head.where(F.col("id") <= 20)
    assert sorted(r.id for r in filtered.collect()) == list(range(1, 21, 2))

    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("snapshot_stream")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(1, 100, 2))


def test_register_snapshot_format_preserves_preconfigured_conf(spark):
    """r9 (verdict r8 item 4): registering the format must be a silent
    no-op on a session whose pushdown conf is already true, and must
    warn (not silently mutate) when it has to flip the session-global
    conf for a vanilla session."""
    import warnings

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )

    conf = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "true")
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any warning -> failure
            register_snapshot_format(spark)
        assert spark.conf.get(conf) == "true"

        spark.conf.set(conf, "false")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            register_snapshot_format(spark)
        assert any("session-global" in str(w.message) for w in caught)
        assert spark.conf.get(conf) == "true"  # set, loudly
    finally:
        spark.conf.set(conf, prev)


def test_snapshot_format_infers_date_partitions(spark, tmp_path):
    """r9 (advice): an ISO-date-partitioned table must read its
    partition column as DateType through the format source — the same
    schema snapshots.read_snapshot exposes — with calendar-invalid or
    mixed values still falling back to string."""
    import datetime

    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        read_snapshot,
        snapshot_write,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02")],
        "id long, d string",
    ).withColumn("d", F.to_date("d"))
    snapshot_write(df, path, partition_by=["d"])
    fmt = spark.read.format("snapshot").option("path", path).load()
    assert dict(fmt.dtypes)["d"] == "date"
    eng = read_snapshot(spark, path)
    assert dict(eng.dtypes)["d"] == "date"
    got = sorted((r.id, r.d) for r in fmt.collect())
    assert got == [
        (1, datetime.date(2024, 1, 1)),
        (2, datetime.date(2024, 1, 2)),
        (3, datetime.date(2024, 1, 2)),
    ]
    # date-valued pushdown prunes on the [v, v] partition bounds
    sel = fmt.where(F.col("d") == F.lit(datetime.date(2024, 1, 1)))
    assert [r.id for r in sel.collect()] == [1]
    # calendar-invalid dir value: column stays string (never corrupts)
    path2 = str(tmp_path / "t2")
    snapshot_write(
        spark.createDataFrame(
            [(1, "2024-02-30"), (2, "2024-01-01")], "id long, d string"
        ),
        path2,
        partition_by=["d"],
    )
    fmt2 = spark.read.format("snapshot").option("path", path2).load()
    assert dict(fmt2.dtypes)["d"] == "string"


def test_snapshot_format_writer_sweeps_dead_attempt_files(spark, tmp_path):
    """r9 (advice): a failed/speculative task attempt's parquet in the
    commit dir is swept at commit time — once the manifest lands the
    dir is referenced forever, so an unlisted file would otherwise
    leak permanently."""
    import glob
    import os

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        _SnapshotCommitMessage,
        SnapshotBatchWriter,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        read_snapshot,
    )

    path = str(tmp_path / "t")
    os.makedirs(path)
    w = SnapshotBatchWriter(path, overwrite=False, options={})
    commit_abs = os.path.join(path, w._commit_rel)
    os.makedirs(commit_abs)
    # a real task file plus a dead attempt's file
    spark.range(0, 5).toPandas().to_parquet(
        os.path.join(commit_abs, "part-live.parquet")
    )
    spark.range(90, 95).toPandas().to_parquet(
        os.path.join(commit_abs, "part-deadattempt.parquet")
    )
    w.commit([_SnapshotCommitMessage(files=["part-live.parquet"], rows=5)])
    left = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(commit_abs, "*.parquet"))
    )
    assert left == ["part-live.parquet"]
    assert sorted(r.id for r in read_snapshot(spark, path).collect()) == [
        0, 1, 2, 3, 4
    ]


def test_snapshot_format_partitioned_write_roundtrip(spark, tmp_path):
    """r9: partitionBy through the format WRITER — tasks split their
    batch stream across Hive value-directories (partition columns
    stripped from file content, NULLs as the Hive sentinel), and the
    result reads back identically through the format source AND
    snapshots.read_snapshot, with partition-value pushdown pruning."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
        read_snapshot,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 9, None)
        .otherwise(F.col("id") % 3)
        .alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    (
        df.repartition(2, "p")
        .write.format("snapshot")
        .mode("append")
        .option("path", path)
        .option("partitionBy", "p")
        .save()
    )
    m = _load_manifest(path, current_version(path))
    assert m["partition_by"] == ["p"]
    files = [f for fs in m["commits"].values() for f in fs]
    assert all("p=" in f for f in files)
    assert any("__HIVE_DEFAULT_PARTITION__" in f for f in files)
    # partition column lives in the PATH, not the file
    import os

    import pyarrow.parquet as pq

    some = os.path.join(path, next(iter(m["commits"])), files[0])
    assert "p" not in pq.ParquetFile(some).schema_arrow.names

    want = sorted((r.id, r.p, r.v) for r in df.collect())
    fmt = spark.read.format("snapshot").option("path", path).load()
    assert sorted((r.id, r.p, r.v) for r in fmt.collect()) == want
    eng = read_snapshot(spark, path)
    assert sorted((r.id, r.p, r.v) for r in eng.collect()) == want
    # value pushdown prunes sibling partitions
    sel = fmt.where(F.col("p") == 1)
    assert sorted(r.id for r in sel.collect()) == sorted(
        i for i in range(100) if i % 10 != 9 and i % 3 == 1
    )


def test_format_append_inherits_partition_spec(spark, tmp_path):
    """r9 review: a plain format append (no partitionBy option) must
    INHERIT a partitioned table's recorded spec, never silently reset
    it to [] — a later compact() defaults to the manifest spec and
    would otherwise rewrite the table unpartitioned. The stream writer
    rejects the option loudly instead of silently writing flat."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamWriter,
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
        snapshot_write,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    snapshot_write(
        spark.range(0, 10).withColumn("p", F.col("id") % 2),
        path,
        partition_by=["p"],
    )
    (
        spark.range(10, 15)
        .withColumn("p", F.lit(0))
        .write.format("snapshot")
        .mode("append")
        .option("path", path)
        .save()
    )
    m = _load_manifest(path, current_version(path))
    assert m["partition_by"] == ["p"]  # inherited, not reset
    # engine-side append with partition_by=None inherits too; explicit
    # [] resets
    snapshot_write(
        spark.range(15, 20).withColumn("p", F.lit(1)), path, mode="append"
    )
    assert _load_manifest(path, current_version(path))["partition_by"] == [
        "p"
    ]
    snapshot_write(
        spark.range(20, 25).withColumn("p", F.lit(1)),
        path,
        mode="append",
        partition_by=[],
    )
    assert (
        _load_manifest(path, current_version(path))["partition_by"] == []
    )
    with _pytest.raises(ValueError, match="STREAM writer"):
        SnapshotStreamWriter(path, {"partitionby": "p"})


@pytest.mark.slow
def test_snapshot_format_applies_schema_evolution(spark, tmp_path):
    """Metadata-only rename/drop (snapshots.snapshot_rename_column /
    snapshot_drop_column) through BOTH format sources: the published
    schema is the logical one, old files' batches are re-mapped before
    conforming (the conform step would otherwise silently NULL a
    renamed column's values), pushFilters keeps pruning on bounds
    recorded under the old physical name, and the stream bootstrap
    applies the log. A later re-add of a dropped name reads NULL for
    pre-drop rows — the two lineages never alias."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
        register_snapshot_format,
        register_snapshot_stream,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
        read_snapshot,
        snapshot_drop_column,
        snapshot_rename_column,
        snapshot_write,
    )

    register_snapshot_format(spark)
    register_snapshot_stream(spark)
    path = str(tmp_path / "t")
    lo = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") * 1.0).alias("amount"),
        F.lit("old").alias("note"),
    ).coalesce(1)
    hi = spark.range(1000, 1100).select(
        F.col("id"),
        (F.col("id") * 1.0).alias("amount"),
        F.lit("old").alias("note"),
    ).coalesce(1)
    snapshot_write(lo, path, stats_cols=["amount"])
    snapshot_write(hi, path, mode="append")
    snapshot_rename_column(path, "amount", "price")
    snapshot_drop_column(path, "note")
    snapshot_write(
        spark.range(2000, 2010).select(
            F.col("id"),
            (F.col("id") * 1.0).alias("price"),
            F.lit("fresh").alias("note"),
        ).coalesce(1),
        path,
        mode="append",
    )

    head = spark.read.format("snapshot").option("path", path).load()
    assert sorted(head.columns) == ["id", "note", "price"]
    # renamed values survive (not NULLed by the conform step)
    assert head.where(F.col("price").isNotNull()).count() == 210
    # dropped-then-readded: only the fresh lineage carries values
    assert head.where(F.col("note") == "fresh").count() == 10
    assert head.where(F.col("note").isNull()).count() == 200

    # engine/format parity, row for row
    eng = read_snapshot(spark, path)
    cols = sorted(head.columns)
    assert sorted(map(tuple, head.select(*cols).collect())) == sorted(
        map(tuple, eng.select(*cols).collect())
    )

    # pushFilters prunes via bounds recorded under the OLD name
    from pyspark.sql.datasource import GreaterThanOrEqual

    m = _load_manifest(path, current_version(path))
    r_all = SnapshotBatchReader(path, m)
    total = len([p for p in r_all.partitions() if p.file_abs])
    r_rng = SnapshotBatchReader(path, m)
    r_rng.pushFilters([GreaterThanOrEqual(("price",), 500.0)])
    kept = len([p for p in r_rng.partitions() if p.file_abs])
    assert kept < total  # the low-range pre-rename file proven empty

    # stream bootstrap applies the log too
    sdf = spark.readStream.format("snapshot_stream").option("path", path).load()
    q = (
        sdf.writeStream.format("memory")
        .queryName("se_fmt_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("select * from se_fmt_stream").select(*cols).collect())
    )
    assert got == sorted(map(tuple, eng.select(*cols).collect()))


def test_format_drop_of_only_payload_column_keeps_partitioned_rows(
    spark, tmp_path
):
    """Dropping a partitioned table's ONLY in-file column must not lose
    rows through the format source: the Arrow replay uses select()
    (which preserves num_rows at zero columns) so the path-derived
    partition column still describes every pre-drop row — parity with
    the engine read, row for row."""
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        read_snapshot,
        snapshot_drop_column,
        snapshot_write,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    snapshot_write(
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "part string, x int"
        ),
        path,
        partition_by=["part"],
    )
    snapshot_drop_column(path, "x")
    eng = read_snapshot(spark, path)
    fmt = spark.read.format("snapshot").option("path", path).load()
    assert sorted(eng.columns) == sorted(fmt.columns) == ["part"]
    assert sorted(r.part for r in fmt.collect()) == sorted(
        r.part for r in eng.collect()
    ) == ["a", "a", "b"]


def test_stream_bootstrap_refuses_schema_evolved_after_definition(
    spark, tmp_path
):
    """A stream whose schema was pinned BEFORE a rename/drop must
    refuse its bootstrap instead of silently NULLing the renamed
    column through the conform step; a stream defined AFTER the
    evolution (including over a re-added name) bootstraps fine."""
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamReader,
        _table_arrow_schema,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
        snapshot_drop_column,
        snapshot_rename_column,
        snapshot_write,
    )

    path = str(tmp_path / "t")
    snapshot_write(
        spark.createDataFrame(
            [(1, 10.0, "n")], "id int, amount double, note string"
        ),
        path,
    )
    stale_schema = _table_arrow_schema(
        path, _load_manifest(path, current_version(path))
    )
    snapshot_rename_column(path, "amount", "price")
    head = current_version(path)

    stale = SnapshotStreamReader(path, arrow_schema=stale_schema)
    with pytest.raises(ValueError, match="schema.*evolved"):
        stale.partitions({"version": 0}, {"version": head})

    # fresh definition sees the logical schema and bootstraps
    fresh_schema = _table_arrow_schema(path, _load_manifest(path, head))
    fresh = SnapshotStreamReader(path, arrow_schema=fresh_schema)
    assert fresh.partitions({"version": 0}, {"version": head})

    # drop + re-add: the re-added name is logical again — not stale
    snapshot_drop_column(path, "note")
    snapshot_write(
        spark.createDataFrame(
            [(2, 20.0, "fresh")], "id int, price double, note string"
        ),
        path,
        mode="append",
    )
    head2 = current_version(path)
    readd_schema = _table_arrow_schema(path, _load_manifest(path, head2))
    readd = SnapshotStreamReader(path, arrow_schema=readd_schema)
    assert readd.partitions({"version": 0}, {"version": head2})


def test_format_null_filters_and_null_partition_pruning(spark, tmp_path):
    """Pushed IsNull/IsNotNull prune through recorded null counts, and
    partition values act as null evidence too: a NULL partition dir is
    all-NULL by construction (range and IS NOT NULL prove it out, IS
    NULL keeps exactly it), a valued dir has zero nulls (IS NULL
    proves it out). End-to-end rows stay exact — pruning only shrinks
    plans."""
    import pyspark.sql.functions as F
    from pyspark.sql.datasource import GreaterThanOrEqual, IsNotNull, IsNull

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
        snapshot_write,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "id int, x double"
    ).coalesce(1)
    valued = spark.createDataFrame(
        [(3, 3.0), (4, 4.0)], "id int, x double"
    ).coalesce(1)
    snapshot_write(allnull, path, stats_cols=["x"])
    snapshot_write(valued, path, mode="append")
    m = _load_manifest(path, current_version(path))

    def kept(filters):
        r = SnapshotBatchReader(path, m)
        r.pushFilters(filters)
        return len([p for p in r.partitions() if p.file_abs])

    total = kept([])
    assert kept([IsNotNull(("x",))]) < total  # all-null file out
    assert kept([IsNull(("x",))]) < total  # fully-valued file out
    assert kept([GreaterThanOrEqual(("x",), 0.0)]) < total  # via nulls

    # end-to-end exactness through the format API
    fmt = spark.read.format("snapshot").option("path", path).load()
    assert sorted(r.id for r in fmt.where(F.col("x").isNotNull()).collect()) == [3, 4]
    assert sorted(r.id for r in fmt.where(F.col("x").isNull()).collect()) == [1, 2]

    # NULL partition dir: all-NULL by construction
    p2 = str(tmp_path / "t2")
    snapshot_write(
        spark.createDataFrame(
            [("a", 1), (None, 2), ("b", 3)], "part string, v int"
        ),
        p2,
        partition_by=["part"],
    )
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        _table_arrow_schema,
    )

    m2 = _load_manifest(p2, current_version(p2))
    schema2 = _table_arrow_schema(p2, m2)

    def kept2(filters):
        r = SnapshotBatchReader(p2, m2, arrow_schema=schema2)
        r.pushFilters(filters)
        return len([p for p in r.partitions() if p.file_abs])

    total2 = kept2([])
    assert kept2([IsNotNull(("part",))]) == total2 - 1  # null dir out
    assert kept2([IsNull(("part",))]) == 1  # only the null dir
    assert kept2([GreaterThanOrEqual(("part",), "a")]) == total2 - 1

    fmt2 = spark.read.format("snapshot").option("path", p2).load()
    assert sorted(
        r.v for r in fmt2.where(F.col("part").isNull()).collect()
    ) == [2]


def test_pushdown_prunes_on_in_equalnullsafe_and_prefix(spark, tmp_path):
    """The r9 pushdown completions: In prunes via its value-set hull,
    EqualNullSafe as equality (or IS NULL for a null literal), and
    StringStartsWith as the [prefix, prefix+1) range — all conservative
    (hull gaps and codepoint ceilings only keep extra files)."""
    from pyspark.sql.datasource import (
        EqualNullSafe,
        In,
        StringStartsWith,
    )

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
        snapshot_write,
    )

    path = str(tmp_path / "t")
    lo = spark.createDataFrame(
        [(i, f"a{i:03d}") for i in range(5)], "id int, tag string"
    ).coalesce(1)
    hi = spark.createDataFrame(
        [(i, f"z{i:03d}") for i in range(100, 105)], "id int, tag string"
    ).coalesce(1)
    snapshot_write(lo, path, stats_cols=["id", "tag"])
    snapshot_write(hi, path, mode="append")
    m = _load_manifest(path, current_version(path))

    def kept(filters):
        r = SnapshotBatchReader(path, m)
        r.pushFilters(filters)
        return len([p for p in r.partitions() if p.file_abs])

    total = kept([])
    assert kept([In(("id",), (101, 103))]) < total  # low file out
    assert kept([EqualNullSafe(("id",), 2)]) < total  # high file out
    assert kept([StringStartsWith(("tag",), "a")]) < total  # high file out
    assert kept([StringStartsWith(("tag",), "z")]) < total  # low file out
    # null literal through EqualNullSafe behaves as IS NULL: both
    # files are fully valued, so both prove out (the empty-scan
    # sentinel partition carries no file)
    assert kept([EqualNullSafe(("tag",), None)]) == 0


def test_format_and_scan_resolve_tags(spark, tmp_path):
    """Tag refs resolve through every read path: the format source
    (.option('tag', name)), the programmatic scan (tag=...), and the
    engine read — all pinned to the tagged version even after
    overwrites, with version/tag mutual exclusion enforced."""
    import pyspark.sql.functions as F

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        scan_snapshot,
        snapshot_tag,
        snapshot_write,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    snapshot_write(
        spark.range(0, 10).select(F.col("id").alias("k")), path,
        stats_cols=["k"],
    )
    snapshot_tag(path, "pin")
    snapshot_write(
        spark.range(100, 103).select(F.col("id").alias("k")), path,
        mode="overwrite",
    )

    fmt = (
        spark.read.format("snapshot")
        .option("path", path)
        .option("tag", "pin")
        .load()
    )
    assert sorted(r.k for r in fmt.collect()) == list(range(10))
    got = scan_snapshot(spark, path, "k", lower=5, tag="pin")
    assert sorted(r.k for r in got.collect()) == list(range(5, 10))

    with pytest.raises(Exception, match="not both"):
        spark.read.format("snapshot").option("path", path).option(
            "tag", "pin"
        ).option("version", "1").load().collect()
    with pytest.raises(ValueError, match="at most one"):
        scan_snapshot(spark, path, "k", lower=0, version=1, tag="pin")


def test_nan_literals_never_derive_prune_hulls(spark, tmp_path):
    """r9 advice (high): Spark evaluates NaN = NaN as TRUE, so
    `col IN (1.0, NaN)` matches NaN rows — but min()/max() over the
    literal set drop the NaN, and a float file holding [2.0, NaN]
    records lo=2.0 with NO upper bound (exactly the side NaN handling
    voids), so the [1.0, 1.0] hull wrongly proved it empty. Every
    bound-deriving filter branch now skips when a NaN literal is
    present; this pins the end-to-end shape that silently lost data."""
    import math

    from pyspark.sql.datasource import EqualNullSafe, EqualTo, In, LessThan

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        _load_manifest,
        current_version,
        snapshot_write,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    # one file [1.0], one file [2.0, NaN] (arrow-cpp writer: the NaN
    # file records lo=2.0 and a voided upper bound)
    snapshot_write(
        spark.createDataFrame([(1, 1.0)], "id int, x double").coalesce(1),
        path,
        stats_cols=["x"],
    )
    snapshot_write(
        spark.createDataFrame(
            [(2, 2.0), (3, float("nan"))], "id int, x double"
        ).coalesce(1),
        path,
        mode="append",
    )
    m = _load_manifest(path, current_version(path))
    nan = float("nan")

    def kept(filters):
        r = SnapshotBatchReader(path, m)
        r.pushFilters(filters)
        return len([p for p in r.partitions() if p.file_abs])

    total = kept([])
    # a NaN literal voids the hull: nothing may be pruned
    assert kept([In(("x",), (1.0, nan))]) == total
    assert kept([EqualTo(("x",), nan)]) == total
    assert kept([EqualNullSafe(("x",), nan)]) == total
    # x < NaN matches every real value: no sound prune either
    assert kept([LessThan(("x",), nan)]) == total
    # NaN-free hulls still prune (the [2.0, NaN] file's lo=2.0 > 1.0)
    assert kept([In(("x",), (0.5, 1.0))]) < total

    # end-to-end: the format read with IN (1.0, NaN) returns the NaN
    # row — the exact query that silently lost it before the fix
    fmt = spark.read.format("snapshot").option("path", path).load()
    got = fmt.where(F.col("x").isin(1.0, nan)).collect()
    assert sorted(r.id for r in got) == [1, 3]
    assert any(math.isnan(r.x) for r in got)


def test_stream_restart_rate_limit_binds_from_persisted_cursor(
    spark, tmp_path
):
    """r9 verdict item 4 (ADVICE 5 residual): with .option('streamId'),
    commit() persists each completed batch's end version table-side,
    so a RESTARTED run's very first latestOffset re-arms
    maxVersionsPerTrigger from the last completed batch — a
    10-version backlog drains in 5 two-version windows instead of one
    giant first batch. The hint is advisory admission state:
    exactly-once falls out of windows being planned from manifests,
    proven by unioning every window's rows."""
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamReader,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        snapshot_write,
    )

    src = str(tmp_path / "a")
    snapshot_write(spark.range(0, 10), src)

    # run 1: one batch completes and commits its cursor hint
    r1 = SnapshotStreamReader(
        src, None, max_versions_per_trigger=2, stream_id="job-7"
    )
    end1 = r1.latestOffset()
    assert end1 == {"version": 1}
    r1.partitions({"version": 0}, end1)
    r1.commit(end1)

    # the stream is DOWN while a 10-version backlog accumulates
    for i in range(10):
        snapshot_write(
            spark.range(10 * (i + 1), 10 * (i + 2)), src, mode="append"
        )

    # run 2 (fresh reader = restart): the FIRST window is already
    # gated from the persisted cursor — 5 windows of 2 drain the
    # backlog, every row exactly once
    r2 = SnapshotStreamReader(
        src, None, max_versions_per_trigger=2, stream_id="job-7"
    )
    cursor, windows, seen = 1, 0, []
    while True:
        end = r2.latestOffset()["version"]
        if end <= cursor:
            break
        assert end - cursor <= 2, (
            f"window ({cursor}, {end}] exceeds maxVersionsPerTrigger"
        )
        parts = r2.partitions({"version": cursor}, {"version": end})
        for p in parts:
            import pyarrow.parquet as pq

            seen.extend(
                pq.read_table(p.file_abs)["id"].to_pylist()
            )
        r2.commit({"version": end})
        cursor = end
        windows += 1
    assert windows == 5
    assert sorted(seen) == list(range(10, 110))

    # an equal-edge window is a legitimate empty batch; partitions()
    # folds the true cursor in and the gate re-binds from it
    r3 = SnapshotStreamReader(
        src, None, max_versions_per_trigger=2, stream_id="job-7"
    )
    r3.partitions({"version": 11}, {"version": 11})
    assert r3.latestOffset() == {"version": 11}

    # hint writes are MONOTONIC: a replayed/out-of-order commit can
    # never move the persisted cursor backwards
    r2.commit({"version": 3})
    r5 = SnapshotStreamReader(
        src, None, max_versions_per_trigger=2, stream_id="job-7"
    )
    assert r5.latestOffset() == {"version": 11}  # still 9+2, not 3+2

    # an INVERTED window (end below the checkpointed start — only a
    # corrupted/foreign hint can produce it) fails LOUDLY instead of
    # silently letting Spark commit a regressed offset and replay the
    # gap, and the offending hint is removed so the next restart
    # re-arms clean
    import json as _json
    import os as _os

    r6 = SnapshotStreamReader(
        src, None, max_versions_per_trigger=2, stream_id="job-7"
    )
    hp = r6._cursor_hint_path()
    with open(hp, "w") as f:
        _json.dump({"last_end": 2}, f)  # fell far behind the cursor
    assert r6.latestOffset() == {"version": 4}  # gated from the bad hint
    with pytest.raises(ValueError, match="inverted"):
        r6.partitions({"version": 11}, {"version": 4})
    assert not _os.path.exists(hp)  # self-healed for the next restart

    # distinct stream ids never share a hint file, however similar
    ra = SnapshotStreamReader(src, None, stream_id="job/a")
    rb = SnapshotStreamReader(src, None, stream_id="job:a")
    assert ra._cursor_hint_path() != rb._cursor_hint_path()

    # without a streamId the first window stays ungated (documented)
    r4 = SnapshotStreamReader(src, None, max_versions_per_trigger=2)
    assert r4.latestOffset() == {"version": 11}


def test_stream_gate_ratchet_unsticks_stale_hint(spark, tmp_path):
    """ADVICE r10 (high): a persisted hint landing the gated end
    exactly AT the checkpoint cursor made latestOffset return the
    committed offset every trigger — Spark plans no batch, so
    partitions() never runs to re-bind the cursor, and the stream
    silently stalls forever while the head advances. The gate now
    RATCHETS its in-memory edge each trigger, so a stale hint walks
    forward K versions per trigger until batches resume; and
    partitions() persists the hint on every PLANNED window (not just
    commit()), so a crash between Spark's offset-WAL write and
    commit() leaves the hint at most one in-flight batch behind."""
    import json as _json
    import os as _os

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamReader,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        snapshot_write,
    )

    src = str(tmp_path / "a")
    snapshot_write(spark.range(0, 10), src)
    for i in range(10):
        snapshot_write(
            spark.range(10 * (i + 1), 10 * (i + 2)), src, mode="append"
        )
    # head = 11. Steady-state drain crashed between Spark's batch
    # commit (checkpoint cursor = 6) and the hint write (hint = 4,
    # exactly one K=2 batch behind) — the stall scenario.
    r = SnapshotStreamReader(
        src, None, max_versions_per_trigger=2, stream_id="stall-1"
    )
    hp = r._cursor_hint_path()
    _os.makedirs(_os.path.dirname(hp), exist_ok=True)
    with open(hp, "w") as f:
        _json.dump({"last_end": 4}, f)
    # trigger 1: end == committed offset → Spark plans NO batch and
    # partitions() is never called. Pre-fix this repeated forever.
    assert r.latestOffset() == {"version": 6}
    # trigger 2: the ratchet advanced the edge; batches resume
    assert r.latestOffset() == {"version": 8}
    assert r.partitions({"version": 6}, {"version": 8})
    # planned-window persistence: hint is current BEFORE commit()
    with open(hp) as f:
        assert _json.load(f)["last_end"] == 8
    # drains to head in K-sized windows from here
    assert r.latestOffset() == {"version": 10}
    assert r.partitions({"version": 8}, {"version": 10})
    assert r.latestOffset() == {"version": 11}

    # a restart right now (commit() never ran) re-arms from the
    # planned-window hint — no inverted window, no stall
    r2 = SnapshotStreamReader(
        src, None, max_versions_per_trigger=2, stream_id="stall-1"
    )
    assert r2.latestOffset() == {"version": 11}  # 10 ratcheted to 11
    assert r2.partitions({"version": 10}, {"version": 11})


def test_stream_tails_branch_and_survives_publish(spark, tmp_path):
    """r10 verdict item 7: .option('branch', …) on the STREAM source —
    a staging pipeline tails its own WAP branch: it sees staged
    commits and never main's interleaved ones (branch state is
    fork-frozen), and it SURVIVES the branch's appends_only publish
    (the lineage falls back to main across the fast-forward with an
    empty diff — no re-sync, no replay)."""
    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamReader,
    )
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        snapshot_write,
    )

    def ids(reader, sv, ev):
        out = []
        for p in reader.partitions({"version": sv}, {"version": ev}):
            for b in reader.read(p):
                out.extend(b["id"].to_pylist())
        return sorted(out)

    path = str(tmp_path / "t")
    snapshot_write(spark.range(0, 5), path)  # v1 main
    # phase A — isolation: branch + interleaved MAIN commit
    S.snapshot_branch(path, "iso")
    snapshot_write(spark.range(10, 15), path, mode="append",
                   branch="iso")  # v2 staged
    snapshot_write(spark.range(100, 105), path, mode="append")  # v3 MAIN
    snapshot_write(spark.range(20, 25), path, mode="append",
                   branch="iso")  # v4 staged
    r = SnapshotStreamReader(path, None, branch="iso")
    head = r.latestOffset()["version"]
    assert head == 4  # the BRANCH head, not main's 3
    got = ids(r, 0, head)
    assert got == list(range(5)) + list(range(10, 15)) + list(range(20, 25))
    assert not any(100 <= i < 105 for i in got)  # main's commit invisible
    # abandoning the branch fails the stream LOUDLY (cursor is ahead
    # of main; silently re-reading main would replay/duplicate)
    S.snapshot_drop_branch(path, "iso")
    assert r.latestOffset()["version"] == 3  # fell back to main head
    with pytest.raises(ValueError, match="inverted"):
        r.partitions({"version": 4}, {"version": 3})
    # and when main's head version is AHEAD of the abandoned cursor,
    # the lineage-break guard fires instead of silently mixing lines
    # (the cursor's staged dirs are not in main's state — r11 review)
    p2 = str(tmp_path / "t2")
    snapshot_write(spark.range(0, 3), p2)  # v1
    S.snapshot_branch(p2, "dead")
    snapshot_write(spark.range(10, 13), p2, mode="append",
                   branch="dead")  # v2 staged
    rx = SnapshotStreamReader(p2, None, branch="dead")
    assert ids(rx, 0, 2) == [0, 1, 2, 10, 11, 12]  # consumed to cursor 2
    S.snapshot_drop_branch(p2, "dead")  # abandoned, NOT published
    for i in range(3):
        snapshot_write(spark.range(20 + i, 21 + i), p2,
                       mode="append")  # v3..v5: main head passes 2
    assert rx.latestOffset()["version"] == 5
    with pytest.raises(ValueError, match="lineage"):
        rx.partitions({"version": 2}, {"version": 5})

    # phase B — publish survival: fresh fork from the current head
    S.snapshot_branch(path, "stage")
    snapshot_write(spark.range(200, 203), path, mode="append",
                   branch="stage")  # v5 staged
    r2 = SnapshotStreamReader(path, None, branch="stage")
    h2 = r2.latestOffset()["version"]
    assert h2 == 5
    assert ids(r2, 0, h2) == sorted(
        list(range(5)) + list(range(100, 105)) + list(range(200, 203))
    )
    pub = S.snapshot_fast_forward(path, "stage")
    S.snapshot_drop_branch(path, "stage")
    # the lineage falls back to main; the publish window diffs empty
    # (the fast-forward carries exactly the dirs already consumed)
    h3 = r2.latestOffset()["version"]
    assert h3 == pub
    assert ids(r2, h2, h3) == []
    # and post-publish main appends flow straight through
    snapshot_write(spark.range(300, 302), path, mode="append")
    h4 = r2.latestOffset()["version"]
    assert ids(r2, h3, h4) == [300, 301]


def test_format_writer_stages_on_branch(spark, tmp_path):
    """The format batch writer's .option('branch', …) stages its commit
    on a WAP branch: main reads stay bit-identical until
    snapshot_fast_forward publishes, exactly snapshot_write(branch=)."""
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )
    from nyc_taxi_data_ingestion_spark.sources import snapshots as S

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    S.snapshot_write(spark.range(0, 5), path)
    S.snapshot_branch(path, "stage")
    (
        spark.range(100, 103)
        .write.format("snapshot")
        .mode("append")
        .option("path", path)
        .option("branch", "stage")
        .save()
    )
    assert sorted(r.id for r in S.read_snapshot(spark, path).collect()) == [
        0, 1, 2, 3, 4,
    ]
    assert sorted(
        r.id for r in S.read_snapshot(spark, path, branch="stage").collect()
    ) == [0, 1, 2, 3, 4, 100, 101, 102]
    S.snapshot_fast_forward(path, "stage")
    assert sorted(r.id for r in S.read_snapshot(spark, path).collect()) == [
        0, 1, 2, 3, 4, 100, 101, 102,
    ]


def test_reader_resolution_never_contaminates_pinned_manifest(
    spark, tmp_path, monkeypatch
):
    """r11 ADVICE: partitions() must resolve a COPY of the pinned raw
    manifest. _resolve_manifest materializes in place and its
    'commits'-present early return makes any second resolution a
    no-op — an in-place resolve here would let one scan's PRUNED file
    inventory silently become every later scan's plan (different
    pushed filters -> dropped rows). Three readers share one pinned
    raw dict; each must plan from the full inventory."""
    import json

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
    )

    monkeypatch.setattr(S, "_SHARD_INLINE_MAX", 2)
    path = str(tmp_path / "t")
    for i in range(6):
        S.snapshot_write(
            spark.range(i * 100, i * 100 + 10)
            .select(F.col("id"), F.lit(f"g{i}").alias("tag"))
            .repartition(2),
            path,
            mode="append" if i else "overwrite",
            stats_cols=["id"],
        )
    raw = json.load(
        open(S._manifest_path(path, S.current_version(path)))
    )
    assert raw.get("shards") and "commits" not in raw

    # scan 1: selective high-range — shard-level pruning kicks in
    r1 = SnapshotBatchReader(path, raw)
    r1.pushFilters([GreaterThanOrEqual(("id",), 500)])
    files1 = {p.file_abs for p in r1.partitions() if p.file_abs}
    assert 1 <= len(files1) <= 2
    assert r1._shard_plan["skipped_shards"] >= 1

    # the PINNED dict stayed raw: scan 1 resolved its own copy
    assert "commits" not in raw and "_pruned" not in raw

    # scan 2, SAME pinned dict, disjoint filter: must see ITS files
    # (an in-place resolve would replay scan 1's pruned inventory
    # here and return zero files)
    r2 = SnapshotBatchReader(path, raw)
    r2.pushFilters([LessThan(("id",), 10)])
    files2 = {p.file_abs for p in r2.partitions() if p.file_abs}
    assert 1 <= len(files2) <= 2 and files2.isdisjoint(files1)

    # scan 3, unfiltered: the complete inventory
    r3 = SnapshotBatchReader(path, raw)
    files3 = {p.file_abs for p in r3.partitions() if p.file_abs}
    assert len(files3) == 12 and files1 | files2 <= files3
    assert "commits" not in raw


def test_row_group_pruning_skips_groups_and_keeps_positions(
    spark, tmp_path
):
    """r12 — task-side ROW-GROUP pruning: a kept file's pushed range
    conjuncts skip whole row groups via footer statistics (what
    Spark's native parquet reader does; without it a selective scan
    reads whole 128 MB files for a one-row-group answer), and
    positional delete vectors still mask by FILE-GLOBAL row position
    across the skipped groups (a skipped group must not shift later
    groups' offsets). Pruning is advisory-safe: Spark re-evaluates
    every filter, so the unit-level contract is 'yields a superset of
    matching rows, strictly fewer than the whole file'."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
    )

    path = str(tmp_path / "t")
    # ONE file, many small row groups with sequential ids: the engine
    # write has no row-group-size knob, so stage the parquet directly
    # and commit it through the normal staged-commit path
    import os as _os

    import pandas as pd
    import pyarrow as pa

    df = pd.DataFrame(
        {"id": range(10_000), "v": [i % 7 for i in range(10_000)]}
    )
    rel = "data/c00000001-rgtest"
    _os.makedirs(_os.path.join(path, rel), exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        _os.path.join(path, rel, "part-00000.parquet"),
        row_group_size=500,
    )
    S.commit_staged_files(path, rel, ["part-00000.parquet"])
    m = S._load_manifest(path, S.current_version(path))
    (rel,) = [r for r, fs in m["commits"].items() if fs]
    f = m["commits"][rel][0]
    import os as _os

    pf = pq.ParquetFile(_os.path.join(path, rel, f))
    assert pf.metadata.num_row_groups >= 10

    def rows_for(filters):
        r = SnapshotBatchReader(path, dict(m))
        if filters:
            r.pushFilters(filters)
        total = []
        for p in r.partitions():
            if p.file_abs:
                for b in r.read(p):
                    total.extend(b.column("id").to_pylist())
        return sorted(total)

    full = rows_for([])
    assert full == list(range(10_000))
    kept = rows_for(
        [GreaterThanOrEqual(("id",), 4000), LessThan(("id",), 4200)]
    )
    # superset of the matching rows, far fewer than the file
    assert set(range(4000, 4200)) <= set(kept)
    assert len(kept) < 2500

    # positional deletes mask by file-global position even when
    # earlier groups are skipped: delete ids 4100..4149 (positions
    # equal ids here), then re-scan the same selective range
    S.snapshot_delete(
        spark, path, (F.col("id") >= 4100) & (F.col("id") < 4150)
    )
    m2 = S._load_manifest(path, S.current_version(path))
    r2 = SnapshotBatchReader(path, dict(m2))
    r2.pushFilters(
        [GreaterThanOrEqual(("id",), 4000), LessThan(("id",), 4200)]
    )
    got = []
    for p in r2.partitions():
        if p.file_abs:
            for b in r2.read(p):
                got.extend(b.column("id").to_pylist())
    got = set(got)
    assert set(range(4000, 4100)) <= got
    assert set(range(4150, 4200)) <= got
    assert not (set(range(4100, 4150)) & got)


@pytest.mark.slow
def test_columns_option_projects_at_decode_level(spark, tmp_path):
    """r12 — explicit projection pushdown: the Python DataSource
    protocol passes reader() the FULL schema whatever the query
    selects (no column-pruning hook), so .option('columns', …) is how
    a format-API consumer stops paying full decode on a wide table.
    Semantics: schema() returns exactly the named columns in option
    order; values match the full read; renamed columns project under
    their logical name; eq-delete masking still applies when the KEY
    column is outside the projection (keys are read for masking, then
    dropped by the conform step); partition path columns project;
    unknown names fail at planning."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    S.snapshot_write(
        spark.range(0, 100).select(
            F.col("id"),
            F.lit("x").alias("a"),
            (F.col("id") * 2.0).alias("b"),
            (F.col("id") % 3).alias("p"),
        ),
        path,
        partition_by=["p"],
    )

    def rd(cols=None):
        r = spark.read.format("snapshot").option("path", path)
        if cols:
            r = r.option("columns", cols)
        return r.load()

    assert rd("b,id").columns == ["b", "id"]
    got = {r.id: r.b for r in rd("b,id").collect()}
    assert got == {i: i * 2.0 for i in range(100)}
    # partition path column projects (attached from dir values)
    assert sorted(
        set(r.p for r in rd("p").collect())
    ) == [0, 1, 2]
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown column"):
        rd("nope").collect()

    # renamed column projects under its LOGICAL name
    S.snapshot_rename_column(path, "a", "label")
    assert set(r.label for r in rd("label").collect()) == {"x"}

    # eq-delete masking with the key OUTSIDE the projection
    S.snapshot_delete_eq(
        spark, path, spark.range(0, 50).select(F.col("id")), ["id"]
    )
    vals = sorted(r.b for r in rd("b").collect())
    assert vals == [i * 2.0 for i in range(50, 100)]
    assert rd("b").columns == ["b"]


def test_row_group_pruning_nan_and_lineage_soundness(spark, tmp_path):
    """r12 review — the two ways row-group pruning could silently drop
    matching rows, now closed: (a) arrow-cpp footers EXCLUDE NaN from
    min/max while Spark orders NaN greatest, so a float upper bound
    from a non-parquet-mr writer must be voided (a `v > big` scan
    must still surface the NaN row); (b) a dropped-then-re-added
    logical column has NO physical backing in old dirs — the old
    file's same-named footer stats (null_count=0) must not serve an
    IS NULL pushdown whose every row matches."""
    import math
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import GreaterThan, IsNull

    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotBatchReader,
    )

    # (a) NaN: one arrow-cpp file, two row groups; NaN hides in the
    # low-range group whose max footer reads 2.0
    p1 = str(tmp_path / "nan")
    rel = "data/c00000001-nan"
    _os.makedirs(_os.path.join(p1, rel), exist_ok=True)
    pq.write_table(
        pa.table({"v": pa.array(
            [1.0, 2.0, float("nan"), 100.0, 101.0, 102.0], pa.float64()
        )}),
        _os.path.join(p1, rel, "part-00000.parquet"),
        row_group_size=3,
    )
    S.commit_staged_files(p1, rel, ["part-00000.parquet"])
    m = S._load_manifest(p1, S.current_version(p1))
    r = SnapshotBatchReader(p1, dict(m))
    r.pushFilters([GreaterThan(("v",), 50.0)])
    got = []
    for p in r.partitions():
        if p.file_abs:
            for b in r.read(p):
                got.extend(b.column("v").to_pylist())
    assert any(math.isnan(v) for v in got), (
        "NaN row lost to a non-mr float upper bound"
    )

    # (b) drop-then-readd lineage vs IS NULL pushdown
    p2 = str(tmp_path / "lin")
    S.snapshot_write(
        spark.range(0, 50).select(
            F.col("id"), (F.col("id") * 1.0).alias("x")
        ).coalesce(1),
        p2,
    )
    S.snapshot_drop_column(p2, "x")
    S.snapshot_write(
        spark.range(100, 105).select(
            F.col("id"), F.lit(7.0).alias("x")
        ).coalesce(1),
        p2,
        mode="append",
    )
    m2 = S._load_manifest(p2, S.current_version(p2))
    r2 = SnapshotBatchReader(p2, dict(m2))
    r2.pushFilters([IsNull(("x",))])
    ids = []
    for p in r2.partitions():
        if p.file_abs:
            for b in r2.read(p):
                t = b.to_pydict()
                ids.extend(
                    i for i, x in zip(t["id"], t.get("x", [None] * len(t["id"])))
                    if x is None
                )
    assert sorted(ids) == list(range(50)), (
        "old-lineage rows (logical x IS NULL) lost to stale physical stats"
    )


def test_columns_projection_keeps_partition_key_eq_deletes(
    spark, tmp_path
):
    """r12 review (confirmed end-to-end then fixed): an equality
    delete keyed on a PARTITION PATH column must still mask when the
    projection excludes that column — the key is attached for masking
    from the unprojected schema's typing, then dropped by conform."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        register_snapshot_format,
    )

    register_snapshot_format(spark)
    path = str(tmp_path / "t")
    S.snapshot_write(
        spark.range(0, 99).select(
            F.col("id"), (F.col("id") % 3).alias("p"),
            (F.col("id") * 2.0).alias("b"),
        ),
        path,
        partition_by=["p"],
    )
    S.snapshot_delete_eq(
        spark, path, spark.createDataFrame([(1,)], "p long"), ["p"]
    )
    full = spark.read.format("snapshot").option("path", path).load()
    assert full.where(F.col("p") == 1).count() == 0
    proj = (
        spark.read.format("snapshot").option("path", path)
        .option("columns", "b,id").load()
    )
    ids = sorted(r.id for r in proj.collect())
    assert ids == sorted(i for i in range(99) if i % 3 != 1)
    assert proj.columns == ["b", "id"]
