"""Structured Streaming tests — every streaming plan is run to
completion with Trigger.AvailableNow and compared against its batch
equivalent (batch-parity is Spark's own correctness contract for
streaming aggregations)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.sources.readers import read_table
from nyc_taxi_data_ingestion_spark.streaming import (
    read_parquet_stream,
    run_available_now,
    session_windows,
    silver_stream,
    stream_dedupe,
    tumbling_aggregate,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-staged as a normal-timestamp parquet dir (the raw
    testdata uses TIMESTAMP(NANOS), which streaming schemas can't
    express)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    read_table(spark, sf_dir, "events").write.parquet(path)
    return path


@pytest.fixture(scope="module")
def events_schema(spark, events_dir):
    return spark.read.parquet(events_dir).schema


def test_staged_events_ts_is_watermarkable(spark, events_dir):
    """Regression gate for the round-2 outage: the testdata generator
    switched events.ts from TIMESTAMP(NANOS) to naive timestamp[us],
    which Spark 4 infers as TIMESTAMP_NTZ — a type withWatermark
    rejects. read_table must normalize BOTH forms to plain TIMESTAMP."""
    schema = spark.read.parquet(events_dir).schema
    assert schema["ts"].dataType.typeName() == "timestamp", schema["ts"].dataType


def test_tumbling_aggregate_matches_batch(spark, events_dir, events_schema):
    stream = read_parquet_stream(spark, events_dir, events_schema)
    agg = tumbling_aggregate(
        stream,
        "ts",
        "1 day",
        ["event_type"],
        [F.count("*").alias("cnt")],
        watermark_delay="1 minute",
    )
    got = run_available_now(agg, "tumbling_test", output_mode="complete")

    batch = spark.read.parquet(events_dir)
    want = (
        batch.groupBy(
            F.date_trunc("day", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("cnt"))
    )
    g = {(r.window_start, r.event_type): r.cnt for r in got.collect()}
    w = {(r.window_start, r.event_type): r.cnt for r in want.collect()}
    assert g == w and len(g) > 0


def test_session_windows_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),   # same session (gap 30m)
        (1, "2024-01-01 11:00:00"),   # new session (50m gap)
        (2, "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = (
        session_windows(df, "ts", "30 minutes", ["user_id"])
        .orderBy("user_id", "session_start")
        .collect()
    )
    assert [(r.user_id, r.event_cnt) for r in out] == [(1, 2), (1, 1), (2, 1)]
    # session end = last event + gap
    assert out[0].session_end == out[0].last_event.replace(minute=40)


def test_stream_dedupe_and_silver_chain(spark, tmp_path):
    src = str(tmp_path / "dups")
    rows = [(1, "a", "2024-01-01 10:00:00"), (1, "a", "2024-01-01 10:00:05"),
            (2, "b", "2024-01-01 10:01:00")]
    (
        spark.createDataFrame(rows, "k long, v string, ts string")
        .withColumn("ts", F.to_timestamp("ts"))
        .write.parquet(src)
    )
    schema = spark.read.parquet(src).schema
    stream = read_parquet_stream(spark, src, schema)
    sil = silver_stream(
        stream,
        renames={"v": "val"},
        derived={"k2": "k * 2"},
        filters=["k IS NOT NULL"],
        watermark=("ts", "10 minutes"),
        dedupe_keys=["k"],
    )
    got = run_available_now(sil, "dedupe_test", output_mode="append")
    assert got.count() == 2
    assert set(got.columns) == {"k", "val", "ts", "k2"}


def test_stateful_profile_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState must restore + merge state across
    micro-batches: three single-file batches for one user, final
    profile covers all three events."""
    from nyc_taxi_data_ingestion_spark.streaming import (
        read_parquet_stream,
        run_available_now,
        stateful_profile,
    )

    src = str(tmp_path / "ev")
    rows = [
        (1, "2024-01-01 10:00:00", "click"),
        (1, "2024-01-02 11:00:00", "view"),
        (1, "2024-01-03 12:00:00", "click"),
        (2, "2024-01-02 09:00:00", "buy"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.repartition(4).write.parquet(src)  # several files → several batches

    schema = spark.read.parquet(src).schema
    stream = read_parquet_stream(spark, src, schema, max_files_per_trigger=1)
    updates = run_available_now(
        stateful_profile(stream), "stateful_test", output_mode="update"
    )
    # multiple batches must actually have been emitted for user 1
    assert updates.filter(F.col("user_id") == 1).count() >= 2
    final = (
        updates.groupBy("user_id")
        .agg(F.max(F.struct("cnt", "first_event", "last_event", "n_event_types")).alias("s"))
        .select("user_id", "s.*")
    )
    got = {r.user_id: (r.cnt, r.n_event_types) for r in final.collect()}
    assert got == {1: (3, 2), 2: (1, 1)}
    f1 = final.filter(F.col("user_id") == 1).collect()[0]
    assert f1.first_event.day == 1 and f1.last_event.day == 3


@pytest.mark.slow
def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: an event arriving AFTER its window's state
    was evicted must be dropped (numRowsDroppedByWatermark), and the
    finalized window must never be re-emitted. Eviction happens at the
    end of the first batch that RUNS with a watermark past window end —
    the watermark is a lateness bound, so a late row landing in the
    same batch as finalization may still legally count; the drop is
    guaranteed only one batch later. Four single-file batches, mtime-
    ordered so the file source replays them deterministically."""
    import time

    src = tmp_path / "late"
    src.mkdir()

    def write_batch(name, rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.parquet(str(tmp_path / ("stage_" + name)))
        import glob
        import shutil

        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))
        time.sleep(1.1)  # file-source ordering is mtime-second-granular

    write_batch("b1", [(1, "2024-01-01 10:00:00", "a"),
                       (2, "2024-01-01 10:04:00", "a")])
    # advances the watermark past window [10:00, 10:10)...
    write_batch("b2", [(3, "2024-01-01 11:00:00", "a")])
    # ...and this batch RUNS with that watermark → 10:00 state evicted
    write_batch("b3", [(5, "2024-01-01 11:05:00", "a")])
    # LATE: belongs to the already-finalized window → dropped
    write_batch("b4", [(4, "2024-01-01 10:05:00", "a")])

    schema = spark.read.parquet(str(src)).schema
    stream = read_parquet_stream(spark, str(src), schema, max_files_per_trigger=1)
    agg = tumbling_aggregate(
        stream, "ts", "10 minutes", ["event_type"],
        [F.count("*").alias("cnt")],
        watermark_delay="0 seconds",
    )
    got = run_available_now(agg, "late_test", output_mode="append")
    rows = [r for r in got.collect() if r.window_start.strftime("%H:%M") == "10:00"]
    # exactly one emission of the 10:00 window, with the on-time count
    assert len(rows) == 1 and rows[0].cnt == 2, rows


@pytest.mark.slow
def test_stream_stream_join_matches_batch(spark, events_dir, events_schema):
    """Stream-stream time-bounded join across several micro-batches must
    equal the batch interval join — matches where the two sides arrive
    in DIFFERENT batches are exactly what the join state buffer exists
    for."""
    from nyc_taxi_data_ingestion_spark.streaming import stream_stream_join

    clicks = read_parquet_stream(
        spark, events_dir, events_schema, max_files_per_trigger=1
    ).filter(F.col("event_type") == "click")
    purchases = read_parquet_stream(
        spark, events_dir, events_schema, max_files_per_trigger=1
    ).filter(F.col("event_type") == "purchase")
    joined = stream_stream_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        max_gap="30 MINUTE", watermark_delay="1 minute",
    ).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
    )
    got = run_available_now(joined, "ssjoin_test", output_mode="append")

    ev = spark.read.parquet(events_dir)
    c = ev.filter(F.col("event_type") == "click").alias("c")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    want = c.join(
        p,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") < F.col("c.ts") + F.expr("INTERVAL 30 MINUTE")),
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
    )
    g = {(r.click_id, r.purchase_id) for r in got.collect()}
    w = {(r.click_id, r.purchase_id) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_upsert_sink_last_writer_wins(spark, tmp_path):
    """foreachBatch MERGE sink: late micro-batches upsert over earlier
    rows per key; the final table is one row per key with the highest
    order value, regardless of batch slicing."""
    from nyc_taxi_data_ingestion_spark.streaming import stream_upsert_sink

    src = str(tmp_path / "src")
    rows = [
        (1, "2024-01-01 10:00:00", 10.0),
        (1, "2024-01-02 10:00:00", 20.0),   # later → wins
        (2, "2024-01-01 09:00:00", 5.0),
        (3, "2024-01-03 08:00:00", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.repartition(4).write.parquet(src)  # several files → several batches

    target = str(tmp_path / "tgt")
    schema = spark.read.parquet(src).schema
    stream = read_parquet_stream(spark, src, schema, max_files_per_trigger=1)
    stream_upsert_sink(stream, target, keys=["k"], order_col="ts",
                       query_name="upsert_test")

    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: 20.0, 2: 5.0, 3: 7.0}


def test_stream_corpus_dedup_watermarked_state(spark, tmp_path):
    from nyc_taxi_data_ingestion_spark.llm.text import fingerprint
    from nyc_taxi_data_ingestion_spark.streaming import (
        run_available_now,
        stream_corpus_dedup,
    )

    src = str(tmp_path / "docs_in")
    rows = [
        (1, "corpus known text", "2024-01-01 00:00:00"),
        (2, "fresh text one", "2024-01-01 00:01:00"),
        (3, "fresh text one", "2024-01-01 00:02:00"),   # in-stream dup of 2
        (4, "fresh text two", "2024-01-01 00:03:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.write.mode("overwrite").parquet(src)

    corpus = spark.createDataFrame([(99, "corpus  KNOWN text")], "doc_id long, text string")
    corpus_fp = corpus.select(fingerprint("text").alias("fp")).distinct()

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = run_available_now(
        stream_corpus_dedup(stream, corpus_fp, ts_col="ts", delay="10 minutes"),
        "t_corpus_dedup",
    )
    kept_fps = {r["__fp"] for r in out.collect()}
    # doc 1 is killed by the corpus (normalization folds case/spacing);
    # docs 2/3 collapse to one winner; doc 4 survives → 2 fingerprints
    assert len(kept_fps) == 2
    texts = {r["text"] for r in out.collect()}
    assert "corpus known text" not in texts
    assert "fresh text two" in texts


@pytest.mark.slow
def test_stream_incremental_dedup_matches_sequential_batches(spark, tmp_path):
    from nyc_taxi_data_ingestion_spark.llm.dedup import (
        incremental_minhash_dedup,
    )
    from nyc_taxi_data_ingestion_spark.streaming import stream_incremental_dedup

    novel = [
        "a genuinely novel document about distributed joins " * 6,
        "another novel text regarding watermark semantics " * 6,
        "third unique payload concerning shuffle partitioning " * 6,
    ]
    # batch files written separately → maxFilesPerTrigger=1 gives one
    # micro-batch per file, in mtime order
    import time as _time

    src = str(tmp_path / "stream_src")
    b1 = spark.createDataFrame(
        [(10, novel[0]), (11, novel[1])], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(20, novel[0]), (21, novel[2]), (22, novel[2])],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.1)
    b2.coalesce(1).write.mode("append").parquet(src)

    idx_path = str(tmp_path / "mh_index")
    surv_path = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    seed = spark.createDataFrame([], "__id long, __sig array<bigint>")
    seed.write.parquet(idx_path)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_incremental_dedup(
        stream, idx_path, surv_path, ckpt, threshold=0.5
    )

    got = sorted(r.doc_id for r in spark.read.parquet(surv_path).collect())
    # 10, 11 survive batch 1; 20 dups 10 (cross-batch via the index),
    # 21 survives, 22 dups 21 within its own batch
    assert got == [10, 11, 21]
    idx_ids = sorted(r["__id"] for r in spark.read.parquet(idx_path).collect())
    assert idx_ids == [10, 11, 21]

    # equivalence: sequential batch application of the batch operator
    seed2 = spark.createDataFrame([], "__id long, __sig array<bigint>")
    s1, i1 = incremental_minhash_dedup(b1, seed2, threshold=0.5)
    i1 = i1.localCheckpoint(eager=True)
    s2, _ = incremental_minhash_dedup(b2, i1, threshold=0.5)
    batch_ids = sorted(
        [r.doc_id for r in s1.collect()] + [r.doc_id for r in s2.collect()]
    )
    assert batch_ids == got


def test_stream_agg_state_fold_and_replay_idempotence(spark, sf_dir, tmp_path):
    import shutil

    from nyc_taxi_data_ingestion_spark.operators.incremental import (
        partial_agg_state,
    )
    from nyc_taxi_data_ingestion_spark.streaming import read_parquet_stream
    from nyc_taxi_data_ingestion_spark.streaming.ingest import (
        stream_agg_state_sink,
    )

    src = str(tmp_path / "orders_src")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    state = str(tmp_path / "state")

    def run(ckpt):
        stream = read_parquet_stream(
            spark, src, schema, max_files_per_trigger=1
        )
        stream_agg_state_sink(
            stream, state, ["o_orderpriority"], "o_totalprice",
            checkpoint_dir=ckpt,
        )

    run(str(tmp_path / "ckpt1"))
    got = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in spark.read.parquet(state).collect()
    }
    want = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in partial_agg_state(
            orders, ["o_orderpriority"], "o_totalprice"
        ).collect()
    }
    assert got == want  # folded state == one-shot partial agg
    # resume with the SAME checkpoint: Spark's own file tracking plus
    # the atomic markers deliver nothing new — state unchanged
    run(str(tmp_path / "ckpt1"))
    again = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in spark.read.parquet(state).collect()
    }
    assert again == want  # no double counting
    # a FRESH checkpoint re-lists every file under fresh batch ids —
    # no marker scheme can map them onto the old lineage, so the sink
    # must refuse loudly rather than silently double-count
    import pytest as _pytest

    with _pytest.raises(Exception, match="lineage"):
        run(str(tmp_path / "ckpt2"))
    unchanged = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in spark.read.parquet(state).collect()
    }
    assert unchanged == want
    shutil.rmtree(state + "__fold_old", ignore_errors=True)


def test_running_totals_transform_with_state(spark, sf_dir):
    """Spark 4 transformWithStateInPandas running totals — the final
    emission per key equals the batch aggregate. Skips where the
    protobuf runtime (required by the new API's state protocol) is
    absent; the ImportError gate itself is asserted in that case."""
    import pytest
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.sources.readers import read_table
    from nyc_taxi_data_ingestion_spark.streaming import (
        read_parquet_stream,
        run_available_now,
        running_totals_stream,
    )

    ev = read_table(spark, sf_dir, "events")
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        dummy = ev.limit(0)
        with pytest.raises(ImportError, match="protobuf"):
            running_totals_stream(dummy, "event_type", "value")
        pytest.skip("google.protobuf absent: transformWithState gated")

    import tempfile

    staged = tempfile.mkdtemp(prefix="rtstage_")
    ev.write.mode("overwrite").parquet(staged)
    stream = read_parquet_stream(spark, staged, ev.schema)
    evolved = run_available_now(
        running_totals_stream(stream, "event_type", "value"),
        "t_running_totals",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.desc("seq"))
    final = {
        r.event_type: (r.n, r.mn, r.mx)
        for r in evolved.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    want = {
        r.event_type: (r.n, r.mn, r.mx)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert final == want


@pytest.mark.slow
def test_snapshot_append_sink_exactly_once(spark, tmp_path):
    """Streaming ingest into a versioned snapshot table: each
    micro-batch is one append commit with its batch id in the manifest;
    a replayed batch id is a no-op (exactly-once over an at-least-once
    delivery), and the marker survives an interleaved compaction."""
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        current_version,
        read_snapshot,
        snapshot_compact,
        stream_state,
    )
    from nyc_taxi_data_ingestion_spark.streaming import (
        commit_stream_batch,
        read_parquet_stream,
        snapshot_append_sink,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], "k long, v string").coalesce(
        1
    ).write.parquet(src)
    spark.createDataFrame([(2, "b")], "k long, v string").coalesce(
        1
    ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    tbl = str(tmp_path / "tbl")
    stream = read_parquet_stream(spark, src, schema, max_files_per_trigger=1)
    snapshot_append_sink(stream, tbl, source_id="ingest@ckpt1")

    head = current_version(tbl)
    assert head == 2  # one commit per micro-batch (1 file each)
    assert read_snapshot(spark, tbl).count() == 2
    assert stream_state(tbl) == {"ingest@ckpt1": 1}  # batch ids 0, 1

    # crash-replay of the last batch: same batch id arrives again
    replay = spark.createDataFrame([(2, "b")], "k long, v string")
    assert commit_stream_batch(replay, 1, tbl, "ingest@ckpt1") is None
    assert current_version(tbl) == head
    assert read_snapshot(spark, tbl).count() == 2

    # a compaction between stream batches must carry the marker forward
    snapshot_compact(spark, tbl, target_partitions=1)
    assert stream_state(tbl) == {"ingest@ckpt1": 1}
    assert commit_stream_batch(replay, 1, tbl, "ingest@ckpt1") is None

    # the NEXT batch id still lands, on top of the compacted head
    nxt = spark.createDataFrame([(3, "c")], "k long, v string")
    v = commit_stream_batch(nxt, 2, tbl, "ingest@ckpt1")
    assert v == current_version(tbl)
    assert read_snapshot(spark, tbl).count() == 3
    assert stream_state(tbl) == {"ingest@ckpt1": 2}

    # a second independent source keeps its own high-water mark
    other = spark.createDataFrame([(9, "z")], "k long, v string")
    assert commit_stream_batch(other, 0, tbl, "backfill@ckpt9") is not None
    assert stream_state(tbl) == {"ingest@ckpt1": 2, "backfill@ckpt9": 0}


def test_snapshot_rollback_rewinds_stream_markers(spark, tmp_path):
    """Rolling back un-commits the rolled-back batches' data, so their
    high-water marks must rewind with it — a re-delivery of those
    batch ids (from a correspondingly rewound checkpoint) re-lands."""
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        read_snapshot,
        snapshot_rollback,
        stream_state,
    )
    from nyc_taxi_data_ingestion_spark.streaming import commit_stream_batch

    tbl = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, "a")], "k long, v string")
    b1 = spark.createDataFrame([(2, "b")], "k long, v string")
    v0 = commit_stream_batch(b0, 0, tbl, "src@ck")
    commit_stream_batch(b1, 1, tbl, "src@ck")
    assert stream_state(tbl) == {"src@ck": 1}

    snapshot_rollback(tbl, v0)
    assert stream_state(tbl) == {"src@ck": 0}
    assert read_snapshot(spark, tbl).count() == 1
    # batch 1 is re-deliverable after the rewind
    assert commit_stream_batch(b1, 1, tbl, "src@ck") is not None
    assert read_snapshot(spark, tbl).count() == 2


@pytest.mark.slow
def test_snapshot_drain_to_head_bounded_windows(spark, tmp_path):
    """r11 verdict item 7 — bounded-drain trigger semantics: a
    restarted stream with a deep backlog drains exactly to the head
    observed at entry, in maxVersionsPerTrigger-sized windows (>1),
    then terminates. Spark's own AvailableNow latches ONE gated
    latestOffset per run for a Python source (measured: it strands
    the backlog past the first window); snapshot_drain_to_head loops
    drain-then-stop runs against one checkpoint until the admission
    cursor reaches the entry head. Post-entry commits stay for the
    next cadence, restarts are exactly-once (no row ever doubles),
    and a second drain call is a no-op."""
    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.streaming.ingest import (
        snapshot_drain_to_head,
    )

    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out: list = []

    def sink(batch_df, batch_id):
        out.extend(r.id for r in batch_df.collect())

    # seed + first consume: cursor lands at v1
    S.snapshot_write(spark.range(0, 10), path)
    rep0 = snapshot_drain_to_head(
        spark, path, sink, stream_id="drain-t", checkpoint_dir=ck,
        max_versions_per_trigger=2,
    )
    assert rep0["drained_to"] == 1 and sorted(out) == list(range(10))

    # the stream is DOWN while a 6-version backlog accumulates
    for i in range(1, 7):
        S.snapshot_write(spark.range(i * 10, i * 10 + 10), path,
                         mode="append")
    rep = snapshot_drain_to_head(
        spark, path, sink, stream_id="drain-t", checkpoint_dir=ck,
        max_versions_per_trigger=2,
    )
    # rate-limited: 6 versions at 2/window = 3 windows, 3 runs
    assert rep["runs"] >= 3 and rep["windows"] >= 3
    assert rep["head_at_entry"] == 7 and rep["drained_to"] >= 7
    assert sorted(out) == list(range(70))
    assert len(out) == len(set(out))  # exactly-once across restarts

    # a second drain with nothing new is a no-op
    rep2 = snapshot_drain_to_head(
        spark, path, sink, stream_id="drain-t", checkpoint_dir=ck,
        max_versions_per_trigger=2,
    )
    assert rep2["runs"] == 0 and sorted(out) == list(range(70))

    # SELF-HEAL (r12 review): a hint stale-behind the checkpoint (a
    # swallowed hint-write failure) must not fail the drain forever —
    # the loop walks the hint forward one gate per no-progress run
    # until it reaches the head, replaying NOTHING (exactly-once holds)
    import json as _json

    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamReader,
    )

    hp = SnapshotStreamReader(
        path, stream_id="drain-t"
    )._cursor_hint_path()
    with open(hp, "w") as f:
        _json.dump({"last_end": 3}, f)
    rep3 = snapshot_drain_to_head(
        spark, path, sink, stream_id="drain-t", checkpoint_dir=ck,
        max_versions_per_trigger=2,
    )
    assert rep3["drained_to"] == 7 and sorted(out) == list(range(70))


@pytest.mark.slow
def test_snapshot_drain_clamps_to_entry_head_under_racing_writer(
    spark, tmp_path
):
    """r12 review: latestOffset gates against head-NOW, so without a
    clamp the final gated window could swallow up to gate-1 commits
    that landed AFTER the drain started. A writer racing one commit in
    during the drain must see it left for the next cadence: the drain
    stops exactly at the head observed at entry."""
    from nyc_taxi_data_ingestion_spark.sources import snapshots as S
    from nyc_taxi_data_ingestion_spark.streaming.ingest import (
        snapshot_drain_to_head,
    )

    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out: list = []
    raced = {"done": False}

    def sink(batch_df, batch_id):
        out.extend(r.id for r in batch_df.collect())
        if not raced["done"]:
            # a concurrent producer lands a commit mid-drain
            raced["done"] = True
            S.snapshot_write(spark.range(900, 905), path, mode="append")

    S.snapshot_write(spark.range(0, 5), path)
    rep0 = snapshot_drain_to_head(
        spark, path, lambda df, bid: out.extend(
            r.id for r in df.collect()
        ),
        stream_id="drain-race", checkpoint_dir=ck,
        max_versions_per_trigger=2,
    )
    assert rep0["drained_to"] == 1
    # 5-version backlog (head 6) while the stream is down; the racing
    # sink will push head to 7 during the drain — an unclamped final
    # window (5, 7] would swallow it
    for i in range(1, 6):
        S.snapshot_write(spark.range(i * 10, i * 10 + 5), path,
                         mode="append")
    rep = snapshot_drain_to_head(
        spark, path, sink, stream_id="drain-race", checkpoint_dir=ck,
        max_versions_per_trigger=2,
    )
    assert rep["head_at_entry"] == 6 and rep["drained_to"] == 6
    assert 900 not in out  # post-entry commit stays for next cadence
    # ...and the next cadence picks it up exactly once
    rep2 = snapshot_drain_to_head(
        spark, path, sink, stream_id="drain-race", checkpoint_dir=ck,
        max_versions_per_trigger=2,
    )
    assert rep2["drained_to"] == 7
    assert sorted(x for x in out if x >= 900) == list(range(900, 905))
