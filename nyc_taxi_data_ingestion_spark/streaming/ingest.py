"""Streaming ingest + windowed aggregation operators.

The batch Silver chain (operators/transform.py) is plan-builders only,
so it applies to streaming DataFrames unchanged — rename/cast/derive/
filter are stateless; dedupe swaps row_number for
``dropDuplicatesWithinWatermark`` (bounded state). Aggregations use
event-time windows + watermarks so state is evictable at scale.

Scale notes (1000-executor deployment):
- watermark delay bounds state size: state per key-window is dropped
  once the watermark passes window end.
- file-source streams parallelize by file; Kafka streams by partition —
  ``maxFilesPerTrigger``/``maxOffsetsPerTrigger`` throttle microbatches.
- ``Trigger.AvailableNow`` gives deterministic batch-parity runs (used
  by the oracle checks); production uses processingTime triggers.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory. Streaming reads
    require an explicit schema (no inference race on new files)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def silver_stream(
    df: DataFrame,
    renames: dict | None = None,
    casts: dict | None = None,
    derived: dict | None = None,
    filters: list | None = None,
    watermark: tuple[str, str] | None = None,
    dedupe_keys: list[str] | None = None,
) -> DataFrame:
    """The Silver chain on a stream. Stateless steps are shared with the
    batch implementation verbatim; dedupe becomes
    ``dropDuplicatesWithinWatermark`` (keep-first within the watermark
    horizon — bounded-state analogue of W1's row_number keep-first)."""
    from nyc_taxi_data_ingestion_spark.operators.transform import (
        apply_transformations,
    )

    df = apply_transformations(
        df, renames=renames, casts=casts, derived=derived, filters=filters
    )
    if watermark:
        col, delay = watermark
        df = df.withWatermark(col, delay)
    if dedupe_keys:
        df = df.dropDuplicatesWithinWatermark(dedupe_keys)
    return df


def stream_dedupe(df: DataFrame, keys: list[str], ts_col: str, delay: str) -> DataFrame:
    """W1 streaming analogue: keep-first per key within the watermark."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def tumbling_aggregate(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    keys: list[str],
    aggs: list,
    watermark_delay: str | None = "1 hour",
) -> DataFrame:
    """Tumbling event-time window aggregate with watermark. Output
    columns: window_start, window_end, *keys, *aggs.
    ``watermark_delay=None`` keeps an upstream watermark instead of
    redefining it (Spark disallows redefinition mid-plan)."""
    if watermark_delay is not None:
        df = df.withWatermark(ts_col, watermark_delay)
    out = (
        df.groupBy(F.window(F.col(ts_col), window_duration), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    slide_duration: str,
    keys: list[str],
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Sliding-window counts (overlapping windows — each event lands in
    window/slide buckets)."""
    out = (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration, slide_duration), *keys
        )
        .agg(F.count("*").alias("cnt"))
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        "cnt",
    )


def session_windows(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Session windows: events within `gap` of each other merge into one
    session per key (built-in ``session_window`` — dynamic, unaligned
    windows; state evicted past the watermark)."""
    out = (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(
            F.count("*").alias("event_cnt"),
            F.min(ts_col).alias("first_event"),
            F.max(ts_col).alias("last_event"),
        )
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        "event_cnt",
        "first_event",
        "last_event",
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap: str,
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with a bounded event-time range:
    right rows match left rows with the same key and
    ``left_ts <= right_ts < left_ts + max_gap``.

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions — that is what lets Spark evict join state: a
    buffered left row can be dropped once the right watermark passes
    ``left_ts + max_gap`` (and vice versa). An unbounded condition would
    buffer both streams forever; at 100 TB the time bound IS the
    operator. Inner joins emit matches as both sides arrive, so an
    AvailableNow run produces exactly the batch join result —
    cross-engine oracle-checkable. Outer variants additionally emit
    NULL-padded rows only after watermark expiry.
    """
    l = left.withWatermark(left_ts, watermark_delay).alias("l")
    r = right.withWatermark(right_ts, watermark_delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond, how)


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Execute a streaming plan to completion with Trigger.AvailableNow
    into an in-memory sink, returning the result as a batch DataFrame.

    This is the deterministic harness: process every available input,
    then stop — so a streaming aggregate can be compared 1:1 against
    its batch/oracle equivalent. Production code would writeStream to
    parquet/Kafka with a processingTime trigger instead.

    ``state_partitions`` pins the state-store partition count for this
    run. Streaming state partitioning is frozen at checkpoint creation
    and must be sized to STATE VOLUME, not to the batch-compute core
    count: every micro-batch pays per-partition state-store
    load/commit I/O plus a task, whether or not the partition holds
    keys (inheriting a batch-tuned ``spark.sql.shuffle.partitions`` of
    200+ made these runs ~10× slower under a default session;
    32 → 8 re-measured 2.5-4.2 s → 1.1-1.8 s addBatch on a 5-key
    aggregate). Every registry drain holds ≤ a few thousand keys of
    state, so the default is 8 — small enough that store overhead is
    noise, large enough that cross-partition state handling is still
    exercised; a production stream with millions of keys in its
    horizon sizes this up to keys-in-horizon / target-store-size
    exactly as it would size ``spark.sql.shuffle.partitions``. The
    conf is restored afterwards — each AvailableNow run uses a fresh
    checkpoint, so the pin cannot conflict with an existing state
    layout. Pass None to inherit.
    """
    import uuid

    # memory-sink tables are session-global; suffix so reruns of the
    # same named query don't collide
    qname = f"{query_name}_{uuid.uuid4().hex[:8]}"
    own_checkpoint = checkpoint_dir is None
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    session = stream_df.sparkSession
    prev_parts = session.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        session.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(qname)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout_sec):
                raise TimeoutError(
                    f"streaming query {qname} did not finish in {timeout_sec}s"
                )
        finally:
            if q.isActive:
                q.stop()
    finally:
        if state_partitions is not None:
            session.conf.set("spark.sql.shuffle.partitions", prev_parts)
    spark = stream_df.sparkSession
    # copy the result out of the memory sink and drop its temp view —
    # memory-sink tables are session-global and would otherwise pin
    # their rows for the life of the session (bench.py runs dozens of
    # queries in one session; leaked sinks inflate later queries)
    result = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    if own_checkpoint:
        # a drain-then-stop run never restarts from this checkpoint;
        # leaving it would leak one dir per run (bench/test sessions run
        # hundreds). Caller-provided checkpoints are preserved — those
        # carry real resume semantics.
        import shutil

        shutil.rmtree(checkpoint_dir, ignore_errors=True)
    return result


def stream_upsert_sink(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
    query_name: str = "stream_upsert",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
    output_mode: str | None = None,
) -> None:
    """Streaming MERGE sink via ``foreachBatch``: each micro-batch is
    upserted into the parquet target with last-writer-wins per key —
    the streaming twin of the batch ``merge_upsert`` (M1's dbt
    incremental-merge semantics, continuously applied).

    ``foreachBatch`` is THE escape hatch for sinks Structured Streaming
    lacks natively (JDBC, MERGE, multi-table fan-out): the batch
    DataFrame it hands over supports every batch writer. Exactly-once
    comes from checkpointed batch IDs + an idempotent merge — replaying
    a batch after crash recovery converges to the same table state
    (upsert is idempotent), the standard contract for non-transactional
    sinks. On Iceberg/Delta the body becomes a transactional
    ``MERGE INTO`` with no other change.

    Runs with AvailableNow (drain-then-stop) for deterministic tests;
    a production deployment swaps the trigger.
    """
    from nyc_taxi_data_ingestion_spark.sources.sinks import merge_upsert

    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(
        prefix=f"ckpt_{query_name}_"
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        merge_upsert(
            batch_df.sparkSession, target_path, batch_df, keys, order_col
        )

    writer = (
        stream_df.writeStream.foreachBatch(_merge)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if output_mode:
        # streaming aggregates need "update" here: append-mode windows
        # emit only after the watermark passes them, so a drain of a
        # bounded input would never flush its final windows
        writer = writer.outputMode(output_mode)
    q = writer.start()
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming query {query_name} did not finish in {timeout_sec}s"
            )
    finally:
        if q.isActive:
            q.stop()


def commit_stream_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    source_id: str,
    partition_by: list[str] | None = None,
) -> int | None:
    """Idempotently land ONE micro-batch as an append commit on a
    versioned snapshot table — the foreachBatch body of
    :func:`snapshot_append_sink`, exposed separately so crash-replay
    (same ``batch_id`` delivered twice) is directly testable.

    Exactly-once protocol (Delta's txn appId/version): the head
    manifest's ``stream_state[source_id]`` is the last batch id this
    source applied. A batch at or below it is a replay — skipped
    (returns None). Otherwise the append commits with the head CAS and
    the advanced marker IN THE SAME manifest, so "check marker" and
    "write data" are one atomic commit: a concurrent writer landing
    in between forces a re-plan (re-reading the marker), never a
    duplicate or lost batch. Batch ids are monotone per streaming
    CHECKPOINT — restarting a query from a fresh checkpoint resets
    them to 0, so ``source_id`` must name the (query, checkpoint)
    lineage, not just the query.
    """
    from nyc_taxi_data_ingestion_spark.sources.snapshots import (
        EXPECT_NO_PARENT,
        ConcurrentSnapshotError,
        current_version,
        snapshot_write,
        stream_state,
    )

    for _ in range(5):
        head = current_version(path)
        try:
            marks = stream_state(path, head)
        except FileNotFoundError:
            continue  # head's manifest expired under us: re-poll
        if marks.get(source_id, -1) >= batch_id:
            return None
        try:
            return snapshot_write(
                batch_df,
                path,
                mode="append",
                partition_by=partition_by,
                expected_parent=head if head is not None else EXPECT_NO_PARENT,
                stream_state={source_id: batch_id},
            )
        except ConcurrentSnapshotError:
            continue
    raise ConcurrentSnapshotError(
        f"stream batch {batch_id} ({source_id}) lost 5 commit races at "
        f"{path} — a writer loop is outrunning this stream"
    )


def snapshot_append_sink(
    stream_df: DataFrame,
    path: str,
    source_id: str,
    partition_by: list[str] | None = None,
    query_name: str = "snapshot_append",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Exactly-once streaming ingest into a versioned snapshot table:
    each micro-batch appends as its own snapshot commit, with the
    batch id recorded in the manifest (see :func:`commit_stream_batch`
    for the protocol). Downstream consumers get everything the
    snapshot layer offers over a live stream — time travel across
    micro-batches, :func:`read_appends_between` as an incremental
    changelog, concurrent compaction that can never tear a reader.

    This is the Delta-sink shape for engines without one: checkpointed
    source offsets give at-least-once delivery, the manifest-recorded
    batch id de-duplicates the overlap — together, exactly-once.
    Runs with AvailableNow (drain-then-stop) for deterministic tests;
    production swaps the trigger.
    """
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(
        prefix=f"ckpt_{query_name}_"
    )

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        commit_stream_batch(batch_df, batch_id, path, source_id, partition_by)

    q = (
        stream_df.writeStream.foreachBatch(_commit)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming query {query_name} did not finish in {timeout_sec}s"
            )
    finally:
        if q.isActive:
            q.stop()


def stateful_profile(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (SURVEY §2.12 extension): maintains a per-key profile — event
    count, first/last event time, distinct event-type count — across
    micro-batches in Arrow-batched pandas state.

    The state is deliberately ORDER-INDEPENDENT (count/min/max/set
    union are commutative monoids), so the converged result equals the
    batch GROUP BY regardless of how the file source slices
    micro-batches — which makes a custom stateful op cross-engine
    oracle-checkable, the same batch-parity contract the window
    aggregates use. Emits the updated profile each batch ("update"
    mode); the caller keeps each key's final row (max event count).

    Scale shape: state is O(keys × event-type-cardinality); per batch
    one shuffle on the key. This is the template for operators the
    built-in windows can't express (per-entity ML feature state,
    CUSUM detectors, dynamic sessionization with business rules).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, cnt long, first_event timestamp, "
        "last_event timestamp, n_event_types int"
    )
    state_schema = "cnt long, first_us long, last_us long, types array<string>"

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            cnt, first_us, last_us, types = state.get
            types = set(types)
        else:
            cnt, first_us, last_us, types = 0, None, None, set()
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            cnt += len(pdf)
            ts = pdf[ts_col]
            mn = int(ts.min().value // 1000)
            mx = int(ts.max().value // 1000)
            first_us = mn if first_us is None else min(first_us, mn)
            last_us = mx if last_us is None else max(last_us, mx)
            types |= set(pdf[type_col].dropna())
        state.update((cnt, first_us, last_us, sorted(types)))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "cnt": [cnt],
                "first_event": [pd.Timestamp(first_us * 1000)],
                "last_event": [pd.Timestamp(last_us * 1000)],
                "n_event_types": [len(types)],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_corpus_dedup(
    stream_df: DataFrame,
    corpus_fingerprints: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact-dedup a document STREAM against a static corpus and within
    itself: fingerprint (md5 of normalized text, same function as batch
    ``exact_dedup``) → stream-static LEFT ANTI join against the corpus
    fingerprint set → stateful first-wins dedup on the fingerprint.

    ``corpus_fingerprints`` is a static frame with one column ``fp``
    (build it once: ``docs.select(fingerprint("text").alias("fp"))
    .distinct()``). Stream-static anti joins are stateless on the
    stream side — the static side is (re)broadcast or shuffled per
    micro-batch, never stored in state. The within-stream dedup is the
    only stateful piece: pass ``ts_col`` to bound its state with
    ``dropDuplicatesWithinWatermark`` (dupes arriving farther apart
    than ``delay`` are then NOT caught — the corpus probe still
    catches re-crawls of anything already accepted); without a
    timestamp the state grows with distinct fingerprints, acceptable
    for AvailableNow backfills only.

    Emits the surviving rows with their ``__fp`` fingerprint column.
    """
    from nyc_taxi_data_ingestion_spark.llm.text import fingerprint

    withfp = stream_df.withColumn("__fp", fingerprint(text_col))
    fresh = withfp.join(
        corpus_fingerprints.withColumnRenamed("fp", "__fp"), "__fp", "left_anti"
    )
    if ts_col is not None:
        return fresh.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["__fp"]
        )
    return fresh.dropDuplicates(["__fp"])


def stream_incremental_dedup(
    stream_df: DataFrame,
    index_path: str,
    survivors_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    timeout_sec: int = 300,
    num_hashes: int = 64,
    bands: int = 16,
) -> None:
    """NEAR-dup dedup of a document stream against an evolving MinHash
    index — the streaming form of ``llm.dedup.incremental_minhash_dedup``,
    via ``foreachBatch``: each micro-batch probes the index as a batch
    frame, appends its survivors to ``survivors_path``, and commits the
    updated index (old index ∪ survivor signatures) back to
    ``index_path``. Sequential-greedy semantics: a doc is dropped iff it
    matches anything accepted before it (earlier batch, the seed corpus,
    or a lower-id doc in its own batch).

    The index update is eagerly materialized (``localCheckpoint``)
    BEFORE the overwrite — its plan reads the very files the overwrite
    replaces. foreachBatch is at-least-once: a retried batch re-appends
    survivors (dedupe downstream on id, or diff epoch ids); the index
    update itself is idempotent because re-probing against the already-
    updated index kills every doc of the replayed batch's duplicates.

    Runs with ``Trigger.AvailableNow`` to completion; production swaps
    in a processing-time trigger and a transactional table format for
    the index commit."""
    from nyc_taxi_data_ingestion_spark.llm.dedup import incremental_minhash_dedup

    def _batch(bdf: DataFrame, _epoch: int) -> None:
        spark = bdf.sparkSession
        try:
            idx = spark.read.parquet(index_path)
        except Exception:
            idx = spark.createDataFrame(
                [], "__id long, __sig array<bigint>"
            )
        survivors, updated = incremental_minhash_dedup(
            bdf,
            idx,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
        )
        updated = updated.localCheckpoint(eager=True)
        survivors.write.mode("append").parquet(survivors_path)
        updated.write.mode("overwrite").parquet(index_path)

    q = (
        stream_df.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"stream_incremental_dedup did not finish in {timeout_sec}s"
            )
    finally:
        if q.isActive:
            q.stop()


def category_drift_scores(
    win_counts: DataFrame,
    baseline: DataFrame,
    cat_col: str,
) -> DataFrame:
    """Score per-window categorical drift against a static baseline —
    the batch tail of a streaming drift monitor: ``win_counts`` is the
    DRAINED tumbling aggregate (window_start, window_end, cat, cnt);
    ``baseline`` is the reference table whose category fractions define
    "normal". Emits one row per (window, baseline category):
    (window_start, window_end, cat, n_events, cnt, base_frac,
    chi2_contrib) with contrib = n_w·(obs_c − p_c)²/p_c; Σ contrib per
    window is the statistic (dof = categories − 1). A category absent
    from a window contributes its full n_w·p_c mass (the Benford-drift
    lesson: absence is the strongest deviation); a streamed category
    unseen in the baseline is excluded from scoring but still counts
    in n_events. Per-category rows, NOT a per-window sum — summing
    doubles across rows is order-dependent across engines (the
    chi_square_drift convention).

    Exactness: counts are exact integers, fractions and contributions
    are rational double arithmetic (no libm) — oracle-comparable.
    Scale shape: baseline fractions are one partial-agg broadcast; the
    spine is |windows|×|categories| (tiny)."""
    base_counts = baseline.groupBy(
        F.col(cat_col).alias("__cat")
    ).agg(F.count("*").alias("__bc"))
    base_tot = base_counts.agg(F.sum("__bc").alias("__bt"))
    base = base_counts.crossJoin(F.broadcast(base_tot)).select(
        "__cat",
        (F.col("__bc") / F.col("__bt").cast("double")).alias("__p"),
    )
    wins = win_counts.select("window_start", "window_end").distinct()
    totals = win_counts.groupBy("window_start", "window_end").agg(
        F.sum("cnt").alias("n_events")
    )
    spine = wins.crossJoin(F.broadcast(base))
    obs = win_counts.select(
        "window_start",
        "window_end",
        F.col(cat_col).alias("__cat"),
        "cnt",
    )
    j = (
        spine.join(obs, ["window_start", "window_end", "__cat"], "left")
        .join(totals, ["window_start", "window_end"])
        .select(
            "window_start",
            "window_end",
            "__cat",
            "n_events",
            "__p",
            F.coalesce("cnt", F.lit(0)).alias("__cnt"),
        )
    )
    obs_frac = F.col("__cnt") / F.col("n_events").cast("double")
    dev = obs_frac - F.col("__p")
    return j.select(
        "window_start",
        "window_end",
        F.col("__cat").alias("cat"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("__cnt").cast("long").alias("cnt"),
        F.col("__p").alias("base_frac"),
        (F.col("n_events") * dev * dev / F.col("__p")).alias(
            "chi2_contrib"
        ),
    )


def stream_agg_state_sink(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    value_col: str,
    query_name: str = "stream_agg_state",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming fold into the MERGEABLE aggregation-mart state
    (operators/incremental): each micro-batch partial-aggregates on
    the mart grain and merges into the on-disk state table — the
    continuously-applied form of ``incremental_agg_state``'s nightly
    pattern, and the foreachBatch answer to unbounded streaming
    aggregation state: the state store holds NOTHING (stateless
    query); all long-lived state is the key-count-sized parquet mart.

    Unlike the upsert sink, a count/sum merge is NOT naturally
    idempotent — replaying a batch after crash recovery would double-
    count. Exactly-once therefore comes from applied-batch-id markers
    that are PUBLISHED ATOMICALLY WITH THE STATE: each fold writes the
    merged state to a temp directory together with its marker set
    (``_applied/`` — underscore-prefixed, so the parquet reader
    ignores it) and a single rename publishes both, leaving no window
    where the data and its marker disagree (a marker beside the state
    would double-count on a crash between the two writes). Batch ids
    are only meaningful within one checkpoint lineage, so the state
    records the lineage id of the checkpoint that built it and a fold
    under a DIFFERENT checkpoint refuses loudly — resume MUST reuse
    the original checkpoint dir (the contract Structured Streaming
    itself imposes; a fresh checkpoint re-lists files under fresh
    batch ids and no marker scheme can map them). On Iceberg/Delta
    the marker becomes the transaction itself. Rewriting the whole
    state per batch is key-count-sized work, not corpus-sized; the
    crash window between the two publish renames is repaired at the
    next fold (old state restored before anything is read).
    """
    import os
    import shutil
    import uuid

    from nyc_taxi_data_ingestion_spark.operators.incremental import (
        merge_agg_states,
        partial_agg_state,
    )
    from nyc_taxi_data_ingestion_spark.sources.sinks import write_partitioned

    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(
        prefix=f"ckpt_{query_name}_"
    )
    lineage_file = os.path.join(checkpoint_dir, "_fold_lineage")
    if os.path.exists(lineage_file):
        with open(lineage_file) as fh:
            lineage = fh.read().strip()
    else:
        lineage = uuid.uuid4().hex
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(lineage_file, "w") as fh:
            fh.write(lineage)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = target_path.rstrip("/")
        tmp, old = base + "__fold_tmp", base + "__fold_old"
        # repair the crash window between the two publish renames
        if not os.path.exists(target_path) and os.path.exists(old):
            os.rename(old, target_path)
        state_lineage = os.path.join(target_path, "_lineage")
        if os.path.exists(target_path):
            have = ""
            if os.path.exists(state_lineage):
                with open(state_lineage) as fh:
                    have = fh.read().strip()
            if have != lineage:
                raise RuntimeError(
                    "stream_agg_state_sink: existing state at "
                    f"{target_path} was built under a different "
                    "checkpoint lineage — resume with the original "
                    "checkpoint dir, or point at a fresh state path."
                )
        marker = os.path.join(target_path, "_applied", str(batch_id))
        if os.path.exists(marker):
            return
        part = partial_agg_state(batch_df, keys, value_col)
        if os.path.exists(target_path):
            state = spark.read.parquet(target_path)
            merged = merge_agg_states([state, part], keys)
        else:
            merged = part
        shutil.rmtree(tmp, ignore_errors=True)
        write_partitioned(merged, tmp, [])
        # markers + lineage ride the same rename as the data
        applied_tmp = os.path.join(tmp, "_applied")
        if os.path.exists(os.path.join(target_path, "_applied")):
            shutil.copytree(
                os.path.join(target_path, "_applied"), applied_tmp
            )
        else:
            os.makedirs(applied_tmp, exist_ok=True)
        with open(os.path.join(applied_tmp, str(batch_id)), "w") as fh:
            fh.write("applied")
        with open(os.path.join(tmp, "_lineage"), "w") as fh:
            fh.write(lineage)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(target_path):
            os.rename(target_path, old)
        try:
            os.rename(tmp, target_path)
        except OSError:
            if os.path.exists(old):
                os.rename(old, target_path)
            raise

    writer = (
        stream_df.writeStream.foreachBatch(_fold)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    q = writer.start()
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming query {query_name} did not finish in {timeout_sec}s"
            )
    finally:
        if q.isActive:
            q.stop()


def running_totals_stream(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, min, max) through Spark 4's
    ``transformWithStateInPandas`` — the NEW arbitrary-stateful API
    (StatefulProcessor + typed state handles) that supersedes
    ``applyInPandasWithState`` (which ``stateful_profile`` keeps
    exercising for coverage of both generations).

    Each micro-batch Arrow-feeds a grouped pandas slice per key; the
    processor folds it into a ValueState struct and EMITS the updated
    running totals stamped with a per-key update sequence — so the
    drained append-mode output carries the state's whole evolution,
    and the final row per key (max ``seq``) must equal the batch
    aggregate over everything ingested. Counts/min/max only: exact in
    IEEE doubles on any engine, so the cross-engine oracle needs no
    decimal machinery. State is one struct per key — mergeable,
    bounded by key cardinality, checkpoint-persisted by the state
    store like any stateful operator.

    ENVIRONMENT GATE: transformWithState's driver/worker protocol
    needs ``google.protobuf`` at runtime (Spark ships the generated
    StateMessage_pb2 but not the protobuf runtime). This sandbox
    lacks it, so the operator raises a clear ImportError here instead
    of a mid-query STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE;
    tests skip via importorskip, and clusters with protobuf installed
    (any real deployment) run it as-is."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the google.protobuf "
            "runtime (pip install protobuf); use "
            "streaming.stateful_profile (applyInPandasWithState) where "
            "protobuf is unavailable"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Running(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n long, mn double, mx double, seq long"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            n = 0
            mn = None
            mx = None
            for pdf in rows:
                n += len(pdf)
                vals = pdf[value_col].dropna()
                if len(vals):
                    bmn, bmx = float(vals.min()), float(vals.max())
                    mn = bmn if mn is None else min(mn, bmn)
                    mx = bmx if mx is None else max(mx, bmx)
            prev = self._agg.get() if self._agg.exists() else None
            if prev is not None:
                pn, pmn, pmx, pseq = prev
            else:
                pn, pmn, pmx, pseq = 0, None, None, 0
            n += pn
            if mn is None:
                mn, mx = pmn, pmx
            elif pmn is not None:
                mn, mx = min(mn, pmn), max(mx, pmx)
            seq = pseq + 1
            self._agg.update((n, mn, mx, seq))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n": [n],
                    "mn": [mn],
                    "mx": [mx],
                    "seq": [seq],
                }
            )

        def close(self) -> None:
            pass

    key_ddl = stream_df.schema[key_col].dataType.simpleString()
    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_Running(),
        outputStructType=(
            f"{key_col} {key_ddl}, n long, mn double, mx double, seq long"
        ),
        outputMode="append",
        timeMode="none",
    )


def snapshot_drain_to_head(
    spark: SparkSession,
    path: str,
    sink,
    *,
    stream_id: str,
    checkpoint_dir: str,
    max_versions_per_trigger: int,
    branch: str | None = None,
    prearm_gate: bool = False,
    timeout_per_window_sec: int = 300,
) -> dict:
    """BOUNDED DRAIN over a snapshot-table backlog — AvailableNow
    semantics done right under a rate limit (r11 verdict item 7, the
    streaming form of the reference's batch Airflow cadence,
    ``nyc_taxi_medallion_dag.py:504-512``): drain exactly to the head
    version observed AT ENTRY, in ``max_versions_per_trigger``-sized
    windows, then stop. Spark's own ``Trigger.AvailableNow`` latches
    ONE ``latestOffset`` per run for a Python stream source, so a
    gated restart drains a single window and terminates with the
    backlog stranded (measured: 6-version backlog, gate 2 → one
    20-row batch, 40 rows never drained). This loop re-runs the
    drain-then-stop query against the SAME checkpoint until the
    table-side admission cursor (``.option('streamId', …)``) reaches
    the entry head — each run is one rate-limited window, restarts
    are exactly-once by the checkpoint/offset log, and commits
    landing AFTER entry stay for the next cadence.

    ``sink`` is a foreachBatch callable ``(batch_df, batch_id)``.
    ``prearm_gate=True`` writes the admission cursor BEFORE the first
    run, so even a FRESH stream's bootstrap is windowed (valid only
    for an all-appends history: a windowed plan across a rewrite
    raises, by the incremental-read contract — leave False to let the
    bootstrap window read the head STATE whole; note an UNGATED
    bootstrap reads the head as of its own run, so a commit racing
    into the gap between entry and the first run rides along — only
    gated windows are clamped to the entry head). Returns
    {"windows" (cursor-advancing runs), "runs", "head_at_entry",
    "drained_to"}."""
    from nyc_taxi_data_ingestion_spark.sources import snapshots as _S
    from nyc_taxi_data_ingestion_spark.sources.pydatasource import (
        SnapshotStreamReader,
        _read_cursor_hint,
        _write_cursor_hint,
        register_snapshot_stream,
    )

    register_snapshot_stream(spark)
    hint_path = SnapshotStreamReader(
        path, stream_id=stream_id
    )._cursor_hint_path()

    head_at_entry = (
        _S._branch_head(path, branch)
        if branch is not None
        else _S.current_version(path)
    )
    if head_at_entry is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    if prearm_gate and _read_cursor_hint(hint_path) is None:
        # shared writer: atomic (a torn hint would read as 'no hint'
        # and UN-GATE the next run — the unbounded window this
        # function exists to prevent) and monotonic
        _write_cursor_hint(hint_path, 0)

    windows = runs = 0
    while True:
        cur = _read_cursor_hint(hint_path)
        if cur is not None and cur >= head_at_entry:
            break
        # clamp the per-run gate to the ENTRY head: latestOffset gates
        # against head-NOW, so a post-entry commit inside hint+gate
        # would otherwise be drained this cadence in violation of the
        # documented contract (r12 review) — min(gate, remaining)
        # makes the final window stop exactly at head_at_entry
        gate = max_versions_per_trigger
        if cur is not None:
            gate = max(1, min(gate, head_at_entry - cur))
        reader = (
            spark.readStream.format("snapshot_stream")
            .option("path", path)
            .option("maxVersionsPerTrigger", str(gate))
            .option("streamId", stream_id)
        )
        if branch is not None:
            reader = reader.option("branch", branch)
        q = (
            reader.load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout_per_window_sec):
                raise TimeoutError(
                    f"drain window did not finish in "
                    f"{timeout_per_window_sec}s"
                )
        finally:
            if q.isActive:
                q.stop()
        runs += 1
        new_cur = _read_cursor_hint(hint_path)
        if new_cur != cur and new_cur is not None:
            # windows = runs that ADVANCED the cursor (AvailableNow
            # latches one gated window per run); recentProgress is
            # capped at ~100 entries and emits no-data events, so it
            # both over- and under-counts (r12 review)
            windows += 1
        if new_cur == cur:
            if cur is None:
                # no hint and the run planned nothing: the checkpoint
                # cursor already sits at the head (hint deleted or
                # never written) — nothing to drain
                break
            # hint stale-behind the checkpoint (a swallowed hint-write
            # failure leaves the checkpoint committed past the hint):
            # Spark planned no batch because the gated end sits at or
            # below the committed offset, which also proves the
            # checkpoint is >= cur + gate — so walking the hint
            # forward one gate per no-progress run is SAFE (it can
            # never admit a window wider than the gate) and SELF-HEALS
            # instead of failing this healthy checkpoint forever
            # (r12 review); the loop still terminates: the hint
            # strictly advances toward the entry head every pass
            _write_cursor_hint(
                hint_path,
                min(head_at_entry, cur + max_versions_per_trigger),
            )
    return {
        "windows": windows,
        "runs": runs,
        "head_at_entry": head_at_entry,
        "drained_to": _read_cursor_hint(hint_path),
    }
