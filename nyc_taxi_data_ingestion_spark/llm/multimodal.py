"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real — binary payload schema, Arrow-batched
``mapInPandas`` pipelines, partition-size control for large blobs. The
codec step itself (JPEG decode, audio resample, frame sampling) is
STUBBED: the decode libraries are not in this environment, so
``decode_fn`` defaults to a clearly-marked deterministic fake that
produces byte-level features. Swap in a real decoder (PIL/librosa/
pyav) by passing ``decode_fn``.

Scale notes: binary payloads make rows big — the reader should set
``spark.sql.files.maxPartitionBytes`` low enough that a batch of blobs
fits executor memory, and mapInPandas batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it small, e.g.
64, for >1 MB blobs).
"""

from __future__ import annotations

import hashlib
import logging
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark's Python workers don't necessarily have this package on their
# path (the driver may add it via sys.path only). Register this module
# for by-value cloudpickle serialization so mapInPandas closures ship
# their code instead of an import reference.
try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older pickler without the API
    pass

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, byte_len int, sha256 string, "
    "feature array<double>"
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat a text table as binary media (utf-8 payload) so
    the multimodal plumbing is exercisable on the synthetic testdata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _stub_decode(payload: bytes, media_type: str) -> list[float]:
    """STUB decoder — deterministic fake features from raw bytes.

    A real deployment replaces this with e.g. PIL.Image.open +
    resize + channel means. Raises for unknown media types the same
    way a real codec dispatch would.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    if payload is None:
        return []
    # 8 bucket-mean byte histograms — stable, cheap, codec-free
    buckets = [0.0] * 8
    counts = [0] * 8
    for i, b in enumerate(payload):
        buckets[i % 8] += b
        counts[i % 8] += 1
    return [buckets[i] / counts[i] if counts[i] else 0.0 for i in range(8)]


def extract_features(
    media: DataFrame,
    decode_fn=_stub_decode,
    batch_hint: int | None = 64,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The mapInPandas shape (iterator of batches in, iterator out) is the
    real production plumbing: decode happens executor-side, vectorized
    per Arrow batch, with bounded memory. ``batch_hint`` bounds the
    number of rows decoded/held per output batch inside the worker
    (the incoming Arrow batch size stays at the session default; for
    genuinely multi-MB blobs also lower
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` at session setup —
    we deliberately do NOT mutate the live session conf here, since
    mapInPandas is lazy and a set-here would leak to every later Arrow
    operation in the session).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        step = batch_hint or 1024
        for pdf in batches:
            for lo in range(0, len(pdf), step):
                chunk = pdf.iloc[lo : lo + step]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "media_type": chunk["media_type"],
                        "byte_len": [
                            len(p) if p is not None else 0
                            for p in chunk["payload"]
                        ],
                        "sha256": [
                            hashlib.sha256(p).hexdigest() if p is not None else None
                            for p in chunk["payload"]
                        ],
                        "feature": [
                            decode_fn(p, mt)
                            for p, mt in zip(chunk["payload"], chunk["media_type"])
                        ],
                    }
                )

    spark = media.sparkSession
    # one Python worker per core — a single-file source would otherwise
    # feed one serial worker
    media = media.repartition(spark.sparkContext.defaultParallelism)
    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-expression metadata pass (no Python): byte length + md5 —
    the checks a pipeline runs BEFORE spending decode cycles."""
    return media.select(
        "media_id",
        "media_type",
        F.length("payload").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
    )


def media_shard_pack(
    media: DataFrame,
    budget_bytes: int,
    type_col: str = "media_type",
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Pack media blobs into ~``budget_bytes`` training shards per
    media type, in (type, id) order — the byte-budget twin of
    llm/curation.token_shards for multimodal rows, where shard size is
    bounded by PAYLOAD bytes, not token counts (a webdataset/tar-shard
    builder's partitioning decision). shard_id = floor(prefix bytes
    before this row / budget); deterministic; shards overshoot by at
    most one blob (exact greedy bin-packing is inherently sequential —
    prefix-sum binning is the standard distributed relaxation).

    Scale shape: the per-type running byte sum is
    ``partitioned_prefix_sum``'s two-pass bucketed scan — a
    type-partitioned WINDOW would put each media type in one task
    (there are a handful of types over a 100 TB media corpus, and in
    this repo's adapter the type is a constant the optimizer folds to
    a literal SinglePartition window — the plan-audit sweep caught
    exactly that). Payloads are untouched: the sum runs over the byte
    LENGTH column. Like token_shards, ``id_col`` must be numeric
    (the boundary sketch needs ordered arithmetic); string ids
    (URLs, content hashes) need a numeric surrogate upstream —
    raised as a clear ValueError."""
    from nyc_taxi_data_ingestion_spark.operators.transform import (
        partitioned_prefix_sum,
    )

    counted = media.withColumn(
        "byte_len", F.length(payload_col).cast("long")
    )
    return partitioned_prefix_sum(
        counted, [type_col], id_col, "byte_len", "__before"
    ).withColumn(
        "shard_id",
        F.floor(F.col("__before") / F.lit(budget_bytes)).cast("int"),
    ).drop("__before")


FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms int, frame_len int, frame_hex string"
)


def sample_frames(
    media: DataFrame,
    chunk_bytes: int = 512,
    every_ms: int = 1000,
    frame_fn=None,
    batch_hint: int | None = 64,
) -> DataFrame:
    """Frame sampling — the 1:N multimodal plumbing shape (one video in,
    many frames out) via ``mapInPandas``, which a groupBy/explode can't
    express for a Python codec. ``frame_fn(payload) -> list[bytes]`` is
    the real-decoder hook (pyav keyframe extraction); the default STUB
    slices fixed ``chunk_bytes`` windows as fake frames. Frames are
    hex-encoded so the stub's output is cross-engine verifiable (the
    oracle reproduces the slices with substr over hex(payload)).

    Empty/NULL payloads produce no frames (a real demuxer's behavior).
    """

    def frames_of(p: bytes) -> list[bytes]:
        n = max(1, -(-len(p) // chunk_bytes))
        return [
            bytes(p[k * chunk_bytes : (k + 1) * chunk_bytes]) for k in range(n)
        ]

    cut = frame_fn or frames_of

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        step = batch_hint or 1024
        for pdf in batches:
            for lo in range(0, len(pdf), step):
                chunk = pdf.iloc[lo : lo + step]
                out: dict[str, list] = {
                    "media_id": [], "frame_idx": [], "ts_ms": [],
                    "frame_len": [], "frame_hex": [],
                }
                for mid, p in zip(chunk["media_id"], chunk["payload"]):
                    if p is None or len(p) == 0:
                        continue
                    for k, fr in enumerate(cut(p)):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(k)
                        out["ts_ms"].append(k * every_ms)
                        out["frame_len"].append(len(fr))
                        out["frame_hex"].append(fr.hex().upper())
                if out["media_id"]:
                    yield pd.DataFrame(out)

    spark = media.sparkSession
    media = media.repartition(spark.sparkContext.defaultParallelism)
    return media.mapInPandas(op, schema=FRAME_SCHEMA)


def resize_media(
    media: DataFrame,
    target_bytes: int = 256,
    target_width: int = 224,
    target_height: int = 224,
    resize_fn=None,
) -> DataFrame:
    """Resize — binary-in/binary-out mapInPandas plumbing with updated
    typed metadata. ``resize_fn(payload) -> bytes`` is the real-codec
    hook (PIL thumbnail + re-encode); the default STUB truncates or
    zero-pads to ``target_bytes``. Schema is preserved (MEDIA_SCHEMA),
    so resized output feeds every downstream media operator unchanged.
    """

    def shrink(p: bytes) -> bytes:
        return bytes(p[:target_bytes]) + b"\x00" * max(0, target_bytes - len(p))

    fn = resize_fn or shrink

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                fn(p) if p is not None else None for p in pdf["payload"]
            ]
            pdf["width"] = pd.array(
                [target_width if p is not None else None for p in pdf["payload"]],
                dtype="Int32",
            )
            pdf["height"] = pd.array(
                [target_height if p is not None else None for p in pdf["payload"]],
                dtype="Int32",
            )
            yield pdf

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


def media_exact_dedup(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact multimodal dedup: keep the min-id row per payload digest —
    the first pass every image/audio corpus gets before any perceptual
    hashing (crawls are full of byte-identical re-hosted assets).
    Digest is md5 over the RAW BYTES (no decode); NULL payloads (fetch
    failures) are not each other's duplicates and pass through. This
    is llm/dedup.exact_dedup keyed on bytes — see its docstring for
    the shuffle contract (digest-sized grouping; the survivor
    semi-join co-locates by id and is exchange-free on an id-bucketed
    table). Perceptual near-dup (pHash over the decode stub) is the
    layered next step, exactly like MinHash over exact text dedup."""
    from nyc_taxi_data_ingestion_spark.llm.dedup import exact_dedup

    return exact_dedup(
        media,
        id_col=id_col,
        fingerprint_col=F.md5(F.col(payload_col)),
    )


def media_phash_near_dup(
    media: DataFrame,
    tau: float = 2.0,
    decode_fn=_stub_decode,
    dims: int | None = None,
) -> DataFrame:
    """Perceptual near-duplicate pairs over decoded features — the
    layered step AFTER :func:`media_exact_dedup` (byte-identical) that
    catches re-encoded/resized copies byte hashing cannot. Returns
    (id_a, id_b, dist) with id_a < id_b and dist = L∞ distance over
    the feature vector ≤ ``tau``.

    Pipeline: Arrow-batched decode (:func:`extract_features`; the
    codec is the documented stub — 8 byte-bucket means — swapped for a
    real pHash/embedding in deployment) → corpus-mean sign
    quantization into a perceptual hash → candidates join ON THE HASH
    BUCKET (features never self-join all-pairs) → exact L∞ verify on
    candidates only. Identical sign patterns are necessary for small
    L∞ distance *around the quantization boundary*, so the bucket join
    is a high-recall candidate generator for near-identical media, not
    a guarantee — the standard perceptual-hash contract.

    Scale shape: everything after decode is an 8-double narrow table;
    the bucket self-join is AQE-skew-split on hot hashes. With real
    higher-dimensional features, band the sign bits like
    llm/dedup.simhash (multiple bucket tables, OR of candidates)
    instead of one equality join."""
    feats = extract_features(media, decode_fn=decode_fn).select(
        "media_id", "media_type", "feature"
    ).where(F.size("feature") > 0).localCheckpoint(eager=True)
    if dims is None:
        # pick the feature width DETERMINISTICALLY: the modal width,
        # ties broken toward the wider vector — never an arbitrary
        # .first() row, whose width class would flip with partition
        # order when a per-type decoder mixes dimensionalities
        # one small collect (≤ distinct widths rows) yields both the
        # modal width and the dropped total — no second full pass over
        # the checkpointed features just for the warning message
        widths = (
            feats.groupBy(F.size("feature").alias("__w"))
            .count()
            .orderBy(F.desc("count"), F.desc("__w"))
            .collect()
        )
        if not widths:  # empty corpus / all-NULL payloads -> no pairs
            return media.sparkSession.createDataFrame(
                [], "id_a long, id_b long, dist double"
            )
        dims = widths[0]["__w"]
        dropped = sum(r["count"] for r in widths[1:])
        if dropped:
            logging.getLogger(__name__).warning(
                "media_phash_near_dup: dropping %d rows whose feature "
                "width != modal width %d (mixed-dimensionality "
                "decode_fn; pass dims= to pick a width explicitly)",
                dropped,
                dims,
            )
    # decode_fn must be fixed-width per corpus; rows with a different
    # width (a per-type decoder mixing dimensionalities) are dropped
    # EXPLICITLY rather than silently null-hashing on missing indices
    feats = feats.where(F.size("feature") == dims)
    means = feats.agg(
        *[F.avg(F.col("feature")[i]).alias(f"__m{i}") for i in range(dims)]
    )
    # sign bits packed into 32-bit BANDS (an array of small longs):
    # one 2**i weight per dimension overflows LongType at 64+ dims —
    # exactly the width of a real pHash/embedding
    bands = []
    for lo in range(0, dims, 32):
        b = None
        for i in range(lo, min(lo + 32, dims)):
            bit = (F.col("feature")[i] > F.col(f"__m{i}")).cast(
                "long"
            ) * F.lit(2 ** (i - lo))
            b = bit if b is None else b + bit
        bands.append(b)
    hashed = feats.crossJoin(F.broadcast(means)).select(
        "media_id", "media_type", "feature", F.array(*bands).alias("__ph")
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    cand = a.join(
        b,
        (F.col("a.__ph") == F.col("b.__ph"))
        & (F.col("a.media_type") == F.col("b.media_type"))
        & (F.col("a.media_id") < F.col("b.media_id")),
    )
    dist = F.greatest(
        *[
            F.abs(F.col("a.feature")[i] - F.col("b.feature")[i])
            for i in range(dims)
        ]
    )
    return cand.select(
        F.col("a.media_id").alias("id_a"),
        F.col("b.media_id").alias("id_b"),
        dist.alias("dist"),
    ).filter(F.col("dist") <= tau)
