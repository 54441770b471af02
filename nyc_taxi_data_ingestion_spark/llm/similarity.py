"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH-bucketed variant as the scale path. Dot products are
JVM-side ``zip_with`` + ``aggregate`` expressions (no Python), and the
hyperplanes are generated deterministically from a seed so results are
reproducible across runs and engines.

Scale design:
- brute force is O(Q·N) — correct tool only when one side broadcasts;
  the query side is broadcast explicitly here.
- LSH reduces the candidate set to same-bucket pairs; signature
  computation is a narrow map; only (bucket, id, vec) shuffles.
- IVF (``ivf_topk``): k-means centroids trained on a bounded
  deterministic sample driver-side (how production IVF indexes train at
  any scale), then distributed Arrow-batched cell assignment and a
  cell-key equi-join — only probed cells are scored.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double — deterministic
    summation order (matches DuckDB's ``list_reduce`` fold exactly).

    Deliberately the higher-order-function form, NOT an unrolled
    64-term add chain: measured head-to-head on the sf0.1 pair join,
    the unrolled expression blows past codegen method limits and falls
    back to a 64-deep interpreted Add tree (12 s) while the HOF's tight
    internal loop does the same work in 2.4 s."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _fold_dot_rows(a, b):
    """Per-row fallback for :func:`_pair_dot`: replicates the
    ``zip_with`` + left-fold semantics exactly — a length mismatch or
    any NULL (list or element) poisons the fold to NULL, otherwise the
    products accumulate sequentially in double."""
    out = []
    for va, vb in zip(a, b):
        if va is None or vb is None or len(va) != len(vb) or any(
            x is None for x in va
        ) or any(x is None for x in vb):
            out.append(None)
            continue
        acc = 0.0
        for x, y in zip(va, vb):
            acc = acc + float(x) * float(y)
        out.append(acc)
    return out


def _list_matrix(arr):
    """(n, d) float64 matrix from an Arrow list-of-float array, or
    None when the batch needs the per-row fallback (nulls anywhere, or
    rows of differing length)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        return None
    if isinstance(arr, pa.FixedSizeListArray):
        flat = arr.values
        d = arr.type.list_size
    else:
        off = np.asarray(arr.offsets)
        lens = np.diff(off)
        if lens.size and not (lens == lens[0]).all():
            return None
        d = int(lens[0]) if lens.size else 0
        flat = arr.flatten()
    if flat.null_count:
        return None
    m = np.asarray(flat).astype(np.float64, copy=False)
    if m.size != len(arr) * d:
        return None
    return m.reshape(len(arr), d if d else 0)


def _pair_dot_arrays(a, b):
    """Arrow-batch pair dot with the EXACT left-fold accumulation
    order of :func:`_dot` — float→double casts are exact, each product
    is one IEEE double multiply, and the accumulator adds products in
    ascending index order (64 vectorized column adds, sequential per
    row), so the result is bit-identical to the JVM fold and to
    DuckDB's ``list_reduce`` oracle twin."""
    ma, mb = _list_matrix(a), _list_matrix(b)
    if ma is None or mb is None or ma.shape != mb.shape:
        return pa.array(_fold_dot_rows(a.to_pylist(), b.to_pylist()),
                        type=pa.float64())
    prod = ma * mb
    acc = np.zeros(len(ma), dtype=np.float64)
    for j in range(prod.shape[1]):
        acc += prod[:, j]
    return pa.array(acc, type=pa.float64())


def _make_pair_dot():
    from pyspark.sql.types import DoubleType

    # a DataType instance, not a DDL string: the module imports before
    # any SparkSession exists and string return types parse through the
    # active session
    @F.arrow_udf(DoubleType())
    def pair_dot(a: pa.Array, b: pa.Array) -> pa.Array:
        return _pair_dot_arrays(a, b)

    # nondeterministic marking (guide §4.4): the near-dup sites project
    # the cosine AND filter on it, and the optimizer's pushed filter
    # duplicated the ArrowEvalPython node — every candidate pair paid
    # the Python boundary twice (measured 2x wall on
    # embedding_near_dup_exact). The function is pure; the marking only
    # stops the optimizer from copying it below its own filter.
    return pair_dot.asNondeterministic()


# vectorized exact-fold pair dot (guide §4): same math as _dot, batched
# through numpy instead of per-row HOF interpretation. Use on PER-PAIR
# frames (post-join), where the fold is the stage's CPU.
_pair_dot = _make_pair_dot()


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query side, score every corpus
    vector, rank per query. Returns (query_id, neighbor_id, cosine_sim,
    rank). Deterministic tie-break on neighbor id."""
    from pyspark.sql import Window

    # norms once per VECTOR, not once per pair (r13): cosine(q, c)
    # inlined three d-element folds into the O(Q·N) pair stage; the
    # same sqrt(dot(v, v)) computed on each side before the cross join
    # is bit-identical (identical fold, identical sqrt) and leaves one
    # vectorized exact-fold dot per pair (guide §4). Per-side norms
    # stay the JVM fold: they are O(N) not O(Q·N), and an Arrow stage
    # inside the broadcast build measured as pure overhead.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    # small single-file corpora scan as ONE partition; round-robin so
    # the O(Q·N) scoring uses every core (queries side broadcasts)
    c = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _pair_dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (Gaussian via numpy, seeded)."""
    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for random-hyperplane LSH: bit i = 1 if
    vec·plane_i >= 0. Returns a BIGINT bucket key (≤ 63 planes)."""
    bits = [
        F.when(
            _dot(vec_col, F.array(*[F.lit(float(x)) for x in plane])) >= 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def _table_buckets(
    vec_col: Column, dim: int, num_planes: int, num_tables: int, seed: int
) -> Column:
    """Array of (table, bucket) structs — one sign bucket per hash
    table, each table drawing independent hyperplanes from the seed.

    Pure-JVM expression form. Prefer ``table_buckets_arrow`` in hot
    paths: inlining num_tables × num_planes × dim float literals makes
    the plan itself expensive (~2 s of analysis/codegen per fresh plan
    measured at 8×4×64) on top of the interpreted per-row fold."""
    entries = []
    for t in range(num_tables):
        planes = hyperplanes(dim, num_planes, seed + t)
        entries.append(
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(vec_col, planes).alias("bucket"),
            )
        )
    return F.array(*entries)


def table_buckets_arrow(dim: int, num_planes: int, num_tables: int, seed: int):
    """Arrow-batched bucket assignment: all num_tables × num_planes
    plane projections in one numpy matmul per batch. Returns a
    pandas_udf mapping the vector column to an array of bucket keys,
    one per hash table (pair with ``posexplode`` → (table, bucket)).

    This is the narrow-map scale path: the plane matrix lives in the
    UDF closure (shipped once per executor), batches stream through
    Arrow, and per-vector cost is a (1 × dim) · (dim × T·p) product."""
    planes = np.vstack(
        [np.asarray(hyperplanes(dim, num_planes, seed + t)) for t in range(num_tables)]
    )  # (num_tables·num_planes, dim)
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        signs = (x @ planes.T) >= 0.0  # (n, T·p)
        keys = (signs.reshape(len(vs), num_tables, num_planes) * weights).sum(axis=2)
        return pd.Series(list(keys))

    return buckets


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH sign bucket in
    at least one of `num_tables` hash tables (OR-amplification — recall
    1-(1-p^b)^L vs p^b for one table). Fewer planes → bigger buckets →
    higher recall & cost; more tables → higher recall, ×L candidate
    generation. Same output schema as brute_force_topk."""
    from pyspark.sql import Window

    bk = table_buckets_arrow(dim, num_planes, num_tables, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
        F.posexplode(bk(F.col(vec_col))).alias("table", "bucket"),
    )
    c = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
        F.posexplode(bk(F.col(vec_col))).alias("table", "bucket"),
    )
    # distinct before scoring: a pair colliding in 3 tables scores once;
    # norms are computed once per VECTOR above, not once per pair
    cand = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "q_vec", "c_vec", "q_norm", "c_norm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        # vectorized exact-fold dot (guide §4)
        (_pair_dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH
    buckets + exact cosine verify. Returns (id_a, id_b,
    cosine_sim ≥ threshold), each pair once.

    Shuffle discipline (the 100 TB contract): the bucket self-join and
    the cross-table pair dedup move ONLY (table, bucket, id) and
    (id_a, id_b) tuples — never vectors. Vectors and their
    once-per-vector norms are attached to the deduped candidate list
    by two id equi-joins afterwards (auto-broadcast when the vector
    table is small; AQE picks a shuffle-hash join at scale). The
    earlier form carried two 64-float vectors through the dedup
    shuffle — ~60× more shuffle bytes per candidate pair.

    Recall/cost dial: p(collide|cos s) = (1 − arccos(s)/π)^planes per
    table, OR-amplified over tables; fewer planes → higher recall AND
    more noise candidates. For true near-dup thresholds (≥0.9) use
    12-16 planes; moderate thresholds need fewer planes and pay a
    higher candidate rate.

    The (id, table, bucket) assignment is eagerly checkpointed before
    the self-join: it is N·num_tables scalar rows (≪ the vectors), and
    without it each join leg re-runs the scan + Arrow bucket UDF —
    the assignment stage would execute twice."""
    bk = table_buckets_arrow(dim, num_planes, num_tables, seed)
    ids = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col).alias("__id"),
        F.posexplode(bk(F.col(vec_col))).alias("table", "bucket"),
    ).localCheckpoint(eager=True)
    a, b = ids.alias("a"), ids.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = df.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__vec"),
        _norm(F.col(vec_col)).alias("__nrm"),
    )
    va = vecs.withColumnsRenamed({"__vid": "id_a", "__vec": "__va", "__nrm": "__na"})
    vb = vecs.withColumnsRenamed({"__vid": "id_b", "__vec": "__vb", "__nrm": "__nb"})
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            # vectorized exact-fold dot (guide §4): the verify stage's
            # CPU is one fold per candidate pair — Arrow-batched numpy
            # does the same double arithmetic in the same order
            (_pair_dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


# -- IVF (inverted-file) ANN --------------------------------------------------


def auto_num_cells(n_rows: int, lo: int = 16, hi: int = 4096) -> int:
    """IVF cell count for an ``n_rows`` corpus: ⌈√N⌉ clamped to
    [lo, hi] — the standard IVF sizing (FAISS guidance is K ∈
    [4√N, 16√N]; the conservative 1·√N end keeps training-sample needs
    modest). With cells ∝ √N, per-query candidate work
    |corpus|·nprobe/cells grows as √N instead of linearly, so total
    search work scales N^1.5 rather than N² when both sides grow —
    a FIXED cell count is the measured 10×-data → 100×-work cliff
    (docs/SCALE.md knn row). The clamp floor keeps tiny corpora from
    degenerating to one cell per row; the ceiling bounds the centroid
    matrix every query batch scores against (4096 × dim doubles ≈ a
    few MB broadcast)."""
    import math

    if n_rows <= 1:
        return lo
    return max(lo, min(hi, math.isqrt(n_rows - 1) + 1))


def auto_nprobe(num_cells: int, lo: int = 8) -> int:
    """Probe count for an IVF index with ``num_cells`` cells:
    max(lo, ⌈√cells⌉), capped at the cell count. The FAISS-practice
    regime: for CLUSTERED data (the production case) recall at a
    given nprobe degrades only slowly as nlist grows, because true
    neighbors concentrate in the query's few nearest cells — so nprobe
    grows ~N^(1/4) while candidate volume stays
    N·nprobe/cells ≈ nprobe·√N, sublinear. The honest caveat, gated
    in tests: on near-UNIFORM vectors (no cluster structure — the
    worst case for any cell-based index) recall tracks the probed
    FRACTION nprobe/cells, which this rule lets fall as corpora grow;
    callers on unstructured data should pass nprobe explicitly (or use
    the exact path) rather than inherit a silent recall slide."""
    import math

    if num_cells <= 1:
        return 1
    return min(num_cells, max(lo, math.isqrt(num_cells - 1) + 1))


def _train_sample_matrix(
    corpus: DataFrame,
    n: int,
    vec_col: str,
    id_col: str,
    seed: int,
) -> "np.ndarray":
    """The shared deterministic training sample: the ``n`` lowest
    xxhash64(id, seed) vectors as an ORDERED float64 matrix (ascending
    (hash, id) — a prefix slice of a larger collect is therefore
    bit-identical to a smaller collect, which is what lets composed
    indexes like IVFADC collect the sample ONCE and hand each trainer
    its own prefix instead of running two identical sort+limit jobs)."""
    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        .orderBy(F.xxhash64(F.col("i"), F.lit(seed)), F.col("i"))
        .limit(n)
        .collect()
    )
    return np.asarray([np.asarray(r.v, dtype=np.float64) for r in rows])


def _centroid_sample_size(num_cells: int, sample: int = 10_000) -> int:
    """train_centroids' widened training-sample size — ONE definition
    shared by the trainer and composed callers (ivfpq_topk,
    build_ann_index), so a formula change can never silently under-ask
    the shared sample and lose the one-collect optimization (r12
    ADVICE)."""
    return max(sample, min(39 * num_cells, 200_000))


def _shared_sample(
    corpus: DataFrame, n: int, vec_col: str, id_col: str, seed: int
) -> tuple["np.ndarray", int, int, str, str]:
    """``(matrix, n_asked, seed, vec_col, id_col)`` for trainers'
    ``sample_x``: the ASKED size lets a trainer distinguish a
    corpus-exhausted collect (fewer rows back than asked — its prefix
    is still exactly the trainer's own collect) from an under-asked
    one (caller's size formula drifted below the trainer's — unsafe,
    fall back); the provenance triple (seed, vec_col, id_col) lets the
    trainer REJECT a sample collected from different parameters
    outright (r12 ADVICE — the size guard alone cannot catch that
    misuse class)."""
    return (
        _train_sample_matrix(corpus, n, vec_col, id_col, seed),
        n,
        seed,
        vec_col,
        id_col,
    )


def _sample_prefix(sample_x, sample, vec_col, id_col, seed):
    """The trainer-side sample_x contract: returns the bit-identical
    prefix matrix, or None when the trainer must do its own collect.
    Mismatched provenance raises — a sample from different parameters
    is wrong DATA, not a missed optimization."""
    if sample_x is None:
        return None
    if tuple(sample_x[2:]) != (seed, vec_col, id_col):
        raise ValueError(
            f"sample_x was collected with (seed, vec_col, id_col)="
            f"{tuple(sample_x[2:])} but the trainer wants "
            f"{(seed, vec_col, id_col)} — training on it would use the "
            "wrong data."
        )
    if sample_x[1] < sample:
        # under-asked: a short prefix would silently train on fewer
        # rows than a direct call — correctness over the saved job.
        # (A corpus-exhausted collect is fine: asked >= sample means
        # the prefix equals the trainer's own collect exactly.)
        return None
    return sample_x[0][:sample]


def train_centroids(
    corpus: DataFrame,
    num_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    sample_x: "tuple[np.ndarray, int] | None" = None,
) -> "np.ndarray":
    """Lloyd's k-means on a bounded deterministic sample, driver-side.

    IVF indexes train centroids on a sample at every scale (FAISS
    trains on ~max(10k, 256·cells) vectors even for billion-vector
    indexes) — the distributed part of IVF is assignment, not training.
    The sample is the `sample` lowest xxhash64(id, seed) rows: stable
    under partitioning, re-runs, and engine versions. When
    ``num_cells`` is large (auto-sized √N corpora), the sample widens
    to FAISS's ~39 points/centroid floor, capped at 200k rows so the
    driver-side collect stays bounded (200k × 64-dim doubles ≈ 100 MB)
    — callers passing ``num_cells <= 256`` see the historical 10k
    sample unchanged (oracle-twin stability).

    ``sample_x``: a ``_shared_sample`` ``(matrix, n_asked)`` pair
    collected with n_asked >= this trainer's widened sample size; its
    prefix slice is bit-identical to this function's own collect, so
    composed callers (``ivfpq_topk``) skip a duplicate sort+limit
    job. An under-asked pair is ignored (own collect)."""
    sample = _centroid_sample_size(num_cells, sample)
    x = _sample_prefix(sample_x, sample, vec_col, id_col, seed)
    if x is None:
        x = _train_sample_matrix(corpus, sample, vec_col, id_col, seed)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(num_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = _assign_nearest(x, cent)
        cent = _centroid_update(x, assign, cent)
    return cent


def _assign_nearest(x: "np.ndarray", cent: "np.ndarray") -> "np.ndarray":
    """Nearest-centroid assignment via the expanded-norm matmul
    ``argmin ||c||² − 2x·c`` (||x||² is pair-invariant) — one BLAS
    call instead of an (n, k, d) broadcast temporary (the temporary
    was 50x slower and dominated PQ index build time)."""
    c2 = (cent**2).sum(axis=1)
    # einsum, not `x @ cent.T`: this container's OpenBLAS loses ~15 ms
    # of thread-pool latency per call on matrices this small (measured
    # 17 ms/matmul vs 5 ms/einsum for (2000,4)x(4,256)), and PQ training
    # makes m·iters of these calls
    return (c2[None, :] - 2.0 * np.einsum("ns,ks->nk", x, cent)).argmin(axis=1)


def _centroid_update(
    x: "np.ndarray", assign: "np.ndarray", cent: "np.ndarray"
) -> "np.ndarray":
    """Mean-update step as one scatter-add + bincount — replaces the
    per-centroid boolean-mask scan (k passes over the sample)."""
    k = len(cent)
    counts = np.bincount(assign, minlength=k)
    sums = np.stack(
        [
            np.bincount(assign, weights=x[:, d], minlength=k)
            for d in range(x.shape[1])
        ],
        axis=1,
    )
    out = cent.copy()
    nz = counts > 0
    out[nz] = sums[nz] / counts[nz, None]
    return out


def _nearest_cells_udf(cent: "np.ndarray", nprobe: int):
    """pandas_udf: vector -> array of the nprobe nearest centroid ids
    (L2), Arrow-batched matmul against the centroid matrix."""
    c2 = (cent**2).sum(axis=1)  # ||c||² per centroid

    @F.pandas_udf("array<int>")
    def cells(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        # argmin ||x-c||² = argmin ||c||² - 2x·c  (||x||² is pair-invariant)
        d = c2[None, :] - 2.0 * (x @ cent.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    return cells


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int | None = None,
    nprobe: int | None = None,
    seed: int = 42,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via an IVF index: corpus vectors live in
    their nearest-centroid cell; each query scores only its `nprobe`
    nearest cells. Recall/cost dial is nprobe/num_cells (nprobe =
    num_cells ⇒ exact). Same output schema as brute_force_topk.

    ``num_cells=None`` (default) derives :func:`auto_num_cells`
    (⌈√N⌉, clamped) from one ``corpus.count()`` — callers that already
    hold the count (or need reproducible cell geometry across corpora,
    e.g. oracle twins) pass it explicitly and skip the count job.

    Scale shape: training is sample-bounded; assignment is a narrow
    Arrow-batched map; the only wide op is the (cell)-keyed equi-join,
    so cost is |corpus|·nprobe/num_cells candidate rows, not |Q|·|N|;
    with cells ∝ √N that candidate volume grows √N-fold, not N-fold.

    ``broadcast_queries`` hints the exploded query frame broadcast-able
    (right for the interactive small-Q case, where in-memory frames may
    carry no size stats). Pass False when the query side is
    corpus-proportional — e.g. label propagation over a whole corpus —
    so the cell join stays a size-aware equi-join (AQE still
    auto-broadcasts if the side turns out small; an unconditional hint
    would OOM a 1000-executor cluster on a corpus-sized build side)."""
    from pyspark.sql import Window

    if num_cells is None:
        num_cells = auto_num_cells(corpus.count())
    if nprobe is None:
        nprobe = auto_nprobe(num_cells)
    cent = train_centroids(
        corpus, num_cells=num_cells, vec_col=vec_col, id_col=id_col, seed=seed
    )
    assign1 = _nearest_cells_udf(cent, 1)
    probe = _nearest_cells_udf(cent, nprobe)
    c = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    # spread the QUERY side too (r12): when the query frame is a
    # corpus-proportional slice of a single-file table, its scan is
    # one task and the nprobe-cell probe UDF + explode serialize onto
    # one core (measured: a 4 s single-task stage in knn_label_prop
    # while 31 cores idled). Conditional — a multi-partition query
    # frame at real scale pays no extra shuffle.
    from nyc_taxi_data_ingestion_spark.llm.dedup import spread

    q = spread(queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q) if broadcast_queries else q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                # vectorized exact-fold dot (guide §4)
                _pair_dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# -- PQ (product quantization) ANN -------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    nbits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    sample_x: "tuple[np.ndarray, int] | None" = None,
) -> "np.ndarray":
    """Per-subspace k-means codebooks for product quantization:
    shape (m, 2^nbits, d/m). Trained driver-side on the same bounded
    deterministic sample contract as ``train_centroids`` (FAISS trains
    PQ codebooks on a sample at every scale). Vectors are L2-normalized
    before training — this PQ variant scores COSINE via dot products of
    normalized vectors, so the codebooks must live on the same sphere
    slice as the data they quantize. ``sample_x`` as in
    ``train_centroids``: a pre-collected ordered sample whose prefix
    replaces this function's own collect bit-identically."""
    x = _sample_prefix(sample_x, sample, vec_col, id_col, seed)
    if x is None:
        x = _train_sample_matrix(corpus, sample, vec_col, id_col, seed)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    ksize = 2**nbits
    rng = np.random.RandomState(seed)
    books = np.zeros((m, ksize, sub))
    # per-subspace Lloyd loop, deliberately NOT batched across
    # subspaces (r13 A/B): a single (n, m, k, s) einsum per iteration
    # runs through einsum's generic non-BLAS path (4.6 s vs 1.1 s at
    # m=16/nbits=8) and batched np.matmul is worse still on this
    # container's OpenBLAS (tiny strided gemms pay thread-pool
    # latency, the same pathology _assign_nearest documents) — the
    # small per-j einsum remains the measured optimum.
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[rng.choice(len(xs), size=min(ksize, len(xs)), replace=False)]
        if len(cent) < ksize:  # degenerate tiny corpus: pad by repetition
            cent = np.resize(cent, (ksize, sub))
        for _ in range(iters):
            cent = _centroid_update(xs, _assign_nearest(xs, cent), cent)
        books[j] = cent
    return books


def _pq_encode_udf(books: "np.ndarray"):
    """pandas_udf: vector -> its m PQ sub-codes (nearest codebook entry
    per subspace, on the L2-normalized vector). Arrow-batched; the
    codes are the persisted index at scale (m bytes/vector)."""
    m, _, sub = books.shape

    @F.pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        codes = np.zeros((len(x), m), dtype=np.int32)
        for j in range(m):
            codes[:, j] = _assign_nearest(x[:, j * sub : (j + 1) * sub], books[j])
        return pd.Series(list(codes))

    return encode


def _pq_lut(queries_np: "np.ndarray", books: "np.ndarray") -> "np.ndarray":
    """ADC lookup tensor: LUT[qi, j, c] = dot(q_sub_j, codebook[j][c])
    over L2-normalized queries."""
    m, _, sub = books.shape
    qx = queries_np / np.linalg.norm(queries_np, axis=1, keepdims=True)
    return np.einsum("qjs,jcs->qjc", qx.reshape(len(qx), m, sub), books)


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    query_chunk_size: int = 16384,
    max_queries: int = 262144,
) -> DataFrame:
    """Approximate cosine top-k via product quantization with
    asymmetric distance computation (ADC): corpus vectors compress to
    ``m`` sub-codes (m·nbits bits ≈ 32x smaller than float32 at
    m=8/nbits=4 on d=64); queries stay exact and score against a
    per-query lookup table of sub-dot-products, so one approximate dot
    is ``m`` table lookups + adds — no d-wide arithmetic per pair.

    Same output schema as ``brute_force_topk``/``ivf_topk``
    (query_id, neighbor_id, approx cosine as cosine_sim, rank).

    Scale shape: codebook training is sample-bounded driver work;
    ENCODING is a narrow Arrow map over the corpus (the index build —
    at rest the codes table is what you persist: 8 bytes/vector);
    SCORING is a narrow Arrow map over the codes with the query LUT
    tensor broadcast in-closure, followed by the standard per-query
    top-k window. No shuffle touches a raw vector. The query side is
    driver-materialized ONCE as compact float64 chunks of
    ``query_chunk_size`` (≤ max_queries·d·8 bytes ≈ 134 MB at the
    defaults — the same order as the LUT tensors themselves, never
    python Row objects), each becoming one bounded LUT tensor and one
    scoring pass over the codes; callers with more than
    ``max_queries`` queries get a clear error BEFORE any Spark work
    instead of a union plan with hundreds of corpus scans — at that
    volume, persist the codes table and loop batches externally.
    """
    from functools import reduce

    from pyspark.sql import Window

    # Stream the query side through the driver in one pass, enforcing
    # the volume cap inline (no dedicated count() action, and the cap
    # fires before codebook training spends any cluster time). Rows
    # are converted to compact numpy per chunk as they stream — only
    # (ids, float64 matrix) pairs are retained, never Row objects.
    chunks: list[tuple[np.ndarray, np.ndarray]] = []
    ids: list = []
    vecs: list = []
    n_q = 0

    def _flush():
        if ids:
            chunks.append(
                (
                    np.asarray(ids, dtype=np.int64),
                    np.asarray(vecs, dtype=np.float64),
                )
            )
            ids.clear()
            vecs.clear()

    for r in queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("v")
    ).toLocalIterator():
        n_q += 1
        if n_q > max_queries:
            raise ValueError(
                f"pq_topk got more than max_queries={max_queries} query "
                f"vectors: each {query_chunk_size}-query chunk is a full "
                f"scoring pass over the corpus codes, so batch volumes "
                f"beyond this should persist the PQ codes table and loop "
                f"externally instead."
            )
        ids.append(r.qid)
        vecs.append(r.v)
        if len(ids) >= query_chunk_size:
            _flush()
    _flush()

    books = train_pq_codebooks(
        corpus, m=m, nbits=nbits, vec_col=vec_col, id_col=id_col, seed=seed
    )
    encode = _pq_encode_udf(books)

    coded = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("codes")
    )
    _SCORED_SCHEMA = "query_id long, neighbor_id long, cosine_sim double"
    if len(chunks) > 1:
        # one scoring branch per chunk unions over `coded` — checkpoint
        # it so the corpus is PQ-encoded once, not once per chunk
        coded = coded.localCheckpoint(eager=True)

    def _chunk_scored(q_id_arr: np.ndarray, q_mat: np.ndarray) -> DataFrame:
        lut = _pq_lut(q_mat, books)

        def _score(batches, lut=lut, q_id_arr=q_id_arr):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
                # gather LUT entries: scores (|Q|,n) = Σ_j lut[:,j,codes[:,j]]
                scores = np.zeros((len(q_id_arr), len(pdf)))
                for j in range(m):
                    scores += lut[:, j, codes[:, j]]
                nid = pdf["neighbor_id"].to_numpy()
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(q_id_arr, len(pdf)),
                        "neighbor_id": np.tile(nid, len(q_id_arr)),
                        "cosine_sim": scores.ravel(),
                    }
                )

        return coded.mapInPandas(_score, _SCORED_SCHEMA)

    parts: list[DataFrame] = [_chunk_scored(i, v) for i, v in chunks]
    if not parts:
        return corpus.sparkSession.createDataFrame(
            [], _SCORED_SCHEMA + ", rank int"
        )

    scored = reduce(DataFrame.unionByName, parts).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int | None = None,
    nprobe: int | None = None,
    m: int = 16,
    nbits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """IVF + PQ composed — the standard billion-scale ANN index (FAISS
    IVFADC): the IVF coarse quantizer prunes the CANDIDATE SET
    (|corpus|·nprobe/num_cells rows reach scoring), PQ compresses the
    candidates' MEMORY (m bytes/vector), and ADC lookup tables make
    each score m adds. Neither half alone gives both properties.

    Corpus side is one narrow Arrow pass producing (id, cell, codes) —
    at rest this IS the persisted index, partitioned by cell. The only
    wide op is the cell-keyed candidate join. Output schema matches the
    other *_topk operators.
    """
    from pyspark.sql import Window

    if num_cells is None:
        num_cells = auto_num_cells(corpus.count())
    if nprobe is None:
        nprobe = auto_nprobe(num_cells)
    # both trainers draw the SAME deterministic (hash, id)-ordered
    # sample; collect it once at the larger of the two sizes and hand
    # each trainer its prefix — one sort+limit job instead of two
    # identical ones (prefix slices are bit-identical to separate
    # collects because the sample order is a total order)
    n_sample = max(
        _centroid_sample_size(num_cells),  # train_centroids
        10_000,  # train_pq_codebooks
    )
    sample_x = _shared_sample(corpus, n_sample, vec_col, id_col, seed)
    cent = train_centroids(
        corpus, num_cells=num_cells, vec_col=vec_col, id_col=id_col,
        seed=seed, sample_x=sample_x,
    )
    books = train_pq_codebooks(
        corpus, m=m, nbits=nbits, vec_col=vec_col, id_col=id_col,
        seed=seed, sample_x=sample_x,
    )
    assign1 = _nearest_cells_udf(cent, 1)
    probe = _nearest_cells_udf(cent, nprobe)
    encode = _pq_encode_udf(books)

    c = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
        encode(F.col(vec_col)).alias("codes"),
    )

    return _ivfadc_search(
        c, cent, books, queries, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
    )


def _ivfadc_search(
    codes_df: DataFrame,
    centroids: "np.ndarray",
    books: "np.ndarray",
    queries: DataFrame,
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The shared IVFADC search half (probe → cell-keyed candidate
    join → ADC scoring → per-query top-k) over ANY (neighbor_id,
    cell, codes) frame — built fresh by ``ivfpq_topk``, read from
    disk by ``ann_index_topk``. One implementation so the two paths
    stay bit-identical BY CONSTRUCTION, not just by test.

    The ADC lookup tables are computed EXECUTOR-SIDE, per Arrow batch,
    for only the queries that batch contains (codebooks ride the task
    closure — m·256·d/m doubles, KBs): the query frame is never
    collected to the driver, so a corpus-sized query set cannot OOM it
    building a (Q, m, 256) tensor (r8 verdict item 4). Each query's
    LUT row is computed independently (row-wise normalize + einsum),
    so per-batch recomputation is bit-identical to a global LUT at
    ~16k mults per distinct query per batch. The probe join broadcasts
    the exploded (query_id, cell, vector) frame — the explicit
    executor-memory bound on query volume: a query set past the
    broadcast limit fails Spark's own size check loudly instead of
    silently flattening the driver; route such sets through
    ``pq_topk``'s chunked path or score corpus-vs-corpus via
    ``semantic_dedup``'s cell-scoped form."""
    from pyspark.sql import Window

    _SCHEMA = "query_id long, neighbor_id long, cosine_sim double"
    probe = _nearest_cells_udf(centroids, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    cand = codes_df.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            firsts = pdf.drop_duplicates("query_id")
            qvecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in firsts["__qv"]]
            )
            lut = _pq_lut(qvecs, books)
            q_index = {
                qid: i for i, qid in enumerate(firsts["query_id"])
            }
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            qi = pdf["query_id"].map(q_index).to_numpy()
            scores = np.zeros(len(pdf))
            for j in range(books.shape[0]):
                scores += lut[qi, j, codes[:, j]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cosine_sim": scores,
                }
            )

    scored = cand.select(
        "query_id", "neighbor_id", "codes", "__qv"
    ).mapInPandas(_score, _SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


class ConcurrentIndexRebuildError(RuntimeError):
    """A rebuild replaced the trained model while an append was
    encoding against the old one; the append aborted cleanly."""


# Grace before a superseded codes dir is physically reclaimed (by the
# NEXT rebuild's publish): long enough for any lazily-planned reader of
# the old index to finish its scan, short enough that storage doesn't
# accumulate more than one superseded build in steady state.
_RETIRED_GRACE_SEC = 300.0


class _MetaLock:
    """Exclusive advisory lock for an ANN index's meta.json
    read-modify-write, via ``fcntl.flock`` on a persistent lockfile.
    Without it, two concurrent appends both read appended_dirs=[], and
    the loser's vectors silently vanish from the index (its codes dir
    becomes an unreferenced orphan).

    flock is the right local-filesystem primitive: acquisition is
    ATOMIC in the kernel (no create/stat/unlink TOCTOU windows — the
    r7 O_EXCL-lockfile form had a takeover race where a presumed-stale
    holder could unlink the usurper's fresh lock on exit), release on
    process death is automatic (no staleness heuristic at all — a
    SIGKILLed holder's lock evaporates with its fd), and two opens in
    ONE process also exclude each other (per open-file-description
    semantics). ``stale_sec`` is retained in the signature for
    compatibility but unused — there is no stale state to reclaim.
    On shared object storage (flock-less), swap for the same
    conditional-PUT the snapshot layer's _commit_manifest documents."""

    def __init__(self, path: str, timeout_sec: float = 60.0,
                 stale_sec: float = 300.0):
        import os

        self._lock = os.path.join(path, "meta.lock")
        self._timeout = timeout_sec
        self._fd: int | None = None

    def __enter__(self):
        import fcntl
        import os
        import time

        deadline = time.time() + self._timeout
        fd = os.open(self._lock, os.O_CREAT | os.O_WRONLY, 0o644)
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    self._fd = fd
                    return self
                except OSError:
                    if time.time() > deadline:
                        raise TimeoutError(
                            f"ANN index meta lock busy for "
                            f"{self._timeout}s: {self._lock}"
                        ) from None
                    time.sleep(0.05)
        except BaseException:
            os.close(fd)
            raise

    def __exit__(self, *exc):
        import os

        if self._fd is not None:
            os.close(self._fd)  # closes the description -> releases
            self._fd = None
        return False


def build_ann_index(
    corpus: DataFrame,
    path: str,
    num_cells: int | None = None,
    m: int = 16,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Persist the IVFADC index ``ivfpq_topk`` builds ephemerally —
    the docstrings' "at rest this IS the persisted index" made a real
    API. One narrow Arrow pass writes the codes table
    (neighbor_id, cell, codes) as parquet PARTITIONED BY cell
    (m bytes/vector + an int — ~32× smaller than the float32 corpus
    at the defaults), and the KB-sized trained model (IVF centroids +
    PQ codebooks) lands beside it as JSON. Build once per corpus
    snapshot; every query batch after that skips training AND
    encoding entirely (:func:`load_ann_index` +
    :func:`ann_index_topk`)."""
    import json
    import os
    import shutil
    import uuid

    if num_cells is None:
        num_cells = auto_num_cells(corpus.count())
    # shared-sample contract as in ivfpq_topk: one sort+limit collect,
    # each trainer takes its bit-identical prefix
    n_sample = max(_centroid_sample_size(num_cells), 10_000)
    sample_x = _shared_sample(corpus, n_sample, vec_col, id_col, seed)
    cent = train_centroids(
        corpus, num_cells=num_cells, vec_col=vec_col, id_col=id_col,
        seed=seed, sample_x=sample_x,
    )
    books = train_pq_codebooks(
        corpus, m=m, nbits=nbits, vec_col=vec_col, id_col=id_col,
        seed=seed, sample_x=sample_x,
    )
    assign1 = _nearest_cells_udf(cent, 1)
    encode = _pq_encode_udf(books)
    # the codes dir is UNIQUE PER BUILD and named inside meta.json, and
    # meta lands last via atomic replace — so codes+model always pair:
    # a rebuild that dies mid-way leaves the OLD index fully intact
    # (new orphan dir aside), never new codes under the old model
    codes_rel = f"codes-{uuid.uuid4().hex[:8]}"
    (
        corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
            encode(F.col(vec_col)).alias("codes"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, codes_rel))
    )
    meta_path = os.path.join(path, "meta.json")
    # the meta read→publish→reclaim must be exclusive: an append
    # landing its dir between our read and our reclaim would otherwise
    # be orphaned by a reclaim that never saw it listed
    with _MetaLock(path):
        old: dict = {}
        old_dirs: list[str] = []
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                old = json.load(f)
            old_dirs = (
                [old.get("codes_dir")] + old.get("appended_dirs", [])
            )
        # superseded dirs are RETIRED, not deleted at publish:
        # load_ann_index is lazy, so a concurrent reader may still hold
        # an unexecuted plan over the old codes — an immediate rmtree
        # makes its scan fail mid-flight with missing files. Retired
        # dirs are reclaimed by the NEXT publish once older than
        # _RETIRED_GRACE_SEC (the snapshot layer's expiry pattern:
        # age-guarded GC, never delete what a live plan can reference).
        import time

        retired = dict(old.get("retired_dirs") or {})
        now = time.time()
        for d in old_dirs:
            if d and d != codes_rel:
                retired.setdefault(d, now)
        for d, ts in list(retired.items()):
            if now - ts > _RETIRED_GRACE_SEC:
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
                del retired[d]
        meta = {
            "format": "spark-graft-ivfpq-v1",
            "build_id": uuid.uuid4().hex,
            "codes_dir": codes_rel,
            "appended_dirs": [],
            "retired_dirs": retired,
            "num_cells": num_cells,
            "m": m,
            "nbits": nbits,
            "seed": seed,
            "centroids": cent.tolist(),
            "books": books.tolist(),
        }
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)


def append_ann_index(
    increment: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: encode a NEW batch of vectors
    against the index's ALREADY-TRAINED model (IVF centroids + PQ
    codebooks from meta.json) and add it as one more codes directory —
    no retraining, no re-encoding of the existing corpus. This is how
    production IVF indexes absorb daily corpus growth (FAISS
    add-without-train): the trained model is a property of the
    distribution, not the rows, so appends reuse it until drift
    justifies a rebuild (watch centroid_shift for that signal).

    Atomicity contract matches build_ann_index: the new codes dir is
    unique per append and meta lands last via atomic replace — a
    crashed append leaves the old index fully readable (orphan dir
    aside). Callers appending the SAME rows twice get duplicate
    neighbors (dedupe upstream or rebuild); searches see appended
    vectors immediately after the meta replace.

    Scale shape: one narrow Arrow-batched pass over the increment
    (assign + encode, model in-closure), one cell-partitioned parquet
    write of m bytes/vector — O(|increment|), independent of index
    size."""
    import json
    import os
    import uuid

    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format") != "spark-graft-ivfpq-v1":
        raise ValueError(f"not an ANN index dir: {path}")
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["books"], dtype=np.float64)
    assign1 = _nearest_cells_udf(cent, 1)
    encode = _pq_encode_udf(books)
    codes_rel = f"codes-append-{uuid.uuid4().hex[:8]}"
    (
        increment.repartition(
            increment.sparkSession.sparkContext.defaultParallelism
        )
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
            encode(F.col(vec_col)).alias("codes"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, codes_rel))
    )
    # exclusive read-merge-publish: two concurrent appends must BOTH
    # end up in appended_dirs — an unguarded read-modify-write loses
    # the race loser's vectors silently (searches just miss them).
    # The encode job above stays outside the lock (long); the
    # re-read + merge + replace inside is milliseconds.
    with _MetaLock(path):
        with open(meta_path) as f:
            current = json.load(f)
        if current.get("build_id") != meta.get("build_id"):
            # a REBUILD landed while we encoded: our codes carry the
            # OLD model's codebooks — publishing them under the new
            # model would serve garbage scores. Drop the work, tell
            # the caller to re-append against the new model.
            import shutil

            shutil.rmtree(
                os.path.join(path, codes_rel), ignore_errors=True
            )
            raise ConcurrentIndexRebuildError(
                f"index at {path} was rebuilt during this append; "
                "re-run append_ann_index against the new model"
            )
        meta = current
        meta["appended_dirs"] = (
            meta.get("appended_dirs", []) + [codes_rel]
        )
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)


def source_fingerprint(path: str) -> str:
    """Content fingerprint of a LOCAL corpus file/directory WITHOUT
    reading data: md5 over each member file's (relative name, size,
    mtime_ns, inode). Changes on any rewrite, add, remove, or
    replace-by-rename that the filesystem can observe — the cache-key
    ingredient that keeps a persisted ANN index honest when the corpus
    changes under unchanged build params (an index loaded against
    different content silently serves wrong neighbors; r6 verdict
    item 7). Metadata-only, so it costs microseconds against a corpus
    where hashing content would cost a full read.

    Bounds: local-filesystem paths only (os.stat — raises
    FileNotFoundError rather than silently fingerprinting nothing; for
    s3://... / hdfs://... corpora, key the cache on the table's
    snapshot/version id instead, which is what a versioned store is
    for). An in-place same-size rewrite inside one mtime tick of a
    coarse-grained filesystem is the classic make-style blind spot;
    st_mtime_ns + inode narrows it to same-inode sub-tick rewrites."""
    import hashlib
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"source_fingerprint: {path} does not exist locally; for "
            "object-store corpora key the index cache on a snapshot/"
            "version id instead"
        )
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append(
                    f"{os.path.relpath(p, path)}:{st.st_size}:"
                    f"{st.st_mtime_ns}:{st.st_ino}"
                )
    else:
        st = os.stat(path)
        entries.append(
            f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}:"
            f"{st.st_ino}"
        )
    return hashlib.md5("\n".join(sorted(entries)).encode()).hexdigest()[:16]


class AnnIndex:
    """A loaded at-rest ANN index: the codes DataFrame (lazy, cell-
    partitioned parquet) plus the driver-side trained model arrays."""

    def __init__(self, codes: DataFrame, centroids, books):
        self.codes = codes
        self.centroids = centroids
        self.books = books


def load_ann_index(spark: SparkSession, path: str) -> AnnIndex:
    """Open a :func:`build_ann_index` directory (plus any
    :func:`append_ann_index` increments — the codes table is the union
    of the base and appended dirs). The codes table stays a lazy
    parquet scan — a query batch that probes few cells reads few
    partitions (Hive-style pruning on the cell key).

    Laziness vs rebuilds: a rebuild RETIRES this index's dirs rather
    than deleting them, and the retired set is only reclaimed by a
    subsequent publish after ``_RETIRED_GRACE_SEC`` — so a plan opened
    here stays scannable through one concurrent rebuild. A caller that
    holds the frame LONGER than the grace (caching it across batches)
    should eagerly materialize (``localCheckpoint(eager=True)``, as
    q_ann_index_search does) or reload per batch."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format") != "spark-graft-ivfpq-v1":
        raise ValueError(f"not an ANN index dir: {path}")
    dirs = [meta["codes_dir"]] + meta.get("appended_dirs", [])
    # one read per codes dir, unioned: each dir is its own Hive
    # partition tree (multi-path discovery rejects sibling roots), and
    # per-dir reads keep cell-pruning working on every member
    frames = [spark.read.parquet(os.path.join(path, d)) for d in dirs]
    codes = frames[0]
    for f in frames[1:]:
        codes = codes.unionByName(f)
    return AnnIndex(
        codes,
        np.asarray(meta["centroids"], dtype=np.float64),
        np.asarray(meta["books"], dtype=np.float64),
    )


def ann_index_topk(
    queries: DataFrame,
    index: AnnIndex,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC search against a PERSISTED index — bit-identical to
    ``ivfpq_topk`` built with the same parameters/seed (asserted in
    tests), minus the training and encoding passes. The probed cells
    arrive as literal partition filters on the codes scan, so at
    corpus scale a batch touching nprobe·|batch| distinct cells reads
    only those partitions. Output schema matches the other *_topk
    operators."""
    return _ivfadc_search(
        index.codes, index.centroids, index.books, queries,
        k=k, nprobe=nprobe, id_col=id_col, vec_col=vec_col,
    )


def centroid_shift(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift per group: the cosine between each group's
    decimal-exact mean vector in two corpus versions — the drift
    monitor for EMBEDDING columns, where scalar tests (KS, chi-square,
    PSI) see nothing because no single dimension moves much while the
    mean direction rotates. cosine ≈ 1: stable; lower: the group's
    semantic center moved (upstream encoder change, topic shift,
    poisoning). Returns (group, n_old, n_new, centroid_cosine); groups
    present on only one side report NULL cosine.

    Exactness: per-dimension decimal accumulation (the
    embedding_centroids contract) makes both centroids bit-reproducible
    under any partitioning; the cosine is the shared sequential fold.
    Scale shape: two (group, dim) partial-aggs — the shuffle carries
    |groups|·|dims| rows, never vectors; the join is |groups| rows."""

    def cents(frame: DataFrame, n_alias: str):
        ex = frame.select(
            F.col(group_col).alias("__g"),
            F.posexplode(vec_col).alias("__pos", "__v"),
        ).select("__g", "__pos", F.col("__v").cast("double").alias("__v"))
        per_dim = ex.groupBy("__g", "__pos").agg(
            (
                F.sum(F.col("__v").cast("decimal(38,8)")).cast("double")
                / F.count("__v")
            ).alias("__c")
        )
        arr = per_dim.groupBy("__g").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__c"))),
                lambda s: s["__c"],
            ).alias("__cent")
        )
        cnt = frame.groupBy(F.col(group_col).alias("__g")).agg(
            F.count("*").alias(n_alias)
        )
        return arr.join(cnt, "__g")

    co = cents(old, "n_old")
    cn = cents(new, "n_new").withColumnsRenamed({"__cent": "__cent2"})
    return (
        co.join(cn, "__g", "full_outer")
        .select(
            F.col("__g").alias(group_col),
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.when(
                F.col("__cent").isNotNull() & F.col("__cent2").isNotNull(),
                cosine(F.col("__cent"), F.col("__cent2")),
            ).alias("centroid_cosine"),
        )
    )


def prototype_prune(
    corpus: DataFrame,
    keep_frac: float = 0.5,
    num_cells: int = 16,
    hard: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws"): partition the embedding space (k-means
    cells), score each vector by cosine similarity to its cell's EXACT
    mean vector (the prototype), and keep the ``keep_frac`` HARDEST
    (least prototypical — the abundant-data regime the paper shows
    beats random pruning) examples per cell; ``hard=False`` keeps the
    easiest (scarce-data regime). Returns surviving rows plus
    ``proto_sim``. Deterministic: prototypes are decimal-exact
    per-dimension means (the embedding_centroids contract), ranking
    ties break on id.

    ``num_cells=1`` degenerates to a single global prototype — no
    clustering, fully SQL-expressible, the oracle-twin path.

    Scale shape: assignment is a narrow Arrow matmul (or a literal for
    one cell); prototypes are a (cell, dim) partial-agg — the shuffle
    carries |cells|·|dims| rows, never vectors; scoring is a broadcast
    join of the tiny prototype table; the keep rule is a per-cell
    window over (score, id) — partitioned by cell, no global sort."""
    if num_cells <= 1:
        sided = corpus.withColumn("__cell", F.lit(0))
    else:
        cent = train_centroids(
            corpus, num_cells=num_cells, vec_col=vec_col, id_col=id_col,
            seed=seed,
        )
        assign1 = _nearest_cells_udf(cent, 1)
        sided = corpus.withColumn(
            "__cell", F.element_at(assign1(F.col(vec_col)), 1)
        )
    ex = sided.select(
        "__cell", F.posexplode(vec_col).alias("__pos", "__v")
    ).select("__cell", "__pos", F.col("__v").cast("double").alias("__v"))
    proto = (
        ex.groupBy("__cell", "__pos")
        .agg(
            (
                F.sum(F.col("__v").cast("decimal(38,8)")).cast("double")
                / F.count("__v")
            ).alias("__c")
        )
        .groupBy("__cell")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__c"))
                ),
                lambda s: s["__c"],
            ).alias("__proto")
        )
    )
    # prototype norm once per CELL (tiny broadcast frame), vector dot
    # and self-dot per row through the vectorized exact fold (guide
    # §4) — same IEEE sequence as cosine()'s inline folds, so scores
    # (and the ranked survivor set) are bit-identical
    proto = proto.withColumn(
        "__pnorm", F.sqrt(_pair_dot(F.col("__proto"), F.col("__proto")))
    )
    scored = sided.join(F.broadcast(proto), "__cell").withColumn(
        "proto_sim",
        _pair_dot(F.col(vec_col), F.col("__proto"))
        / (
            F.sqrt(_pair_dot(F.col(vec_col), F.col(vec_col)))
            * F.col("__pnorm")
        ),
    )
    from pyspark.sql import Window

    order = (
        [F.asc("proto_sim"), F.asc(id_col)]
        if hard
        else [F.desc("proto_sim"), F.asc(id_col)]
    )
    w = Window.partitionBy("__cell").orderBy(*order)
    wc = Window.partitionBy("__cell")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(wc))
        .filter(
            F.col("__rn")
            <= F.ceil(F.lit(keep_frac) * F.col("__n")).cast("int")
        )
        .drop("__rn", "__n", "__cell", "__proto", "__pnorm")
    )


# Largest unlabeled/query frame the exact brute-force kNN path may
# broadcast (brute_force_topk ships the query side to every executor —
# fine for a bounded batch, fatal when it is a corpus-proportional
# slice). Past this, `method="auto"` routes through the IVF index and
# `method="exact"` refuses — the same guard discipline as pq_topk's
# max_queries and semantic_dedup's _EXACT_ALLPAIRS_MAX_ROWS.
_KNN_EXACT_MAX_QUERY_ROWS = 100_000


def knn_label_propagation(
    labeled: DataFrame,
    unlabeled: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    method: str = "auto",
    max_exact_rows: int = _KNN_EXACT_MAX_QUERY_ROWS,
    num_cells: int | None = None,
    nprobe: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Propagate labels from a labeled seed set to unlabeled vectors by
    majority vote of the k nearest labeled neighbors (cosine) — the
    standard label-transfer step for bootstrapping quality/domain/topic
    labels over a corpus from a small annotated set (the kNN classifier
    over embeddings that FastText-style pipelines use when a trained
    head is unavailable). Returns (id_col, predicted_label, votes,
    top_sim): the majority label, its vote count, and the best cosine
    among the k neighbors. Ties break to the SMALLEST label —
    deterministic, engine-portable.

    Neighbor search routes by ``method``:

    - ``"exact"`` — :func:`brute_force_topk`. Broadcasts the unlabeled
      frame, so it REFUSES (ValueError) past ``max_exact_rows``: an
      unbounded exact path silently becomes an O(|U|·|L|) scan with a
      corpus-sized broadcast at 100×. This is the oracle-twin path.
    - ``"ivf"`` — :func:`ivf_topk` with ``broadcast_queries=False``:
      sample-trained centroids, cell-keyed size-aware equi-join,
      nothing hinted broadcast-able. The default at corpus scale.
    - ``"auto"`` — one count() of the unlabeled side picks exact under
      ``max_exact_rows``, IVF above it.

    The vote is a (query, label) partial-agg plus a per-query top-1
    window — no vector ever shuffles. The labeled (id → label) join is
    hint-free on the scale path: AQE broadcasts it only if it is
    actually small (a seed set), never because we promised it was."""
    from pyspark.sql import Window

    n_q = None
    if method == "auto":
        n_q = unlabeled.count()
        method = "exact" if n_q <= max_exact_rows else "ivf"
    if method == "exact":
        # bounded-broadcast contract; auto has already proven it, an
        # explicit exact call must prove it here
        if n_q is None:
            n_q = unlabeled.count()
        if n_q > max_exact_rows:
            raise ValueError(
                f"knn_label_propagation(method='exact'): {n_q} query rows "
                f"exceed max_exact_rows={max_exact_rows}; the exact path "
                "broadcasts the query frame. Use method='ivf' (or 'auto')."
            )
        nn = brute_force_topk(
            unlabeled, labeled, k=k, id_col=id_col, vec_col=vec_col
        )
    elif method == "ivf":
        nn = ivf_topk(
            unlabeled,
            labeled,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            num_cells=num_cells,
            nprobe=nprobe,
            seed=seed,
            broadcast_queries=False,
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    lab = labeled.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__lab"),
    )
    # no broadcast hint: the labeled frame is corpus-proportional in
    # whole-corpus propagation; AQE broadcasts genuinely small seed sets
    votes = (
        nn.join(lab, "neighbor_id")
        .groupBy("query_id", "__lab")
        .agg(
            F.count("*").alias("votes"),
            F.max("cosine_sim").alias("top_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("__lab")
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("query_id").alias(id_col),
            F.col("__lab").alias("predicted_label"),
            F.col("votes").cast("int").alias("votes"),
            "top_sim",
        )
    )


# -- SemDeDup-style semantic deduplication -----------------------------------

# Bound on the exact (num_cells<=1) all-pairs path: it broadcasts the
# whole corpus, so ~1e5 rows × a few-hundred-dim float vectors is the
# most a driver/executor should ever be asked to hold twice.
_EXACT_ALLPAIRS_MAX_ROWS = 100_000


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Semantic deduplication à la SemDeDup (Abbas et al. 2023): k-means
    the embedding space, then within each cluster drop every vector
    that has a LOWER-id cluster-mate with cosine similarity above
    ``threshold``. Returns the surviving rows (all input columns).

    Why clustering first: exact all-pairs cosine is O(N²) over the
    corpus; restricting comparisons to same-cluster pairs makes the
    cost Σ|cell|² — the operator's accuracy/cost dial is num_cells
    (more cells → cheaper, may miss cross-cell near-dups; SemDeDup's
    published finding is that dups overwhelmingly co-cluster).

    Scale shape: centroid training is sample-bounded driver-side (the
    FAISS contract, shared with IVF); cell assignment is a narrow
    Arrow-batched matmul; the pairwise stage shuffles (cell, id,
    vec) once and joins cell-to-cell; the survivor filter is a
    broadcast-able anti-join on dropped ids (dup ids ≪ corpus at any
    reasonable threshold). The survivor rule (lowest id in each dup
    neighborhood wins) is deterministic and order-independent.
    """
    if num_cells <= 1:
        # degenerate single-cell form = EXACT all-pairs SemDeDup: no
        # clustering step, so the survivor set is SQL-expressible — the
        # oracle twin (semantic_dedup_exact) runs this path. It
        # broadcasts the whole corpus (build side of the N² probe), so
        # it is only usable on bounded inputs: enforce that instead of
        # letting the broadcast blow past the driver at real scale.
        n = corpus.count()
        if n > _EXACT_ALLPAIRS_MAX_ROWS:
            raise ValueError(
                f"semantic_dedup(num_cells<=1) is the exact all-pairs "
                f"form and broadcasts the full corpus; got {n} rows "
                f"(max {_EXACT_ALLPAIRS_MAX_ROWS}). Use num_cells > 1 "
                f"for the cell-scoped scale path."
            )
        sided = corpus.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
            _norm(F.col(vec_col)).alias("__norm"),
            F.lit(0).alias("__cell"),
        )
    else:
        cent = train_centroids(
            corpus, num_cells=num_cells, vec_col=vec_col, id_col=id_col,
            seed=seed,
        )
        assign1 = _nearest_cells_udf(cent, 1)
        sided = corpus.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
            _norm(F.col(vec_col)).alias("__norm"),
            F.element_at(assign1(F.col(vec_col)), 1).alias("__cell"),
        )
    a = sided.alias("a")
    b = sided.alias("b")
    if num_cells <= 1:
        # one cell = one join key: a hash/sort-merge join would put the
        # whole N² comparison in ONE task. Round-robin the probe side
        # across cores and broadcast the build side instead (the
        # embedding_near_dup_exact brute-force shape).
        a = sided.repartition(
            sided.sparkSession.sparkContext.defaultParallelism
        ).alias("a")
        b = F.broadcast(sided.alias("b"))
    dropped = (
        a.join(b, F.col("a.__cell") == F.col("b.__cell"))
        .filter(F.col("a.__id") < F.col("b.__id"))
        .filter(
            # vectorized exact-fold dot (guide §4): bit-identical to
            # the JVM fold, so the survivor set cannot move
            _pair_dot(F.col("a.__vec"), F.col("b.__vec"))
            / (F.col("a.__norm") * F.col("b.__norm"))
            > threshold
        )
        .select(F.col("b.__id").alias(id_col))
        .distinct()
    )
    return corpus.join(dropped, id_col, "left_anti")
