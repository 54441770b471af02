"""Deduplication operators for LLM data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join → Jaccard verify), SimHash (per-row bit aggregation +
banded candidate join + Hamming verify), and n-gram Jaccard — all
expressed with JVM-side higher-order array functions and xxhash64.
No Python UDFs anywhere.

Scale design:
- signatures are computed in a narrow map stage (per-row array exprs);
- candidate generation shuffles only (band_key → doc_id) pairs, never
  documents;
- verification joins shingle SETS for candidate pairs only — the
  classic candidates ≪ n² LSH contract;
- banding parameters (num_hashes, bands) trade recall vs shuffle
  volume; defaults follow the standard s-curve at ~0.7 similarity.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to defaultParallelism — but only when
    the input has fewer partitions than cores. A small table is often a
    single parquet file = a single task, which serializes the per-row
    hot spot (shingle/hash expressions) onto one core; at real scale
    inputs already carry thousands of partitions and must NOT pay an
    extra full-text shuffle, so this is a no-op there."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def spread_by(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition a NARROW frame across the default parallelism
    before a CPU-heavy per-row stage. AQE sizes shuffle partitions by
    BYTES, so a candidate-pair exchange of a few hundred KB coalesces
    to ONE partition — and a verify stage downstream (array_intersect
    over shingle arrays, banded DP) then runs its whole CPU budget on
    one core (measured: blocked_jaccard's verify was a single 3 s task
    at sf0.1 while 31 cores idled). Keys are high-cardinality ids, so
    the hash spreads evenly; the explicit partition count is respected
    by AQE (user-specified repartitions are not re-coalesced). Hash
    partitioning (not round-robin) keeps the placement deterministic
    under task retry and skips keyless repartition's sort-before-
    repartition pass. At real scale candidate frames already arrive
    wide and this narrow-row exchange is noise next to the verify CPU
    it parallelizes — same contract as :func:`spread` for scans.

    Partitioning goes through ``xxhash64(keys)`` rather than the raw
    key columns: a dedup aggregate upstream already hash-partitions on
    exactly (id_a, id_b), so a raw-key repartition is provably
    redundant and the optimizer REMOVES it — leaving the verify on the
    AQE-coalesced single partition this function exists to prevent.
    The derived expression keeps the exchange (and the explicit
    partition count keeps AQE from re-coalescing it)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, F.xxhash64(*[F.col(c) for c in key_cols]))


# -- shingling ---------------------------------------------------------------


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of lowercased, whitespace-normalized
    text. Documents shorter than k tokens yield their full token tuple
    as a single shingle."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.regexp_replace(F.lower(F.trim(c)), "\\s+", " "), " ")
    if k == 1:
        # no sliding window needed — and array_distinct(split(...)) stays
        # on the codegen path, while transform/slice HOFs are interpreted
        return F.array_distinct(toks)
    n = F.size(toks)
    joined = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return F.array_distinct(joined)


# -- exact dedup (hash-groupBy) ---------------------------------------------


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprint_col: Column | None = None,
) -> DataFrame:
    """Exact dedup: keep the min-id row per content fingerprint
    (default: the normalized-text md5; pass ``fingerprint_col`` to key
    on anything else, e.g. raw payload bytes for binary media).

    Scale shape: the GROUPING shuffle moves (fingerprint, id) scalars
    only — never content. The survivor restriction is then an
    id-keyed LEFT SEMI join of the full frame against the keep set;
    that join co-locates by id, so on an id-bucketed/partitioned table
    (the at-rest layout ``create_bucketed_table`` exists for) it is
    exchange-free — otherwise it is one content-sized shuffle on the
    id, the honest cost of materializing survivors WITH their content
    in one pass. Rows with a NULL fingerprint are not each other's
    duplicates and pass through untouched."""
    from nyc_taxi_data_ingestion_spark.llm.text import fingerprint

    fp = (
        fingerprint_col
        if fingerprint_col is not None
        else fingerprint(text_col)
    ).alias("__fp")
    with_fp = df.select(F.col(id_col), fp)
    keep = (
        with_fp.filter(F.col("__fp").isNotNull())
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("__fp")
        .unionByName(
            with_fp.filter(F.col("__fp").isNull()).select(id_col)
        )
    )
    return df.join(keep, on=id_col, how="left_semi")


# -- MinHash + LSH -----------------------------------------------------------


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """num_hashes-wide MinHash signature as a single Column expression:
    lane j is min over shingles of xxhash64(xxhash64(shingle), j).

    NOTE: higher-order array functions are CodegenFallback (interpreted)
    and re-evaluate their input array per enclosing evaluation, so this
    per-row form costs O(num_hashes · shingle_pipeline). Use
    ``minhash_signatures`` (explode → codegen hash → min-aggregate) for
    anything beyond small data — same math, whole-stage codegen."""
    base = F.transform(shingle_col, lambda s: F.xxhash64(s))

    def lane(j: int):
        return lambda h: F.xxhash64(h, F.lit(j))

    return F.array(
        *[F.array_min(F.transform(base, lane(j))) for j in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(__id, __sig) MinHash signatures via the scale-path plan:
    explode shingles to rows → one xxhash64 per shingle (whole-stage
    codegen) → num_hashes ``min(xxhash64(h, j))`` hash aggregates.
    Map-side partial aggregation means the shuffle carries at most
    one signature-width row per (doc, partition) — never shingles."""
    ex = spread(df).select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(text_col, k)).alias("__s"),
    ).select("__id", F.xxhash64("__s").alias("__h"))
    aggs = [
        F.min(F.xxhash64(F.col("__h"), F.lit(j))).alias(f"__m{j}")
        for j in range(num_hashes)
    ]
    return (
        ex.groupBy("__id")
        .agg(*aggs)
        .select(
            "__id",
            F.array(*[f"__m{j}" for j in range(num_hashes)]).alias("__sig"),
        )
    )


def band_signatures(sig: DataFrame, num_hashes: int = 64, bands: int = 16) -> DataFrame:
    """Expand (__id, __sig) signatures into the banded key table
    ``(__id, band, sig)`` — one row per (doc, band), where ``sig`` is a
    64-bit hash of that band's signature slice. This table IS the LSH
    index: candidate pairs are an equi-join on (band, sig). Only
    (band_key, id) tuples ever shuffle; at rest, store it bucketed by
    (band, sig) so incremental probes join exchange-free."""
    rows_per_band = num_hashes // bands
    return sig.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("sig"),
                ),
            )
        ).alias("bk"),
    ).select("__id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """MinHash-LSH candidate pairs: documents sharing ≥1 band bucket.

    Returns (id_a, id_b) with id_a < id_b, distinct. Only
    (band_key, id) tuples shuffle; the bucket self-join is on a
    composite (band_index, band_hash) key so hot buckets are the only
    skew risk — AQE skew-join handles them.
    """
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    # materialize the banded index before the self-join: the two join
    # legs otherwise each re-run the whole shingle+signature pipeline
    # (verified: zero ReusedExchange — one leg broadcasts, so the
    # exchanges differ and Spark cannot share them). The index is
    # (id, band, sig) — bands·|docs| rows of three scalars, exactly
    # the table the at-rest contract says to store bucketed anyway.
    banded = band_signatures(sig, num_hashes, bands).localCheckpoint(eager=True)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Verify candidate pairs with exact Jaccard over shingle sets.
    Returns (id_a, id_b, jaccard) for pairs ≥ threshold. Docs are
    semi-join-pruned to candidate members BEFORE the (interpreted,
    CodegenFallback) shingle expression runs — shingle sets are built
    for candidates only, the classic candidates ≪ n LSH contract.

    ``pairs`` and the member shingle sets are persisted WITHIN this
    call: the plan references pairs three times (edge base + both
    member_ids legs) and the shingle sets twice (sh_a, sh_b) — without
    a persist each reference re-executes the full upstream LSH
    pipeline. The verified edge list (≪ candidates ≪ corpus) is
    eagerly localCheckpoint-ed so both caches can be released before
    returning — a long-lived session (bench.py runs the whole
    registry) must not accumulate cached blocks across queries."""
    pairs = pairs.persist()
    sh = None
    try:
        member_ids = (
            pairs.select(F.col("id_a").alias("__id"))
            .union(pairs.select(F.col("id_b").alias("__id")))
            .distinct()
        )
        sh = (
            spread(df).join(
                F.broadcast(member_ids),
                df[id_col] == member_ids["__id"],
                "left_semi",
            )
            .select(F.col(id_col).alias("__id"), shingles(text_col, k).alias("__sh"))
        ).persist()
        # spread the narrow pair frame before the verify join: the
        # cached candidate list is a few hundred KB, which AQE/cache
        # partitioning concentrates on one core for the array work
        withs = (
            spread_by(pairs, "id_a", "id_b")
            .join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "sh_a"}), "id_a")
            .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "sh_b"}), "id_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union.cast("double"))
        result = (
            withs.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )
        # eager: materializes the small edge list and truncates lineage,
        # so the persisted inputs are no longer referenced by its plan
        return result.localCheckpoint(eager=True)
    finally:
        pairs.unpersist()
        if sh is not None:
            sh.unpersist()


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → Jaccard verify.
    Returns the verified near-duplicate edge list."""
    cands = lsh_candidate_pairs(df, id_col, text_col, k, num_hashes, bands)
    return jaccard_verify(df, cands, id_col, text_col, k, threshold)


# -- SimHash -----------------------------------------------------------------


def simhash(text: Column | str, bits: int = 64) -> Column:
    """64-bit SimHash as a per-row expression: for each bit position,
    sum +1/-1 over token hashes, then assemble the sign vector into one
    BIGINT. Narrow map stage; no explode, no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.regexp_replace(F.lower(F.trim(c)), "\\s+", " "), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # F.shiftleft/shiftright take a Python int for numBits; inside a
    # higher-order-function lambda the shift amount is a Column, so go
    # through the SQL function, which accepts expressions for both args.
    shl = lambda x, n: F.call_function("shiftleft", x, n)  # noqa: E731
    bit_signs = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda i: F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(h.bitwiseAND(shl(F.lit(1).cast("long"), i)) != 0, 1)
                .otherwise(-1)
                .cast("long"),
            )
            >= 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        F.zip_with(
            bit_signs,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda s, i: shl(s, i),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    lane_bits: int = 16,
) -> DataFrame:
    """(__id, __sh) SimHash signatures via the codegen plan: explode
    tokens → one xxhash64 per token → striped bit-count aggregates →
    assemble the sign vector into one BIGINT.

    Striping replaces the naive 64 ``sum(when(bit_j set, +1, -1))``
    aggregates with ``64/lanes`` packed counters: ``(h >>> k) & stripe``
    (stripe = a 1-bit every ``lane_bits`` positions) counts ``lanes``
    different bit positions at once in independent 16-bit lanes of one
    long — one shift and one mask per token per aggregate, 16 aggregates
    instead of 64 CASE expressions (plus one count). The ±1 signed sum
    is recovered algebraically: sum±1 = 2·ones − n, so bit set ⇔
    2·ones ≥ n. Output is bit-identical to the naive form.

    Lanes are exact while every doc has < 2^lane_bits tokens (65 535 at
    the default); for corpora with larger docs pass ``lane_bits=32``
    (32 aggregates, 4 B tokens/doc).
    """
    lanes = 64 // lane_bits  # bit positions counted per aggregate
    n_aggs = bits // lanes
    stripe = 0
    for j in range(lanes):
        stripe |= 1 << (lane_bits * j)
    ex = spread(df).select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " "), " ")
        ).alias("__t"),
    ).select("__id", F.xxhash64("__t").alias("__h"))
    aggs = [
        F.sum(
            F.shiftrightunsigned(F.col("__h"), k).bitwiseAND(F.lit(stripe).cast("long"))
        ).alias(f"__s{k}")
        for k in range(n_aggs)
    ]
    packed = ex.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"), *aggs)
    lane_mask = (1 << lane_bits) - 1
    out = F.lit(0).cast("long")
    for b in range(bits):
        k, j = b % n_aggs, b // n_aggs
        ones = F.shiftrightunsigned(F.col(f"__s{k}"), lane_bits * j).bitwiseAND(
            F.lit(lane_mask).cast("long")
        )
        bit_val = -(1 << 63) if b == 63 else (1 << b)
        out = out.bitwiseOR(
            F.when(ones * 2 >= F.col("__n"), F.lit(bit_val).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return packed.select("__id", out.alias("__sh"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into `chunks`
    16-bit chunks (pigeonhole: hamming ≤ chunks-1 ⇒ ≥1 chunk equal),
    bucket-join on equal chunks, verify with exact popcount Hamming.

    Returns (id_a, id_b, hamming) with hamming ≤ max_hamming.
    """
    # materialize signatures before the self-join (see
    # lsh_candidate_pairs): both legs otherwise re-run the striped
    # signature aggregation; the table is (id, 64-bit hash) — tiny.
    sh = simhash_signatures(df, id_col, text_col).localCheckpoint(eager=True)
    return hamming_near_dups(
        sh, id_col="__id", sig_col="__sh",
        max_hamming=max_hamming, chunks=chunks,
    )


def hamming_near_dups(
    sig: DataFrame,
    id_col: str = "__id",
    sig_col: str = "__sh",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Banded Hamming near-dup pairs over ANY 64-bit signature column —
    the bucket/verify half of :func:`simhash_near_dups`, factored out
    so it works for any bit-signature (SimHash, pHash packed to 64
    bits, an injected test signature). Pigeonhole completeness: with
    ``max_hamming ≤ chunks - 1``, two signatures within the Hamming
    bound MUST agree on ≥1 chunk (max_hamming differing bits touch at
    most that many chunks), so the bucketed output EQUALS the
    brute-force all-pairs Hamming join — which is what the
    simhash_near_dup_exact oracle twin certifies cross-engine.

    Returns (id_a, id_b, hamming) with hamming ≤ max_hamming.
    """
    chunk_bits = 64 // chunks
    mask = (1 << chunk_bits) - 1
    sh = sig.select(
        F.col(id_col).alias("__id"), F.col(sig_col).alias("__sh")
    )
    banded = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(chunks - 1)),
                lambda i: F.struct(
                    i.alias("chunk"),
                    F.call_function(
                        "shiftrightunsigned", F.col("__sh"), i * chunk_bits
                    )
                    .bitwiseAND(F.lit(mask).cast("long"))
                    .alias("key"),
                ),
            )
        ).alias("ck"),
    ).select("__id", "__sh", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# -- n-gram Jaccard (block + verify, no sketch) ------------------------------


def blocked_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1,
    threshold: float = 0.5,
    touch_pred: Column | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity for all pairs within a blocking key
    (e.g. same language+source). Exact — use when a natural blocking
    key bounds the pair count; otherwise prefer minhash_dedup.
    Returns (id_a, id_b, jaccard ≥ threshold).

    Implemented as df-ordered PREFIX FILTERING (the AllPairs/PPJoin
    candidate rule): tokens are globally ordered by (document
    frequency asc, token) within each block, and each doc exposes only
    its first |A| − ⌈τ·|A|⌉ + 1 rarest tokens to the inverted-index
    self-join. Any pair with J(A,B) ≥ τ must collide inside both
    prefixes under a shared total order, so the candidate set is
    lossless — but high-df tokens (stopwords at k=1) fall OUT of every
    non-trivial prefix, eliminating the O(df²) posting-list blowup an
    unfiltered inverted index pays on open-web corpora. Candidates are
    then exactly verified with one array_intersect per pair.

    All data movement is (block, token)- or id-keyed shuffles of
    scalars; full shingle sets are joined only for verified-candidate
    ids (candidates ≪ n²). The per-doc rank window partitions by
    (block, id) — no global sort.

    ``touch_pred`` (a predicate over ``df``'s columns) restricts the
    output to pairs where AT LEAST ONE side satisfies it, and pushes
    that restriction into candidate generation — pairs between two
    non-matching docs are cut BEFORE the verify join fetches their
    shingle arrays. This is the incremental-dedup shape: a new batch
    (pred-matching, ≪ corpus) must be compared against everything,
    but corpus×corpus pairs are wasted work the caller discards."""
    assert threshold > 0.0, "prefix filtering requires threshold > 0"
    from pyspark.sql import Window

    # spread BEFORE shingling: the shingle expression is the per-row
    # hot spot and must not inherit a single-file scan's partitioning.
    # NO persist: the shingle table is corpus-sized, so caching it at
    # 100 TB means materializing (and spilling) a second copy of the
    # corpus — re-running the scan-speed narrow map in each of the
    # three consuming branches is cheaper at every scale (measured
    # 3.5 s vs 4.8 s at sf0.1 too); the eager localCheckpoint below
    # still materializes the RESULT once for iterative callers (CC).
    touch = (
        touch_pred if touch_pred is not None else F.lit(True)
    ).cast("boolean").alias("__touch")
    sh = spread(df).select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        shingles(text_col, k).alias("__sh"),
        touch,
    )
    tok = sh.select(
        *block_cols,
        "__id",
        "__touch",
        F.size("__sh").alias("__n"),
        F.explode("__sh").alias("__tok"),
    )
    # document frequency per (block, token): a COUNT WINDOW over the
    # token key (r12) — one (block, tok) shuffle of the exploded table,
    # no join, no second evaluation of the shingle branch. The r11
    # shape (groupBy + merge-pinned join back) shuffled the SAME full
    # occurrence table by (block, tok) for the SMJ probe side AND
    # re-ran scan→shingle→explode under the count side, so the window
    # is skew-neutral (a hot token's occurrences land in one partition
    # either way; WindowExec's group buffer spills, it does not
    # collect) and strictly cheaper: one exchange and one shingle
    # branch instead of two of each (measured: the shingle subtree was
    # executing 4x per call — Spark does no cross-leg CSE).
    # df counts the WHOLE block (touch-pred docs included) so the token
    # order — and therefore every prefix — is identical with or without
    # touch_pred; only the pair condition below changes.
    wdf = Window.partitionBy(*block_cols, "__tok")
    # rank each doc's tokens by the block-global (df, token) order;
    # keep the prefix: rank ≤ n − ceil(τ·n) + 1
    w = Window.partitionBy(*block_cols, "__id").orderBy("__df", "__tok")
    prefix = (
        tok.withColumn("__df", F.count("*").over(wdf))
        .withColumn("__rank", F.row_number().over(w))
        .filter(
            F.col("__rank")
            <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
        )
        .select(*block_cols, "__id", "__n", "__tok", "__touch")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # length filter (lossless, AllPairs): J(A,B) ≥ τ forces
    # τ·|B| ≤ |A| — pairs with incompatible set sizes are cut
    # before the verify join ever fetches their shingle arrays
    cond = (
        (F.col("a.__id") < F.col("b.__id"))
        & (F.col("a.__tok") == F.col("b.__tok"))
        & (F.col("a.__n") >= F.lit(threshold) * F.col("b.__n"))
        & (F.col("b.__n") >= F.lit(threshold) * F.col("a.__n"))
    )
    if touch_pred is not None:
        cond = cond & (F.col("a.__touch") | F.col("b.__touch"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # prefix x prefix is the inverted-index SELF-join: both legs are
    # the same corpus-proportional posting table — same merge pin as
    # the count-back join above (a broadcast of one leg is the same
    # estimate error twice)
    cand = spread_by(
        a.join(b.hint("merge"), cond)
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"]),
        "id_a",
        "id_b",
    )
    sets = sh.select("__id", "__sh")
    withs = cand.join(
        sets.withColumnsRenamed({"__id": "id_a", "__sh": "__sa"}), "id_a"
    ).join(sets.withColumnsRenamed({"__id": "id_b", "__sh": "__sb"}), "id_b")
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size("__sa") + F.size("__sb") - inter
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union.cast("double"))
    result = (
        withs.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    # eager: materializes the surviving edge list and truncates
    # lineage — iterative consumers (connected components) must not
    # re-derive the whole candidate pipeline every round
    return result.localCheckpoint(eager=True)


def containment_pairs(
    df: DataFrame,
    block_cols: list[str],
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
    checkpoint: bool = True,
) -> DataFrame:
    """Asymmetric set containment C(A,B) = |A∩B| / |A| over k-gram
    shingle sets, within a blocking key: detects documents EMBEDDED in
    larger ones (quotes, mirrored boilerplate, page-in-crawl) that
    symmetric Jaccard misses — a long B dilutes J(A,B) below any
    useful threshold while C(A,B) stays ≈ 1 (Broder's containment,
    "On the resemblance and containment of documents", 1997).
    Returns (id_a, id_b, containment ≥ τ): id_a's shingles are ≥ τ
    covered by id_b's. Both directions are reported independently.

    Scale shape mirrors ``blocked_jaccard_pairs`` with the prefix rule
    adapted to asymmetry: only the CONTAINED side (A) can prune — it
    exposes its ⌊(1−τ)·|A|⌋ + 1 rarest tokens (pigeonhole: a pair with
    C ≥ τ shares a token inside A's first misses+1 under any shared
    total order) — while the containing side (B) must stay fully
    indexed, plus the size cut |B| ≥ τ·|A|. High-df tokens fall out of
    every A-prefix, so posting lists still never self-join at O(df²).
    Verification fetches shingle arrays for candidate ids only;
    ``containment`` is an exact-integer ratio (bit-identical across
    engines)."""
    assert threshold > 0.0, "prefix filtering requires threshold > 0"
    from pyspark.sql import Window

    sh = spread(df).select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        shingles(text_col, k).alias("__sh"),
    ).persist()
    try:
        tok = sh.select(
            *block_cols,
            "__id",
            F.size("__sh").alias("__n"),
            F.explode("__sh").alias("__tok"),
        )
        # df as a count window over (block, tok) — one shuffle, no
        # join-back, no second shingle branch; skew-neutral vs the old
        # merge-pinned SMJ probe side (see blocked_jaccard_pairs, r12)
        ranked = tok.withColumn(
            "__df",
            F.count("*").over(Window.partitionBy(*block_cols, "__tok")),
        )
        w = Window.partitionBy(*block_cols, "__id").orderBy("__df", "__tok")
        # A-side prefix: rank ≤ |A| − ⌈τ·|A|⌉ + 1 rarest tokens
        prefix = (
            ranked.withColumn("__rank", F.row_number().over(w))
            .filter(
                F.col("__rank")
                <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
            )
            .select(*block_cols, "__id", "__n", "__tok")
        )
        full = ranked.select(*block_cols, "__id", "__n", "__tok")
        a, b = prefix.alias("a"), full.alias("b")
        cond = (
            (F.col("a.__id") != F.col("b.__id"))
            & (F.col("a.__tok") == F.col("b.__tok"))
            & (F.col("b.__n") >= F.lit(threshold) * F.col("a.__n"))
        )
        for c in block_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        cand = spread_by(
            a.join(b.hint("merge"), cond)
            .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]),
            "id_a",
            "id_b",
        )
        sets = sh.select("__id", "__sh")
        withs = cand.join(
            sets.withColumnsRenamed({"__id": "id_a", "__sh": "__sa"}), "id_a"
        ).join(sets.withColumnsRenamed({"__id": "id_b", "__sh": "__sb"}), "id_b")
        inter = F.size(F.array_intersect("__sa", "__sb"))
        cont = inter / F.size("__sa").cast("double")
        result = (
            withs.select("id_a", "id_b", cont.alias("containment"))
            .filter(F.col("containment") >= F.lit(threshold))
        )
        # checkpoint=False exposes the full lazy plan (plan-quality
        # gates); default True materializes so the cache can release
        return result.localCheckpoint(eager=True) if checkpoint else result
    finally:
        sh.unpersist()


_BAG_ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def edit_near_dups(
    df: DataFrame,
    block_cols: list[str],
    rel_threshold: float = 0.15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-level near-dup pairs: Levenshtein distance ≤
    τ·max(len) over whitespace-normalized lowercase text, within a
    blocking key. The character-edit modality catches OCR noise,
    mojibake variants, and small in-place edits that token-set
    measures (Jaccard/MinHash) blur and window hashing misses.
    Returns (id_a, id_b, distance, edit_sim = 1 − d/max(len)).

    Scale shape (the DP is the expensive part — O(len²) per pair
    naively):
    - pairs form only within a block, with the lossless length cut
      |len_a − len_b| ≤ τ·max(len) (an edit script must bridge the
      length gap);
    - a CHARACTER-BAG lower bound prunes before any DP: bag(a,b) =
      max(Σ max(0, cnt_a(c)−cnt_b(c)), Σ max(0, cnt_b(c)−cnt_a(c)))
      ≤ lev(a,b) (each edit fixes at most one count), the Ed-Join
      family's count-filter. Counting over a SUBSET alphabet keeps
      the bound lossless — uncounted characters only make it smaller;
    - the surviving pairs run Spark's THRESHOLDED levenshtein (banded
      DP, O(d·len) not O(len²)) with the PER-PAIR band
      ⌊τ·max(len_a, len_b)⌋ — the narrowest lossless band; the
      sentinel −1 return above the band doubles as the threshold
      filter, so the DP runs exactly once per surviving candidate
      (two references to the distance in a filter would each
      re-evaluate it inside the join condition — measured as the
      operator's top cost).

    Exactness note for oracles: Spark's levenshtein is per-CHARACTER;
    DuckDB's is per-BYTE — identical on ASCII corpora (this testdata),
    divergent on multi-byte text. ``distance`` is an exact integer and
    ``edit_sim`` a ratio of exact integers (bit-identical)."""
    norm = F.regexp_replace(
        F.lower(F.trim(F.col(text_col) if isinstance(text_col, str) else text_col)),
        r"\s+",
        " ",
    )
    t = spread(df).select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        norm.alias("__t"),
    ).withColumn("__len", F.length("__t")).withColumn(
        "__bag",
        F.array(
            *[
                F.length("__t")
                - F.length(F.regexp_replace("__t", re.escape(ch), ""))
                for ch in _BAG_ALPHABET
            ]
        ),
    )
    a = t.alias("a")
    b = t.alias("b")
    dmax = F.lit(rel_threshold) * F.greatest(F.col("a.__len"), F.col("b.__len"))
    over = F.zip_with(
        "a.__bag", "b.__bag", lambda x, y: F.greatest(x - y, F.lit(0))
    )
    under = F.zip_with(
        "a.__bag", "b.__bag", lambda x, y: F.greatest(y - x, F.lit(0))
    )
    bag = F.greatest(
        F.aggregate(over, F.lit(0), lambda acc, x: acc + x),
        F.aggregate(under, F.lit(0), lambda acc, x: acc + x),
    )
    # per-pair banded DP: threshold ⌊τ·max(len)⌋ makes the sentinel −1
    # return THE threshold test (d ≤ τ·maxlen ⟺ d ≤ ⌊τ·maxlen⌋ for
    # integer d), so one levenshtein call replaces the two the old
    # (d ≥ 0 AND d ≤ τ·maxlen) filter expanded to inside the join
    # condition — and the global max-length aggregate job is gone
    lev = F.expr(
        "levenshtein(a.__t, b.__t, "
        f"cast(floor({rel_threshold} * greatest(a.__len, b.__len)) as int))"
    )
    # the DP sits behind a CASE so its guards are ORDER-GUARANTEED
    # cheapest-first: id<, the length band, then the bag bound, then —
    # only for candidates surviving all three — the banded DP. Plain
    # AND conjuncts in a join condition carry no evaluation-order
    # contract (the optimizer's merged condition ran the DP before the
    # trivial id/length tests — measured as the operator's top cost).
    guarded = (
        F.when(
            (F.col("a.__id") < F.col("b.__id"))
            & (F.abs(F.col("a.__len") - F.col("b.__len")) <= dmax)
            & (bag <= dmax),
            lev,
        ).otherwise(F.lit(-1))
        >= 0
    )
    cond = guarded
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            # survivors are the true near-dup pairs — a vanishing
            # fraction — so re-evaluating the DP here for the output
            # column costs nothing while keeping the join condition
            # free of a projected-column dependency
            lev.alias("distance"),
            F.greatest(F.col("a.__len"), F.col("b.__len")).alias("__maxlen"),
        )
        .select(
            "id_a",
            "id_b",
            "distance",
            # both-empty normalized texts (maxlen 0) are identical:
            # sim 1.0, not 0/0 (ANSI mode raises on the division —
            # found by hypothesis)
            F.when(F.col("__maxlen") == 0, F.lit(1.0))
            .otherwise(
                F.lit(1) - F.col("distance") / F.col("__maxlen").cast("double")
            )
            .alias("edit_sim"),
        )
    )


# -- sliding-window substring duplication (Lee et al. 2022) ------------------


def window_dup_stats(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document substring-duplication stats over sliding k-token
    windows — the hash-bucketed relaxation of exact-substring dedup
    ("Deduplicating Training Data Makes Language Models Better", Lee
    et al. 2022: suffix-array ExactSubstr with a 50-token threshold).
    A window is *duplicated* when the identical k-token string occurs
    at ≥ 2 positions anywhere in the corpus (including within the same
    document). Returns ``(id_col, n_windows, dup_windows, dup_frac)``;
    a high ``dup_frac`` marks documents that are mostly boilerplate or
    near-copies and is the per-doc removal criterion.

    Scale shape: windows are hashed to 8-byte xxhash64 longs at the
    explode — every shuffle (per-doc window counts, corpus-wide window
    counts, the count-back join) carries longs, never k-token strings.
    The count-back join keys equal the groupBy keys, so AQE reuses the
    aggregation's partitioning instead of re-shuffling. Collision
    note: 64-bit hashing merges ~n²/2⁶⁵ window pairs spuriously
    (≈ 3·10⁴ false-dup windows per 10¹² windows at 100 TB) — the
    documented accuracy trade of hash-based ExactSubstr variants; the
    suffix-array-exact path costs a raw-string shuffle instead.

    ``dup_frac`` is a ratio of exact integer counts — one IEEE
    division, bit-identical in any engine (determinism contract)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # docs shorter than k tokens contribute their whole token tuple as
    # one window — same degenerate-doc rule as shingles()
    # project to the two needed columns, then spread: the tokenize +
    # per-window xxhash64 is the CPU of this operator, and a
    # single-file table scans as ONE task (measured: the two explode
    # passes ran as two concurrent 4.6 s single tasks while 30 cores
    # idled). spread() is a no-op once the scan already carries >=
    # defaultParallelism partitions, so real-scale inputs never pay
    # the extra text shuffle.
    src = spread(df.select(F.col(id_col), c.alias("__t")))
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("__t"))), r"\s+", " "), " "
    )
    n = F.size(toks)
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, k), " ")),
    )
    win = src.select(F.col(id_col), F.explode(wins).alias("__wh"))
    per = win.groupBy(id_col, "__wh").agg(F.count("*").alias("__c"))
    # corpus-wide totals from the NARROW explode branch, joined back.
    # Not from `per` (that re-executes per's shuffle — verified zero
    # ReusedExchange) and not as a window over __wh (a boilerplate
    # window duplicated across 10^8 docs would land in ONE partition;
    # the groupBy partial-aggregates it map-side and AQE skew-splits
    # the join). The duplicated subtree is scan-speed only.
    tot = win.groupBy("__wh").agg(F.count("*").alias("__tot"))
    withtot = per.join(tot, "__wh")
    dup = F.when(F.col("__tot") >= 2, F.col("__c")).otherwise(F.lit(0))
    return withtot.groupBy(id_col).agg(
        F.sum("__c").cast("int").alias("n_windows"),
        F.sum(dup).cast("int").alias("dup_windows"),
        (F.sum(dup) / F.sum("__c").cast("double")).alias("dup_frac"),
    )


# -- duplicate-cluster resolution (connected components) ---------------------


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve a near-dup edge list into duplicate clusters:
    ``(node, cluster_id)`` with ``cluster_id`` = the component's
    minimum node id. This is the step that turns pairwise similarity
    edges into a keep-one-per-cluster decision (canonical doc =
    ``node == cluster_id``). Singleton docs never enter the edge list
    and are implicitly their own cluster — callers left-anti-join to
    keep them.

    Iterative distributed min-label propagation: every round each node
    adopts the minimum label among itself and its neighbors — one
    label-sized shuffle per round, converging in ≤ graph-diameter
    rounds. :func:`connected_components_star` (Kiveris et al.,
    "Connected Components in MapReduce", SoCC'14) is the DEFAULT used
    by the registry: it converges in O(log n) rounds regardless of
    diameter and measures at parity with this even on diameter-2-4
    near-dup graphs (r5 sf0.1: 2.9 s vs 3.1 s), so it dominates —
    min-label stays as the simpler property-test cross-check
    (property-tested equal on random graphs). Each round's labels are eagerly
    ``localCheckpoint``-ed — iterative lineage otherwise grows a plan
    Catalyst re-optimizes from scratch every round.
    """
    # The edge list is STATIC across rounds — hash-partition it on the
    # probe key once and cache it. Cached partitioning is visible to
    # Catalyst (InMemoryRelation reports outputPartitioning), and
    # localCheckpoint preserves the labels' partitioning likewise, so
    # each round's two joins are exchange-free on the cached/label
    # sides; the only per-round shuffle left is the min-label groupBy —
    # the propagation itself. At a billion edges that is the difference
    # between 1 and 3 full-edge shuffles per round.
    # Symmetrize with ONE explode, not a union of two selects — a union
    # duplicates the upstream edge-producing subtree in the plan
    # (Catalyst does not common-subexpression-eliminate across union
    # branches), so an expensive edge source (e.g. blocked Jaccard)
    # would run twice.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .repartition(F.col("dst"))
        .persist()
    )
    try:
        labels = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        # convergence detector: per-node labels are monotonically
        # non-increasing, so the exact integer SUM of labels strictly
        # decreases while anything changes — one cheap aggregate per
        # round instead of an old⋈new comparison join
        prev_sum = labels.agg(F.sum("label")).first()[0]
        for _ in range(max_iterations):
            nbr = (
                sym.join(labels, sym["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
            )
            labels = (
                labels.join(nbr, labels["node"] == nbr["src"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nbr_label"), F.col("label")),
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            cur_sum = labels.agg(F.sum("label")).first()[0]
            if cur_sum == prev_sum:
                return labels
            prev_sum = cur_sum
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
            " — component diameter exceeds the bound; raise max_iterations or"
            " switch to connected_components_star"
        )
    finally:
        sym.unpersist()


# -- incremental dedup (batch vs persistent index) ---------------------------


def incremental_exact_dedup(
    df: DataFrame,
    batch_pred: Column,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-verification twin of :func:`incremental_minhash_dedup`'s
    survivor rule, for cross-engine checking: rows where ``batch_pred``
    holds are the NEW batch, the rest are the established corpus, and a
    batch doc is dropped iff it has an exact-Jaccard edge (≥ threshold,
    within a block) to ANY corpus doc or to a LOWER-id batch doc —
    matching a dropped doc still drops you, so the rule needs no
    transitive closure (the same greedy keep-first contract as the
    MinHash form, whose signature-estimated edges are not
    SQL-expressible). Returns the surviving batch rows.

    Scale shape: the batch predicate is pushed INTO
    :func:`blocked_jaccard_pairs` candidate generation (``touch_pred``)
    so corpus×corpus pairs — the overwhelming majority when
    batch ≪ corpus — are never verified; the kill set is one
    single-pass projection over the surviving edge list plus one
    broadcast-able anti-join (killed ids ≪ batch)."""
    edges = blocked_jaccard_pairs(
        df, block_cols, id_col=id_col, text_col=text_col, k=k,
        threshold=threshold, touch_pred=batch_pred,
    )
    flags = df.select(
        F.col(id_col).alias("__fid"), batch_pred.alias("__is_batch")
    )
    e = (
        edges.join(
            flags.withColumnsRenamed(
                {"__fid": "id_a", "__is_batch": "__ba"}
            ),
            "id_a",
        ).join(
            flags.withColumnsRenamed(
                {"__fid": "id_b", "__is_batch": "__bb"}
            ),
            "id_b",
        )
    )
    # id_a < id_b by construction: batch-vs-corpus edges kill the batch
    # side regardless of order; batch-vs-batch edges kill the higher id.
    # Single pass over the edge list (one CASE), not 3 filter+union arms.
    killed = (
        e.select(
            F.when(F.col("__ba") & ~F.col("__bb"), F.col("id_a"))
            .when(F.col("__bb"), F.col("id_b"))
            .alias(id_col)
        )
        .filter(F.col(id_col).isNotNull())
        .distinct()
    )
    return df.filter(batch_pred).join(killed, id_col, "left_anti")


def minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """Build the persistent dedup index for a corpus: (__id, __sig)
    MinHash signatures. A recurring ingestion pipeline writes this once
    per corpus snapshot (bucketed by __id) and probes it with every new
    batch — the 100 TB corpus is never re-shingled. The banded key
    table is derived per probe via ``band_signatures`` (a narrow map,
    cheap relative to re-reading text)."""
    return minhash_signatures(df, id_col, text_col, k, num_hashes)


def signature_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard similarity = fraction of agreeing MinHash
    lanes. Standard deviation ~ sqrt(J(1-J)/num_hashes) (~0.06 at 64
    lanes) — the estimator the index-only verify path uses when the
    corpus text is too expensive to re-read."""
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda a, b: a == b), lambda x: x))
    return agree / F.size(sig_a).cast("double")


def incremental_minhash_dedup(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch of documents against an existing corpus index
    (and against itself) WITHOUT touching corpus text — the recurring-
    ingestion pattern: each crawl snapshot probes the index, survivors
    are appended to both the corpus and the index.

    Verification is signature-estimated Jaccard (``signature_jaccard``
    ≥ threshold): index-only, no corpus re-read. Within the batch the
    keep rule is greedy keep-first by id — a new doc is dropped iff it
    matches an index doc or ANY lower-id batch doc (matching a dropped
    doc still drops you: duplicate-of-duplicate chains collapse to the
    first representative, same contract as ``connected_components``
    keep-min).

    Returns ``(survivors, updated_index)`` — survivors is the batch
    rows that were kept; updated_index = index ∪ survivor signatures.

    Scale shape: batch signatures are a narrow map over the batch only;
    the probe joins banded keys — (band, sig, id) tuples, never text.
    With the index stored bucketed on (band, sig) the probe side alone
    shuffles. Both returned frames are lazy plans; the caller persists
    the updated index (that write is the pipeline's commit point).
    """
    # lazy checkpoint: the signature table is referenced five times below
    # (banding twice, two verify joins, the index update) — truncate its
    # lineage on first materialization so the shingle pass runs once, not
    # per reference, while keeping the return values lazy plans
    sig_new = minhash_signatures(batch, id_col, text_col, k, num_hashes).localCheckpoint(
        eager=False
    )
    banded_new = band_signatures(sig_new, num_hashes, bands)
    b_new = banded_new.alias("n")
    b_idx = band_signatures(index, num_hashes, bands).alias("i")

    # candidates vs the existing index
    cand_idx = (
        b_new.join(b_idx, (F.col("n.band") == F.col("i.band")) & (F.col("n.sig") == F.col("i.sig")))
        .select(F.col("n.__id").alias("new_id"), F.col("i.__id").alias("old_id"))
        .distinct()
    )
    # candidates within the batch (greedy: only lower-id docs can kill)
    b2 = banded_new.alias("m")
    cand_self = (
        b_new.join(
            b2,
            (F.col("n.band") == F.col("m.band"))
            & (F.col("n.sig") == F.col("m.sig"))
            & (F.col("n.__id") > F.col("m.__id")),
        )
        .select(F.col("n.__id").alias("new_id"), F.col("m.__id").alias("old_id"))
        .distinct()
    )

    def _verified(cands: DataFrame, other_sig: DataFrame) -> DataFrame:
        j = (
            cands.join(sig_new.withColumnsRenamed({"__id": "new_id", "__sig": "sig_n"}), "new_id")
            .join(other_sig.withColumnsRenamed({"__id": "old_id", "__sig": "sig_o"}), "old_id")
        )
        est = signature_jaccard(F.col("sig_n"), F.col("sig_o"))
        return j.select("new_id").where(est >= threshold)

    killed = _verified(cand_idx, index).union(_verified(cand_self, sig_new)).distinct()
    survivors = batch.join(
        killed.withColumnRenamed("new_id", id_col), id_col, "left_anti"
    )
    updated_index = index.unionByName(
        sig_new.join(
            killed, sig_new["__id"] == killed["new_id"], "left_anti"
        ).select("__id", "__sig")
    )
    return survivors, updated_index


def connected_components_star(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 30,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    documented upgrade path from :func:`connected_components` for
    graphs whose component DIAMETER is large: min-label propagation
    needs diameter rounds, this contracts paths aggressively and
    converges in O(log n) rounds regardless of diameter. Same output
    contract: (node, label) with label = component minimum.

    Per round: LARGE-STAR hangs every neighbor LARGER than the center
    onto the center's minimum (strictly decreases large-neighbor
    potential, never disconnects); SMALL-STAR re-hangs the ≤-center
    neighbors onto their minimum. Each op is one per-center MIN WINDOW
    over the adjacency (r12: the old per-op groupBy + join-back
    evaluated the adjacency explode twice and paid two exchanges; the
    window is one exchange, one evaluation, and the same partitioning
    the join's probe side already imposed, so hub-center skew is
    unchanged — WindowExec's group buffer spills, it does not
    ``collect_set`` the neighborhood onto one row). Fixed point =
    every node points directly at its component min (a star).

    This is the registry default (dedup_clusters): measured at parity
    with min-label even on diameter-2-4 near-dup graphs (r5 sf0.1:
    2.9 s vs 3.1 s) and strictly better in the long-chain regime;
    property-tested equal to min-label on random graphs.
    """
    cur = (
        edges.select(
            F.col(id_a).cast("long").alias("u"),
            F.col(id_b).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        # lazy (r13): materializes inside round 1's first job instead
        # of a separate blocking checkpoint job; lineage truncation is
        # immediate either way
        .localCheckpoint(eager=False)
    )
    prev = None
    prev_count = None
    for _ in range(max_iterations):
        # large-star: center u over symmetrized adjacency; m = min of
        # closed neighborhood; every neighbor w > u re-hangs onto m
        adj = cur.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("c"), F.col("v").alias("n")),
                    F.struct(F.col("v").alias("c"), F.col("u").alias("n")),
                )
            ).alias("e")
        ).select("e.c", "e.n")
        ls = (
            adj.withColumn(
                "m",
                F.least(
                    F.min("n").over(Window.partitionBy("c")), F.col("c")
                ),
            )
            .filter(F.col("n") > F.col("c"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star: center u over the high→low orientation; its ≤
        # neighbors (and u itself) all hang onto the minimum — emitted
        # as (n → m) per row plus (c → m) per row; the (c, m) copies
        # collapse in the distinct below
        ssw = ls.select(
            F.greatest("u", "v").alias("c"), F.least("u", "v").alias("n")
        ).withColumn("m", F.min("n").over(Window.partitionBy("c")))
        cur = (
            ssw.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("n").alias("u"), F.col("m").alias("v")
                        ),
                        F.struct(
                            F.col("c").alias("u"), F.col("m").alias("v")
                        ),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            # lazy (r13): the convergence count() two lines down is the
            # action that materializes this round's edge set — eager
            # paid a second full job per round for the same blocks
            .localCheckpoint(eager=False)
        )
        # EXACT fixed-point test — both sides are distinct edge sets,
        # so equality is (same count) ∧ (cur ⧵ prev = ∅). An endpoint-
        # sum signature can collide between distinct consecutive sets
        # (e.g. {(3,1),(4,2)} vs {(4,1),(3,2)}) and silently return
        # wrong labels; one anti-join per round is the honest cost.
        # prev's count is carried over from its own round — re-counting
        # the checkpointed prev every round was a pure extra job.
        cur_count = cur.count()
        if prev is not None and cur_count == prev_count:
            if cur.join(prev, ["u", "v"], "left_anti").isEmpty():
                break
        prev = cur
        prev_count = cur_count
    else:
        raise RuntimeError(
            "connected_components_star did not converge in"
            f" {max_iterations} rounds"
        )
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    return cur.select(
        F.col("u").alias("node"), F.col("v").alias("label")
    ).unionByName(roots)


def build_blocked_bloom(
    keys_df: DataFrame,
    key_col: str,
    bits_per_key: int = 10,
    k_probes: int = 7,
    block_bits: int = 32768,
) -> dict:
    """Distributed BLOCKED Bloom filter over a key column (Putze et
    al.'s cache-efficient variant, the shape join runtime filters and
    Iceberg's bloom write options use): each key hashes to ONE
    ``block_bits``-bit block and sets ``k_probes`` bits inside it via
    double hashing, so the build repartitions keys BY BLOCK and each
    task materializes only its own blocks — shuffle is O(keys), never
    O(keys × k), and the assembled filter is ``n·bits_per_key/8``
    bytes regardless of key width. Hashing is JVM-side ``xxhash64``
    (deterministic across engines and runs); bit math is vectorized
    numpy inside ``applyInPandas``. Returns ``{"n_blocks",
    "block_bits", "k", "blocks": bytes}``.

    100 TB note: at 10^9 keys / 10 bits the filter is ~1.25 GB — a
    broadcastable probe-side constant where the exact key set would
    be a shuffle join against the full corpus; beyond broadcast
    comfort, shard the probe by block range (join batch rows to their
    block's bytes) instead of shipping the whole filter. fpp at these
    defaults ≈ 1% (standard (1-e^{-k/c})^k with c=bits_per_key, plus
    a small blocked-variant penalty); Bloom NO-false-negative
    guarantee is what downstream exactness rides on."""
    import math

    import numpy as np
    import pandas as pd

    n = keys_df.select(key_col).count()
    n_blocks = max(1, math.ceil(max(n, 1) * bits_per_key / block_bits))
    block_bytes = block_bits // 8
    hashed = keys_df.select(
        F.xxhash64(F.col(key_col)).alias("__h")
    ).withColumn(
        "__blk", F.pmod(F.col("__h"), F.lit(n_blocks)).cast("int")
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        u = np.ascontiguousarray(
            pdf["__h"].values.astype(np.int64)
        ).view(np.uint64)
        arr = np.zeros(block_bytes, np.uint8)
        h1 = u >> np.uint64(32)
        h2 = (u & np.uint64(0xFFFFFFFF)) | np.uint64(1)
        for i in range(k_probes):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(block_bits)
            np.bitwise_or.at(
                arr,
                (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
        return pd.DataFrame(
            {"block": [int(pdf["__blk"].iloc[0])], "bits": [arr.tobytes()]}
        )

    rows = (
        hashed.groupBy("__blk")
        .applyInPandas(_build, "block int, bits binary")
        .collect()
    )
    blocks = bytearray(n_blocks * block_bytes)
    for r in rows:
        blocks[r.block * block_bytes : (r.block + 1) * block_bytes] = r.bits
    return {
        "n_blocks": n_blocks,
        "block_bits": block_bits,
        "k": k_probes,
        "blocks": bytes(blocks),
    }


def bloom_maybe_contains(
    df: DataFrame,
    key_col: str,
    bloom: dict,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Probe a :func:`build_blocked_bloom` filter: adds ``out_col``
    (boolean) — False is DEFINITE absence (the no-false-negative
    guarantee), True is membership up to the filter's fpp. The filter
    bytes ship once per executor via a Spark broadcast; the probe is
    an Arrow-batched pandas UDF doing pure vectorized bit tests, so
    the per-row cost is a few numpy ops against a cache-resident
    block."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    n_blocks = bloom["n_blocks"]
    block_bits = bloom["block_bits"]
    k = bloom["k"]
    block_bytes = block_bits // 8
    # ONE broadcast per filter, cached on the dict: a fresh broadcast
    # per probe call would pin another full copy of the filter bytes
    # on the driver and every executor until GC + ContextCleaner
    # happen to reclaim it — at the 1e9-key design point (~1.25 GB)
    # a repeated-probe loop (bench sweeps, per-micro-batch CDC)
    # exhausts executor memory (r12 review)
    bc = bloom.get("_broadcast")
    if bc is None:
        bc = SparkSession.getActiveSession().sparkContext.broadcast(
            bloom["blocks"]
        )
        bloom["_broadcast"] = bc

    # no type hints: under `from __future__ import annotations` the
    # stringified pd.Series hint is unresolvable in this scope and
    # pandas_udf's inference rejects it; hint-less defaults to SCALAR
    @pandas_udf("boolean")
    def _probe(h):
        arr = np.frombuffer(bc.value, np.uint8)
        s = np.ascontiguousarray(h.values.astype(np.int64))
        u = s.view(np.uint64)
        # block id must match the BUILD side's JVM pmod on SIGNED
        # int64 — numpy's % on int64 has divisor-sign semantics,
        # identical to pmod; an unsigned modulo here would diverge
        # for negative hashes and manufacture FALSE NEGATIVES
        blk = (s % np.int64(n_blocks)).astype(np.uint64)
        base = blk * np.uint64(block_bytes)
        h1 = u >> np.uint64(32)
        h2 = (u & np.uint64(0xFFFFFFFF)) | np.uint64(1)
        res = np.ones(len(u), bool)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(block_bits)
            byte_idx = (base + (pos >> np.uint64(3))).astype(np.int64)
            bit = (pos & np.uint64(7)).astype(np.uint8)
            res &= ((arr[byte_idx] >> bit) & np.uint8(1)) == 1
        return pd.Series(res)

    return df.withColumn(
        out_col, _probe(F.xxhash64(F.col(key_col)))
    )


def bloom_incremental_dedup(
    corpus_keys: DataFrame,
    batch_df: DataFrame,
    key_col: str,
    bits_per_key: int = 10,
    k_probes: int = 7,
    bloom: dict | None = None,
) -> DataFrame:
    """EXACT incremental dedup through a Bloom PREFILTER — the
    standard 100 TB shape for 'dedupe this batch against a 10^10-key
    corpus': rows the filter proves absent (no false negatives) skip
    the expensive membership join entirely; only the maybe-seen
    sliver — true matches plus ~fpp false positives — pays the exact
    anti-join against the corpus keys. The result is EXACTLY the
    plain anti-join's (false positives are weeded by the verify), so
    correctness never depends on fpp; fpp only moves the join input
    size. Compare :func:`incremental_exact_dedup` (content
    similarity): this is the identity-key fast path a CDC-style
    ingest runs first. ``bloom=`` reuses a prebuilt
    :func:`build_blocked_bloom` filter (recurring batches against one
    corpus build once, probe many). The key columns must have EQUAL
    types on both sides: xxhash64 is type-sensitive while Spark's
    equality join coerces, so a bigint corpus probed by a string
    batch would hash-miss true members into definite-new and SILENTLY
    return duplicates — refused loudly instead (r12 review)."""
    ct = dict(corpus_keys.dtypes)[key_col]
    bt = dict(batch_df.dtypes)[key_col]
    if ct != bt:
        raise ValueError(
            f"bloom_incremental_dedup: key column {key_col!r} types "
            f"differ (corpus {ct!r} vs batch {bt!r}) — xxhash64 is "
            f"type-sensitive, so a coercing join would diverge from "
            f"the probe; cast one side first"
        )
    if bloom is None:
        bloom = build_blocked_bloom(
            corpus_keys, key_col, bits_per_key=bits_per_key,
            k_probes=k_probes,
        )
    flagged = bloom_maybe_contains(batch_df, key_col, bloom)
    definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    survivors = (
        flagged.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(
            corpus_keys.select(F.col(key_col)).distinct(),
            key_col,
            "left_anti",
        )
    )
    return definite_new.unionByName(survivors)
