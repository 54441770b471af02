"""Deterministic numeric aggregation helpers.

A ``SUM(double)`` over a distributed dataset is order-dependent (IEEE
addition is not associative), so two engines — or two runs of the same
engine with different partitioning — produce last-ulp-different results.
That breaks (a) value-hash comparison against an oracle and (b)
reproducibility of pipeline outputs at scale.

The fix used throughout this engine: accumulate in exact DECIMAL (each
input double is rounded to a fixed scale once, deterministically; decimal
addition is exact and associative) and cast the final result back to
DOUBLE. The result is bit-identical regardless of partitioning, engine,
or degree of parallelism, while the per-row cast at scale 4 is lossless
for currency-like data (the reference casts its money columns to
DECIMAL(10,2)/(12,2) anyway — ``build_gold_layer.py:65-89``).

Averages divide the exact decimal sum (as double) by the count — one
deterministic double division instead of an order-dependent running mean.

Each helper has a Spark form and a SQL-string form usable verbatim in
both Spark SQL and the DuckDB oracle, so query and oracle share the
exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale-4 accumulation: lossless for 2-dp money data, and 38-digit
# precision leaves ~20 integer digits of headroom — enough for sums over
# ~10^18 rows of 100-unit values, i.e. far past 100 TB scale.
_ACC = "decimal(30,4)"


def dsum(col: str | Column, alias: str | None = None) -> Column:
    """Exact decimal-accumulated SUM, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_ACC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: str | Column, alias: str | None = None) -> Column:
    """Deterministic AVG = exact decimal SUM (as double) / COUNT."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_ACC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """SQL form of :func:`dsum` — valid in Spark SQL and DuckDB."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,4))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """SQL form of :func:`davg` — valid in Spark SQL and DuckDB."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,4))) AS DOUBLE)"
        f" / COUNT(({expr}))"
    )


def exact_quantiles(
    df,
    value_col: str,
    fracs: list[float],
    n_buckets: int = 64,
    max_task_rows: int = 4_000_000,
    max_rounds: int = 8,
    out_prefix: str = "q",
    known_n: int | None = None,
    stats_out: dict | None = None,
):
    """Exact ``quantile_cont`` values (linear interpolation, the Spark
    ``percentile`` / DuckDB ``quantile_cont`` contract) at each of
    ``fracs``, as a ONE-ROW DataFrame with columns ``{prefix}0..k-1``
    — computed by DISTRIBUTED ITERATIVE RANK SELECTION instead of the
    built-in exact ``percentile`` aggregate, which buffers every value
    in one aggregation buffer (the classic exact-twin scale-killer
    this replaces).

    Algorithm (textbook distributed selection / histogram refinement):
    each needed global rank (⌊p·(n−1)⌋ and ⌈p·(n−1)⌉ per fraction)
    starts with the whole value range; each round, the active ranges
    are bucketized against quantile-sketch boundaries (boundary
    placement only steers balance, never the result), the ≤n_buckets
    per-range bucket counts are collected to the driver (bounded,
    like ``approxQuantile``'s driver step), and every rank narrows to
    the one bucket containing it with a residual local rank. A range
    resolves when it is constant (min == max) or small enough that a
    single task may sort it (≤ ``max_task_rows`` — the final
    per-range ``row_number`` window is bounded by construction, so no
    task ever holds more). 100 TB ≈ 10¹² rows narrows in
    ⌈log₆₃(10¹²/4·10⁶)⌉ = 3 rounds of filtered scans.

    Exactness: ranks are exact integers; the interpolation is Spark's
    own ``v_lo·(hi−pos) + v_hi·(pos−lo)`` (Percentile.getPercentile —
    the SYMMETRIC weighted form, which rounds differently in the last
    ulp from ``v_lo + f·(v_hi−v_lo)``; hypothesis found the
    counterexample), with the integral-position case returning v_lo
    directly — bit-identical to `percentile` by property test
    (driver-side Python doubles are the same IEEE 754 ops). Null
    values are excluded, like both built-ins. Empty input yields one
    all-NULL row.

    ``known_n`` skips the initial count job when the caller can PROVE
    the non-null row count (e.g. mad_outliers' second pass runs over
    ``|x − median|``, which is null exactly where pass one's input
    was — so pass one's count carries over; each count job is a full
    scan plus a driver round-trip, the dominant wall cost of the
    multi-pass exact operators at bench scale). A wrong ``known_n``
    selects wrong ranks, so only pass it on a provable identity.
    ``stats_out``, when given a dict, receives ``{"n": <count>}`` so
    a later pass can reuse the count."""
    import math

    spark = df.sparkSession
    out_cols = [f"{out_prefix}{i}" for i in range(len(fracs))]
    v = F.col(value_col)
    vals = df.select(v.cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )

    def _one_row(values):
        # ONE-partition literal frame (not createDataFrame, whose
        # parallelize backing carries defaultParallelism partitions:
        # a downstream crossJoin of two such frames planned as a
        # CartesianProduct then fans out 32x32 = 1024 near-empty
        # tasks — measured 4x the whole operator's wall, r12)
        return spark.range(0, 1, 1, 1).select(
            *[
                F.lit(val).cast("double").alias(c)
                for c, val in zip(out_cols, values)
            ]
        )

    n = known_n if known_n is not None else vals.count()
    if stats_out is not None:
        stats_out["n"] = n
    if n == 0:
        return _one_row([None] * len(fracs))

    pos = [p * (n - 1) for p in fracs]
    needed = sorted({r for p in pos for r in (math.floor(p), math.ceil(p))})

    def range_pred(lo, hi):
        # value-range of a bucket: [lo, hi) with None = open end
        p = F.lit(True)
        if lo is not None:
            p = p & (F.col("v") >= F.lit(lo))
        if hi is not None:
            p = p & (F.col("v") < F.lit(hi))
        return p

    # state per needed rank: (range_key, local_rank); ranges dedup'd
    # range_key -> (lo, hi, count_in_range)
    ranges = {(None, None): n}
    where = {r: ((None, None), r) for r in needed}
    resolved: dict[int, float] = {}

    bfr = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    for _ in range(max_rounds):
        active = sorted(
            {
                key
                for r, (key, _lr) in where.items()
                if r not in resolved and ranges[key] > max_task_rows
            },
            # open ends are None — plain tuple sort would compare
            # None with float and crash once BOTH outer ranges (e.g.
            # p=0.001 and p=0.999) stay active into the same round
            key=lambda k: (
                float("-inf") if k[0] is None else k[0],
                float("inf") if k[1] is None else k[1],
            ),
        )
        if not active:
            break
        for key in active:
            lo, hi = key
            sub = vals.where(range_pred(lo, hi))
            stats = sub.agg(
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
                F.percentile_approx("v", bfr, F.lit(100)).alias("bs"),
            ).collect()[0]
            if stats["mn"] == stats["mx"]:
                for r, (k2, _lr) in list(where.items()):
                    if k2 == key and r not in resolved:
                        resolved[r] = stats["mn"]
                continue
            bs = stats["bs"]
            bucket = F.coalesce(
                F.size(F.filter(F.lit(bs), lambda x: x <= F.col("v"))),
                F.lit(0),
            )
            counts = dict(
                sub.groupBy(bucket.alias("b"))
                .agg(F.count("*").alias("c"))
                .collect()
            )
            # bucket b's value range: [bs[b-1] or lo, bs[b] or hi)
            edges = [lo] + list(bs) + [hi]
            offset = 0
            by_bucket = {}
            for b in range(len(bs) + 1):
                c = counts.get(b, 0)
                if c:
                    by_bucket[b] = (offset, c)
                offset += c
            for r, (k2, lr) in list(where.items()):
                if k2 != key or r in resolved:
                    continue
                for b, (off, c) in by_bucket.items():
                    if off <= lr < off + c:
                        nkey = (edges[b], edges[b + 1])
                        ranges[nkey] = c
                        where[r] = (nkey, lr - off)
                        break

    # final: per remaining range, one bounded sort task picks the values
    pending: dict[tuple, list[tuple[int, int]]] = {}
    for r, (key, lr) in where.items():
        if r not in resolved:
            pending.setdefault(key, []).append((r, lr))
    from pyspark.sql import Window

    for key, items in pending.items():
        lo, hi = key
        sub = vals.where(range_pred(lo, hi))
        w = Window.partitionBy(F.lit(0)).orderBy("v")
        lrs = [lr for _r, lr in items]
        hitrows = (
            sub.withColumn("__rn", F.row_number().over(w) - 1)
            .where(F.col("__rn").isin(lrs))
            .collect()
        )
        got = {row["__rn"]: row["v"] for row in hitrows}
        for r, lr in items:
            resolved[r] = got[lr]

    out = []
    for p in pos:
        lo_r, hi_r = math.floor(p), math.ceil(p)
        vlo, vhi = resolved[lo_r], resolved[hi_r]
        if p == lo_r or vlo == vhi:
            # the second arm mirrors Percentile.getPercentile's
            # higherKey == lowerKey shortcut: when both bracketing
            # values are equal Spark skips interpolation entirely —
            # the weighted form can differ in the last ulp
            # (hypothesis: 9 copies of -61.0 at p=1.19e-07 →
            # -60.99999999999999 interpolated vs -61.0 returned)
            out.append(vlo)
        else:
            out.append(vlo * (hi_r - p) + vhi * (p - lo_r))
    return _one_row(out)


def grouped_select_at_ranks(
    df,
    group_col: str,
    value_col: str,
    tie_col: str,
    ranks_of_n,
    n_buckets: int = 64,
    max_task_rows: int = 4_000_000,
    max_rounds: int = 8,
) -> dict:
    """Per-group EXACT row selection at data-dependent ranks — the
    grouped sibling of :func:`exact_quantiles`, for rank statistics
    over a LOW-CARDINALITY group key where
    ``Window.partitionBy(key).orderBy(value)`` would sort N/k rows in
    one task (the low-cardinality analogue of a global-order window;
    see plans/audit's ``low-cardinality-window`` check).

    Ordering is ``(value, tie)`` ascending with ranks 1-based;
    ``ranks_of_n(n)`` maps a group's row count to the LIST of target
    ranks (empty list skips the group). Returns ``{group: [(value,
    tie, n, rank), …]}`` in the requested rank order — driver-bounded
    output (groups × ranks cut rows), so the caller can broadcast the
    cut rows back as literals.

    Algorithm (distributed histogram refinement, as exact_quantiles):
    each (group, rank) starts with the group's whole value range; each
    round, states sharing a range signature are processed in ONE
    grouped job — per-group ``percentile_approx`` boundaries within
    the range, then per-group bucket counts via a broadcast join on
    the boundary arrays (driver traffic is groups × n_buckets counts,
    never rows) — and every rank narrows to the one bucket holding it.
    Two ranks of one group always hold IDENTICAL or DISJOINT ranges
    (they start identical and each round splits a shared range into
    disjoint buckets), so per-signature processing double-counts
    nothing. A state resolves when its range holds ≤ ``max_task_rows``
    rows; the final per-range sort task is bounded by construction.
    When a range collapses to a single value (one tie class wider than
    max_task_rows), narrowing switches to the TIE column within that
    value, so pathological skew still resolves in O(log) rounds.

    Intended for group keys of at most a few thousand distinct values
    (state and cut rows are driver-held); for high-cardinality keys a
    plain partitioned window is already scale-safe — use that.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    g_type = df.schema[group_col].dataType.simpleString()
    vals = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        F.col(tie_col).cast("double").alias("t"),
    ).where(F.col("v").isNotNull())

    counts = {
        r["g"]: r["c"]
        for r in vals.groupBy("g").agg(F.count("*").alias("c")).collect()
    }
    # per-(group, rank-index) narrowing state: active column ("v", or
    # "t" once the value range collapsed to fixed_v), half-open range
    # [lo, hi), 0-based residual rank within the range, rows in range
    state: dict = {}
    targets: dict = {}
    for g, n in counts.items():
        ranks = list(ranks_of_n(n))
        if not ranks:
            continue
        for i, r0 in enumerate(ranks):
            if not 1 <= r0 <= n:
                raise ValueError(
                    f"ranks_of_n({n})[{i}] = {r0} out of range for "
                    f"group {g!r}"
                )
            state[(g, i)] = {
                "col": "v", "fixed_v": None,
                "lo": None, "hi": None, "lr": r0 - 1, "c": n,
            }
        targets[g] = (n, ranks)

    def sig_of(st) -> tuple:
        return (st["col"], st["fixed_v"], st["lo"], st["hi"])

    def sig_pred(sig, groups):
        col_name, fixed_v, lo, hi = sig
        p = F.col("g").isin(list(groups))
        col = F.col(col_name)
        if fixed_v is not None:
            p = p & (F.col("v") == F.lit(fixed_v))
        if lo is not None:
            p = p & (col >= F.lit(lo))
        if hi is not None:
            p = p & (col < F.lit(hi))
        return p

    bfr = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    for _ in range(max_rounds):
        active = {
            k: st for k, st in state.items() if st["c"] > max_task_rows
        }
        if not active:
            break
        by_sig: dict[tuple, list] = {}
        for k, st in active.items():
            by_sig.setdefault(sig_of(st), []).append(k)
        for sig, keys in by_sig.items():
            col_name = sig[0]
            gs = sorted({k[0] for k in keys})
            sub = vals.where(sig_pred(sig, gs)).select(
                "g", F.col(col_name).alias("nv")
            )
            sketch = {
                r["g"]: (r["mn"], r["mx"], r["bs"])
                for r in sub.groupBy("g")
                .agg(
                    F.min("nv").alias("mn"),
                    F.max("nv").alias("mx"),
                    F.percentile_approx("nv", bfr, F.lit(100)).alias("bs"),
                )
                .collect()
            }
            live = []
            for g in gs:
                mn, mx, _bs = sketch[g]
                if mn != mx:
                    live.append(g)
                    continue
                for k in keys:
                    if k[0] != g:
                        continue
                    st = state[k]
                    if st["col"] == "v":
                        # single tie class wider than max_task_rows:
                        # pin the value, narrow on the tie col next
                        st.update(col="t", fixed_v=mn, lo=None, hi=None)
                    else:
                        # tie constant too — every row in range IS the
                        # literal pair (fixed_v, mn): resolve NOW, no
                        # sort task of ANY size (r9 review: c=0 alone
                        # left the final window sorting the whole
                        # stalled range in one task)
                        st.update(c=0, answer=(st["fixed_v"], mn))
            if not live:
                continue
            bdf = F.broadcast(
                spark.createDataFrame(
                    [(g, list(sketch[g][2])) for g in live],
                    f"g {g_type}, bs array<double>",
                )
            )
            bucket = F.coalesce(
                F.size(F.filter(F.col("bs"), lambda x: x <= F.col("nv"))),
                F.lit(0),
            )
            rows = (
                vals.where(sig_pred(sig, live))
                .select("g", F.col(col_name).alias("nv"))
                .join(bdf, "g")
                .groupBy("g", bucket.alias("b"))
                .agg(F.count("*").alias("c"))
                .collect()
            )
            per_g: dict = {}
            for r in rows:
                per_g.setdefault(r["g"], {})[r["b"]] = r["c"]
            stuck: list = []
            for k in keys:
                g = k[0]
                if g not in set(live):
                    continue
                st = state[k]
                before = (st["lo"], st["hi"], st["c"])
                bs = list(sketch[g][2])
                edges = [st["lo"]] + bs + [st["hi"]]
                offset = 0
                for b in range(len(bs) + 1):
                    c = per_g.get(g, {}).get(b, 0)
                    if offset <= st["lr"] < offset + c:
                        st.update(
                            lo=edges[b], hi=edges[b + 1],
                            lr=st["lr"] - offset, c=c,
                        )
                        break
                    offset += c
                if (st["lo"], st["hi"], st["c"]) == before:
                    stuck.append(k)
            if stuck:
                # zero-progress round: a single value holds so much
                # mass the sketch put every boundary ON it, so the
                # target's bucket spans the whole current range (e.g.
                # 99.9% of a group at one value, with min < value <
                # max — the mn==mx collapse can't see it). Split the
                # range AT the minimum explicitly: one tiny grouped
                # count of rows equal to mn decides whether the target
                # sits inside that tie class (→ tie-column narrowing,
                # the existing collapse machinery) or above it
                # (→ range shrinks to (mn, hi), expressed as
                # [nextafter(mn), hi) on doubles). Guarantees strictly
                # monotone progress, restoring the O(log) contract.
                import math as _math

                eq_cache: dict = {}  # (g, pre-update sig) -> count
                for k in stuck:
                    g = k[0]
                    st = state[k]
                    mn = sketch[g][0]
                    ck = (g, sig_of(st))
                    n_eq = eq_cache.get(ck)
                    if n_eq is None:
                        n_eq = (
                            vals.where(
                                sig_pred(sig_of(st), [g])
                                & (F.col(st["col"]) == F.lit(mn))
                            ).count()
                        )
                        eq_cache[ck] = n_eq
                    if st["lr"] < n_eq:
                        if st["col"] == "v":
                            st.update(
                                col="t", fixed_v=mn,
                                lo=None, hi=None, c=n_eq,
                            )
                        else:
                            # tie column one value too: the target IS
                            # (fixed_v, mn) — resolve directly
                            st.update(c=0, answer=(st["fixed_v"], mn))
                    else:
                        st.update(
                            lo=_math.nextafter(mn, _math.inf),
                            lr=st["lr"] - n_eq,
                            c=st["c"] - n_eq,
                        )

    if not state:
        return {}
    # final: per distinct range, one job whose per-group sort tasks are
    # bounded by construction (every surviving range holds ≤
    # max_task_rows rows) — a row belongs to exactly one range of its
    # group within a job, so row_number is the range-local rank. Keys
    # the narrowing resolved to a literal pair skip the sort entirely.
    by_sig_final: dict[tuple, list] = {}
    found: dict = {}
    for k, st in state.items():
        if st.get("answer") is not None:
            found[k] = st["answer"]
        else:
            by_sig_final.setdefault(sig_of(st), []).append(k)
    for sig, keys in by_sig_final.items():
        lrs_by_g: dict = {}
        for k in keys:
            lrs_by_g.setdefault(k[0], []).append(state[k]["lr"])
        lr_map = F.create_map(
            *[
                x
                for g, lrs in lrs_by_g.items()
                for x in (F.lit(g), F.array(*[F.lit(v) for v in set(lrs)]))
            ]
        )
        w = Window.partitionBy("g").orderBy("v", "t")
        hits = (
            vals.where(sig_pred(sig, list(lrs_by_g)))
            .withColumn("__rn", F.row_number().over(w) - 1)
            .where(F.array_contains(lr_map[F.col("g")], F.col("__rn")))
            .select("g", "v", "t", "__rn")
            .collect()
        )
        got = {(row["g"], row["__rn"]): (row["v"], row["t"]) for row in hits}
        for k in keys:
            hit = got.get((k[0], state[k]["lr"]))
            if hit is not None:
                found[k] = hit
    out: dict = {}
    missing = []
    for g, (n, ranks) in targets.items():
        rows_out = []
        for i, r0 in enumerate(ranks):
            hit = found.get((g, i))
            if hit is None:
                missing.append((g, i))
                continue
            rows_out.append((hit[0], hit[1], n, r0))
        out[g] = rows_out
    if missing:
        raise RuntimeError(f"rank selection failed for {sorted(missing)}")
    return out


def grouped_select_at_rank(
    df,
    group_col: str,
    value_col: str,
    tie_col: str,
    rank_of_n,
    n_buckets: int = 64,
    max_task_rows: int = 4_000_000,
    max_rounds: int = 8,
) -> dict:
    """Single-rank convenience over :func:`grouped_select_at_ranks`:
    ``rank_of_n(n)`` returns ONE rank (or None to skip the group);
    returns ``{group: (value, tie, n, rank)}``."""

    def ranks(n):
        r = rank_of_n(n)
        return [] if r is None else [r]

    multi = grouped_select_at_ranks(
        df, group_col, value_col, tie_col, ranks,
        n_buckets=n_buckets, max_task_rows=max_task_rows,
        max_rounds=max_rounds,
    )
    return {g: rows[0] for g, rows in multi.items() if rows}
