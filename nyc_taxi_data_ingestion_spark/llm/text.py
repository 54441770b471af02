"""Text analysis operators for LLM data pipelines.

Language-ID (stopword heuristic), quality scoring (length/punct/
stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting — all as pure column expressions (JVM-side,
codegen'd; zero shuffles, zero Python). At 100 TB these run at scan
speed as a narrow map stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately small: the operator's shape (per-language hit counts →
# argmax) is what matters; swap in real lists for production.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
}
# zh detected structurally (CJK codepoints), not by stopwords.
_CJK_RE = "[\\u4e00-\\u9fff]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text; empty text → empty array."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-approximating token count: word pieces + digits + punctuation
    counted separately (a cheap, deterministic stand-in for a real
    tokenizer — useful for corpus-size estimates)."""
    c = F.col(text) if isinstance(text, str) else text
    # count word chunks, numbers, and single punctuation marks
    return F.size(
        F.filter(
            F.split(c, "(?<=[^\\w])|(?=[^\\w])"),
            lambda t: F.trim(t) != "",
        )
    )


def punct_ratio(text: Column | str) -> Column:
    """Share of characters that are ASCII punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    stripped = F.length(F.regexp_replace(c, "[!-/:-@\\[-`{-~]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - stripped) / n.cast("double"))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Count of tokens that are stopwords of `lang` (counts every
    occurrence, not distinct)."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def detect_language(text: Column | str) -> Column:
    """Heuristic language ID: CJK codepoints → zh; else argmax of
    stopword hit counts; no hits → 'unknown'. Pure expression — one
    narrow map, no shuffle, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    langs = list(STOPWORDS)
    hits = [stopword_hits(c, lang) for lang in langs]
    best = F.greatest(*hits)
    # first language (in declaration order) achieving the max
    pick = F.lit("unknown")
    for lang, h in reversed(list(zip(langs, hits))):
        pick = F.when(h == best, F.lit(lang)).otherwise(pick)
    return (
        F.when(c.rlike(_CJK_RE), F.lit("zh"))
        .when(best > 0, pick)
        .otherwise(F.lit("unknown"))
    )


def quality_score(text: Column | str) -> Column:
    """Composite document quality in [0,1]: length score (saturating at
    2000 chars), low punctuation, and stopword presence — the
    length/punct/stopword-ratio recipe used by open-web pipelines."""
    c = F.col(text) if isinstance(text, str) else text
    length_score = F.least(F.length(c) / F.lit(2000.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    any_stop = F.greatest(*[stopword_hits(c, lg) for lg in STOPWORDS])
    tok_n = token_count(c)
    stop_score = F.when(tok_n == 0, F.lit(0.0)).otherwise(
        F.least(any_stop / (tok_n * F.lit(0.05)), F.lit(1.0))
    )
    return (length_score * 0.4 + punct_score * 0.3 + stop_score * 0.3).alias(
        "quality_score"
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint (md5 of NFC-ish normalized
    text: lowercased, whitespace collapsed). Engine-portable — the same
    value is computable in any SQL engine for reconciliation."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")
    return F.md5(normalized)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash
    every k-char gram of the normalized text, slide a window of
    `window` consecutive gram hashes, keep each window's minimum, and
    emit the distinct selected hashes per document. Robust to
    insertions/reordering in a way a whole-document hash is not — two
    documents sharing enough fingerprints share content.

    Returns (id_col, fp). Engine-portable: md5 hex compares
    lexicographically the same everywhere, so the selection is
    reproducible in any SQL engine for reconciliation.

    Scale shape: gram explode is a narrow map; the window-min
    partitions by document (no global sort); output is bounded by
    ~grams/window fingerprints per doc. The normalized text is
    materialized in a projection BEFORE the gram lambda — a common
    subexpression inside ``F.transform`` is re-evaluated per array
    element (measured 3.6x on the regex normalize)."""
    from pyspark.sql import Window

    from nyc_taxi_data_ingestion_spark.llm.dedup import spread

    df = spread(df)
    c = F.col(text_col)
    pre = df.select(
        F.col(id_col),
        F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ").alias("__norm"),
    )
    n_grams = F.greatest(F.length("__norm") - k + 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.substr(F.col("__norm"), i, F.lit(k)),
    )
    ex = pre.select(
        F.col(id_col), F.posexplode(grams).alias("__i", "__g")
    ).select(id_col, "__i", F.md5("__g").alias("__h"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("__i")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return ex.select(
        F.col(id_col), F.min("__h").over(w).alias("fp")
    ).distinct()


def fingerprint_collisions(
    df: DataFrame,
    min_shared: int = 2,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Cross-document winnowing-fingerprint collisions (the MOSS
    plagiarism report): pairs of documents sharing ≥ ``min_shared``
    selected fingerprints, with the shared count — content-overlap
    evidence robust to insertion/reordering, complementing Jaccard
    (whole-set) and containment (subset) with localized-overlap
    detection. Returns (id_a, id_b, shared_fps), id_a < id_b.

    Scale shape (r12 restructure): ONE winnowing pass and ONE
    fp-keyed shuffle. The old shape expressed the inverted index as a
    df-count aggregate + semi-join + fp-keyed SELF-join, which
    (a) re-executed the winnowing subtree four times — Spark does no
    common-subexpression elimination across join legs (measured: the
    winnowing stages were 3 of the top 4 by executor time) — and
    (b) shuffled the (fp, id) table three more times. Now the document
    frequency is a count window over the single fp-partitioned pass,
    the > ``max_df`` drop happens in place (the O(df²) posting-list
    blowup guard: a boilerplate fingerprint shared by 10⁶ docs would
    emit 10¹² pairs; dropping it loses only pairs whose entire overlap
    is boilerplate, the exact trade blocked_jaccard's prefix filter
    makes), and pairs are generated from each fp's SORTED posting list
    with array combinators — bounded at ≤ max_df ids per group by the
    preceding filter, so no aggregation buffer ever holds a hot key's
    full posting list. Skew note: the count window places a hot fp's
    raw rows in one task (the old semi-join's probe side funneled the
    same rows to the same place, so this is not a regression); rows
    are 2 scalars wide, so even a 10⁸-doc boilerplate key is a ~4 GB
    spill-not-crash task."""
    fps = winnow_fingerprints(
        df, id_col=id_col, text_col=text_col, k=k, window=window
    )
    from pyspark.sql import Window

    wdf = Window.partitionBy("fp")
    slim = fps.withColumn("__df", F.count("*").over(wdf)).filter(
        F.col("__df") <= max_df
    )
    # per-fp sorted posting list (reuses the window's fp partitioning
    # — no second exchange), then all ordered pairs (i < j) via array
    # combinators; sort_array gives id_a < id_b for free
    grouped = slim.groupBy("fp").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("__ids")
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "__ids",
                    lambda x, i: F.transform(
                        F.slice(
                            "__ids", i + 2, F.size(F.col("__ids"))
                        ),
                        lambda y: F.struct(
                            x.alias("id_a"), y.alias("id_b")
                        ),
                    ),
                )
            )
        ).alias("__p")
    ).select("__p.id_a", "__p.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
        .select(
            "id_a", "id_b", F.col("shared_fps").cast("int").alias("shared_fps")
        )
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis bundle as columns."""
    return df.withColumns(
        {
            "token_cnt": token_count(text_col),
            "bpe_token_cnt": bpe_ish_token_count(text_col),
            "punct_ratio": punct_ratio(text_col),
            "lang_detected": detect_language(text_col),
            "doc_quality": quality_score(text_col),
            "doc_fingerprint": fingerprint(text_col),
        }
    )


def token_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical-diversity signals for degenerate-text
    screening: type-token ratio, hapax-legomenon fraction, and the
    Gini–Simpson index ``1 − Σ(cᵢ/N)²`` (the probability two random
    tokens differ). Low diversity flags keyword stuffing and template
    spam that length/stopword thresholds (Gopher) miss. Simpson is the
    log-free diversity measure ON PURPOSE: Shannon entropy needs a
    transcendental per distinct token whose last-ulp value differs
    across libm implementations, while every figure here is a ratio of
    exact integer sums — one IEEE division each, bit-identical in any
    engine (the determinism contract oracles rely on).

    Scale shape: one explode, then (doc, token) partial aggregation —
    the shuffle carries per-doc-distinct tokens — then a doc-keyed
    rollup; AQE reuses the first aggregation's hash partitioning for
    the second (same leading key), so the rollup is shuffle-free."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    per = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    n_tok = F.sum("c")
    n_typ = F.count("*")
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    ssq = F.sum(F.col("c") * F.col("c"))
    return per.groupBy(id_col).agg(
        n_tok.cast("int").alias("n_tokens"),
        n_typ.cast("int").alias("n_types"),
        (n_typ / n_tok.cast("double")).alias("type_token_ratio"),
        (hapax / n_typ.cast("double")).alias("hapax_frac"),
        (F.lit(1) - ssq / (n_tok * n_tok).cast("double")).alias(
            "simpson_diversity"
        ),
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
    capacity: int = 4096,
) -> DataFrame:
    """Corpus-wide top-k frequent tokens via Misra-Gries candidate
    generation + exact recount — the heavy-hitters sketch completing
    the engine's mergeable-sketch family (HLL distinct counts, GK
    quantiles, MG frequency).

    Why not plain groupBy(token).count(): that shuffles EVERY distinct
    token. At 100 TB the token dictionary is billions of keys; the
    top-50 answer does not need them. Two passes instead:

    1. per-partition Misra-Gries with ``capacity`` counters
       (Arrow-batched ``mapInPandas`` — sequential counter state is
       the one thing Catalyst can't express). Any token with global
       count > n/capacity survives in ≥1 partition (pigeonhole over
       the per-partition guarantee), so the candidate union is a
       lossless superset of every sufficiently-frequent token. The
       shuffle carries ≤ capacity rows per partition.
    2. exact recount of candidates only: broadcast-semi-join the token
       stream against the candidate set, count, top-k with a total
       order (count desc, token asc).

    The recount makes the result EXACT and deterministic (the sketch
    only prunes), so it oracle-checks against plain SQL top-k —
    provided the k-th true count exceeds n/capacity (asserted in
    tests; size ``capacity`` to the corpus). Returns (token, cnt).
    """
    import pandas as pd

    tok = df.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " "), " ")
        ).alias("token")
    )

    def _mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["token"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = tok.mapInPandas(_mg, "token string").distinct()
    counted = (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return counted.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)


def keyword_extract(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Per-document distinctive keywords: top-k tokens ranked by
    (term frequency DESC, document frequency ASC, token ASC), with
    corpus-stopword suppression (tokens appearing in more than
    ``max_df_ratio`` of documents are excluded).

    This is TF-IDF's ranking with integer-only keys — dropping the
    logarithm keeps the order deterministic and bit-identical across
    engines (no libm in compared output), which matters because rank
    boundaries are exactly where float error flips results.

    Plan shape for 100 TB: one explode → (doc, token) partial-count
    (map-side combine collapses repeats before the shuffle), a
    token-keyed aggregate for document frequency whose output is
    vocabulary-sized (≪ corpus) and BROADCAST back, then a doc-key
    window for the top-k. Text never shuffles — only (doc_id, token,
    cnt) triples.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    ).filter(F.col("token") != "")
    tc = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    # doc_freq from the RAW explode, not from tc: deriving it from tc
    # duplicates tc's (doc, token) shuffle in the plan (the broadcast
    # leg and the probe leg cannot share an exchange); count_distinct
    # re-exploses the corpus (narrow, scan-speed) but shuffles the same
    # (token, doc) volume once, keeping the probe side single-pass. A
    # token-partitioned window would also work but puts every stopword
    # in one partition — exactly the skew max_df suppression exists for.
    dfreq = tok.groupBy("token").agg(
        F.count_distinct(F.col(id_col)).alias("doc_freq")
    )
    n_docs = df.select(F.count("*").alias("__n"))
    keep = dfreq.join(F.broadcast(n_docs)).filter(
        F.col("doc_freq") <= F.col("__n") * max_df_ratio
    ).select("token", "doc_freq")
    w = (
        Window.partitionBy(id_col)
        .orderBy(F.col("tf").desc(), F.col("doc_freq").asc(), F.col("token").asc())
    )
    return (
        tc.join(F.broadcast(keep), "token")
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= top_k)
        .select(id_col, "rnk", "token", "tf", "doc_freq")
    )


# -- BPE tokenizer training (Sennrich et al. 2016) ---------------------------


def word_frequencies(
    df: DataFrame, text_col: str = "text", max_vocab: int = 50_000
) -> DataFrame:
    """Corpus word-frequency table (word, cnt), truncated to the
    ``max_vocab`` most frequent words (ties broken by word). This is
    the sufficient statistic for BPE training: the corpus can be 100 TB
    but its word-type dictionary is bounded (~millions), and the merge
    algorithm only ever sees (word, count) — one shuffle keyed by word,
    partial-aggregated map-side."""
    wc = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    return wc.orderBy(F.desc("cnt"), F.asc("w")).limit(max_vocab)


def bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_vocab: int = 50_000,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Train byte-pair-encoding merges (Sennrich et al. 2016, "Neural
    Machine Translation of Rare Words with Subword Units", the
    algorithm in its Fig. 1) on the corpus word-frequency table.

    Scale shape: the distributed part is ONE word-count aggregate
    (``word_frequencies``); training then runs driver-side over the
    bounded (word, count) dict with incremental pair-count updates —
    the standard contract (HuggingFace/SentencePiece train from a
    word-frequency file, not from raw text). Deterministic: ties on
    pair frequency break lexicographically, so the merge list is
    byte-identical across partitionings and runs.

    Returns the ordered merge list [(left, right), ...].
    """
    rows = word_frequencies(df, text_col, max_vocab).collect()
    # symbol sequences per word; </w> marks word end (Sennrich's scheme)
    words: list[tuple[list[str], int]] = [
        (list(r.w) + [end_of_word], int(r.cnt)) for r in rows if r.w
    ]
    from collections import defaultdict

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, cnt) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += cnt
            where[(a, b)].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # max count, ties to the lexicographically smallest pair — a
        # total order, so the merge list is run- and partition-stable
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(where[best]):
            syms, cnt = words[wi]
            # remove old pair contributions for this word
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= cnt
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                where[(a, b)].discard(wi)
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, cnt)
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += cnt
                where[(a, b)].add(wi)
    return merges


def bpe_encode_udf(merges: list[tuple[str, str]], end_of_word: str = "</w>"):
    """mapInPandas-ready encoder: text -> subword token count under the
    trained merges. The merge table broadcasts in-closure (it is
    num_merges entries — KBs); encoding is pure Python over Arrow
    batches, linear in text length with a rank dict (no per-merge
    scan)."""
    rank = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [end_of_word]
        while len(syms) >= 2:
            pairs = list(zip(syms, syms[1:]))
            cand = min(
                ((rank.get(p, 1 << 30), j) for j, p in enumerate(pairs)),
                key=lambda t: t,
            )
            if cand[0] == 1 << 30:
                break
            j = cand[1]
            syms = syms[:j] + [syms[j] + syms[j + 1]] + syms[j + 2 :]
        return syms

    @F.pandas_udf("int")
    def n_bpe_tokens(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t or not t.strip():
                out.append(0)
                continue
            n = 0
            for w in t.strip().split():
                n += len(encode_word(w))
            out.append(n)
        return pd.Series(out, dtype="int32")

    return n_bpe_tokens


def bm25_rank(
    df: DataFrame,
    terms: list[str],
    top_k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranking of documents against a fixed query-term list
    (Robertson & Spärck Jones; the lexical-retrieval baseline every
    RAG/training-retrieval stack keeps next to its ANN index). Returns
    (term, rank, doc_id, score): the ``top_k`` docs per term by
    score DESC, doc_id ASC.

    Per-term scoring (no cross-term sum, so no float-addition-order
    dependence): score = idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with idf(t) = (N − df + 0.5)/(df + 0.5) — the odds form WITHOUT the
    log wrap, which preserves BM25's per-term ranking exactly (log is
    monotone) while keeping every op a single IEEE divide/multiply —
    bit-identical across engines (the repo's exact-float oracle
    contract; no libm).

    Scale shape: tokens explode ONCE and are filtered to the query
    vocabulary BEFORE the (doc, term) partial-agg shuffle, so shuffle
    volume is bounded by matches, not corpus tokens; df/N/avgdl are a
    term-count-row + single-row broadcast; final top-k per term is the
    salted two-phase ``topk_per_group`` (a hot term is a hot group).
    The (doc_id, dl) length table is checkpointed once (16 B/row, the
    at-rest-index state class) — it feeds both the per-doc join and
    the corpus N/avgdl aggregate, and deriving each from raw text
    would re-tokenize the corpus per consumer (3 text scans → 2:
    the tf explode + the length pass)."""
    from pyspark.sql import Window

    from nyc_taxi_data_ingestion_spark.operators.transform import (
        topk_per_group,
    )

    term_lits = F.array(*[F.lit(t) for t in terms])
    # corpus = docs with tokenizable text: NULL text would make
    # size(tokens) = -1 (poisoning sum_dl/avgdl) and empty text is not
    # a retrievable document — both are excluded from N/avgdl, matching
    # the oracle's WHERE
    base = df.where(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    ).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    )
    dl = base.select("doc_id", F.size("__toks").alias("dl")).localCheckpoint(
        eager=True
    )
    tf = (
        base.select("doc_id", F.explode("__toks").alias("term"))
        .filter(F.array_contains(term_lits, F.col("term")))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "score",
            (
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (
                (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
                )
            ),
        )
    )
    ranked = topk_per_group(
        scored,
        ["term"],
        [F.col("score").desc(), F.col("doc_id").asc()],
        top_k,
        salt_col="doc_id",
    )
    w = Window.partitionBy("term").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "term", "rank", "doc_id", "score"
    )


def chunk_documents(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the slicing step every
    RAG indexing / context-window training pipeline runs before
    embedding or packing: each document becomes ``1 + ceil(max(0,
    n_tokens - window) / stride)`` chunks of up to ``window``
    whitespace tokens, consecutive chunks overlapping by ``window -
    stride`` tokens so no boundary-spanning passage is lost. Returns
    (id_col, chunk_idx, chunk_text, chunk_tokens); a document at or
    under ``window`` tokens yields exactly one chunk (itself); EMPTY
    text yields one empty chunk (callers filter upstream if unwanted);
    NULL text yields no chunks at all (explicit filter — Spark's
    NULL-ignoring ``greatest`` would otherwise manufacture one NULL
    chunk; the UDTF twin mirrors the no-chunks contract).

    Scale shape: pure JVM expressions end to end — split, one
    ``sequence``+``explode`` (fan-out bounded by n/stride per row,
    data-side), ``slice``/``array_join`` per chunk. No Python in the
    row path, no shuffle at all: chunking is embarrassingly parallel
    and stays in the scan stage (whole-stage codegen). The UDTF twin
    (:func:`chunk_documents_udtf_parity` in tests) exists to exercise
    the Spark 4 python-UDTF surface and measures as the SLOW path —
    the relational form is the production one."""
    if window < 1 or stride < 1 or stride > window:
        raise ValueError(
            f"need 1 <= stride <= window, got window={window} "
            f"stride={stride} (stride > window would DROP the tokens "
            f"between consecutive windows)"
        )
    toks = tokens(F.col(text_col))
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            toks.alias("__toks"),
            F.size(toks).alias("__n"),
        )
        .select(
            id_col,
            "__toks",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.expr(
                        f"(greatest(__n - {window}, 0) + {stride - 1}) "
                        f"div {stride}"
                    ).cast("int"),
                )
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice(
                    F.col("__toks"),
                    F.col("chunk_idx") * stride + 1,
                    window,
                ),
                " ",
            ).alias("chunk_text"),
            F.size(
                F.slice(
                    F.col("__toks"),
                    F.col("chunk_idx") * stride + 1,
                    window,
                )
            ).alias("chunk_tokens"),
        )
    )


def chunking_udtf():
    """The same chunking as a Spark 4 python UDTF
    (``@udtf`` lateral-join surface) — registered for the API-parity
    test only: per-row Python with pickled row transport is the slow
    path next to :func:`chunk_documents`' pure-JVM plan, and the
    pytest that asserts identical output also documents that contract.
    Returns the UDTF class (caller registers/invokes)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "doc_id bigint, chunk_idx int, chunk_text string, "
        "chunk_tokens int"
    ))
    class ChunkDocs:
        def eval(self, doc_id: int, text: str, window: int, stride: int):
            if text is None:
                # NULL text yields NO chunks (the relational form
                # filters NULLs; an EMPTY string still yields one
                # empty chunk in both forms)
                return
            toks = text.strip().split() if text.strip() else []
            n = len(toks)
            cnt = 1 + max(0, (max(n - window, 0) + stride - 1) // stride)
            for i in range(cnt):
                sl = toks[i * stride : i * stride + window]
                yield doc_id, i, " ".join(sl), len(sl)

    return ChunkDocs
