"""Corpus-curation operators (llm/curation.py): PII, Gopher filter,
stratified sampling, shard packing, contamination, line dedup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_taxi_data_ingestion_spark.llm import curation as cu


@pytest.mark.slow
def test_pii_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob@example.com or alice@test.org thanks"),
            (2, "server 192.168.1.100 went down, call +1 555-010-9999"),
            (3, "clean text with no pii at all"),
        ],
        "id long, text string",
    )
    out = cu.with_pii_scan(df).orderBy("id").collect()
    assert out[0]["email_cnt"] == 2
    assert out[0]["redacted"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[1]["ipv4_cnt"] == 1
    assert out[1]["phone_cnt"] == 1
    assert out[1]["redacted"] == "server <IP> went down, call <PHONE>"
    assert out[2]["email_cnt"] == out[2]["ipv4_cnt"] == out[2]["phone_cnt"] == 0
    assert out[2]["redacted"] == out[2]["text"]


def test_gopher_filter_thresholds(spark):
    long_ok = " ".join(["word"] * 60)
    bullets = "\n".join(["- item"] * 10)
    df = spark.createDataFrame(
        [(1, long_ok), (2, "too short"), (3, bullets)],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in cu.with_gopher_filter(df, min_words=50).collect()
    }
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False  # word_cnt below minimum
    assert rows[3]["bullet_ratio"] == 1.0
    assert rows[3]["keep"] is False


def test_stratified_sample_deterministic_and_rated(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = cu.stratified_sample(docs, {"en": 0.5}, 0.3)
    s2 = cu.stratified_sample(docs, {"en": 0.5}, 0.3)
    ids1 = sorted(r[0] for r in s1.select("doc_id").collect())
    ids2 = sorted(r[0] for r in s2.select("doc_id").collect())
    assert ids1 == ids2  # byte-identical resample, no RNG state
    n_en_total = docs.filter(F.col("lang") == "en").count()
    n_en_kept = s1.filter(F.col("lang") == "en").count()
    assert 0.35 < n_en_kept / n_en_total < 0.65


def test_token_shards_budget_and_monotonic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 256
    out = cu.token_shards(docs, budget_tokens=budget).toPandas()
    for _, grp in out.groupby("source"):
        grp = grp.sort_values("doc_id")
        assert grp["shard_id"].is_monotonic_increasing
        sums = grp.groupby("shard_id")["token_cnt"].sum()
        # prefix-sum binning: a shard overshoots by at most one doc
        assert (sums <= budget + grp["token_cnt"].max()).all()


def test_partitioned_prefix_sum_matches_naive_window(spark, sf_dir):
    # the distributed two-pass cumsum must equal the single-window
    # form exactly, including with n_buckets small enough that every
    # bucket boundary path is exercised
    from pyspark.sql import Window

    from nyc_taxi_data_ingestion_spark.operators.transform import (
        partitioned_prefix_sum,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "doc_id", "n_chars")
    )
    got = (
        partitioned_prefix_sum(
            docs, ["source"], "doc_id", "n_chars", "run", n_buckets=4
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = (
        docs.withColumn(
            "run", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["run"].to_numpy() == want["run"].to_numpy()).all()


def test_repetition_stats_flags_degenerate_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "all these words are fully distinct here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cu.repetition_stats(df).collect()}
    assert rows[1]["top_unigram_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == 0.8  # 5 bigrams, 1 distinct
    assert rows[2]["top_unigram_frac"] == 1.0 / 7
    assert rows[2]["dup_bigram_frac"] == 0.0


def test_contamination_exact_copy_scores_one(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated sentence about spark aggregation"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in cu.contamination_check(corpus, bench, k=12).collect()
    }
    assert rows[1]["contamination"] == 1.0
    assert rows[2]["contamination"] == 0.0


def test_line_dedup_removes_boilerplate_preserves_order(spark):
    boiler = "subscribe to our newsletter"
    docs = [(i, f"{boiler}\nunique line {i}\nmore {i}") for i in range(1, 6)]
    docs.append((6, boiler))  # all-boilerplate doc drops out entirely
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cu.line_dedup(df, min_docs=5).collect()}
    assert 6 not in out
    assert out[3]["clean_text"] == "unique line 3\nmore 3"
    assert out[3]["n_removed"] == 1


def test_ngram_novelty_flags_gibberish(spark):
    from nyc_taxi_data_ingestion_spark.llm.curation import ngram_novelty

    normal = "the quick brown fox jumps over the lazy dog and runs on "
    rows = [(i, normal * 4) for i in range(20)]
    rows.append((99, "zq9x!7@jw#kv$8%mp^3&qz*4(xj)7"))  # gibberish
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.rare_frac for r in ngram_novelty(df, rare_ppm=10000).collect()}
    assert out[99] > 0.8            # gibberish bigrams are corpus-rare
    assert all(v == 0.0 for k, v in out.items() if k != 99)


def test_quality_classifier_deterministic_and_integer_exact(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # same text
        (3, "completely different material about distributed joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in cu.quality_classifier(df).collect()}
    # identical text → identical score, bit-for-bit
    assert out[1].score == out[2].score
    assert out[1].n_tokens == 9
    assert all(-1.0 <= r.score <= 1.0 for r in out.values())
    assert all(r.keep == (r.score > 0) for r in out.values())
    # rerun → identical (no RNG, no order dependence)
    again = {r.doc_id: r.score for r in cu.quality_classifier(df).collect()}
    assert {k: v.score for k, v in out.items()} == again


def test_domain_mixture_upweights_small_domains(spark):
    rows = (
        [(i, "big domain doc with several tokens here", "web") for i in range(90)]
        + [(100 + i, "small domain doc tokens", "books") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.domain: r for r in cu.domain_mixture(df).collect()}
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-12
    assert abs(sum(r.token_share for r in out.values()) - 1.0) < 1e-12
    # α=1/2 moves weight from the big domain toward the small one,
    # but keeps the ordering
    assert out["books"].weight > out["books"].token_share
    assert out["web"].weight < out["web"].token_share
    assert out["web"].weight > out["books"].weight


def test_group_holdout_split_no_leakage(spark, sf_dir):
    """Every row of a group lands in exactly one split — the invariant
    that keeps near-duplicates (which concentrate within groups) from
    straddling the train/eval boundary."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.llm.curation import (
        group_holdout_split,
    )
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = group_holdout_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, group_col="source"
    )
    per_source = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_source and all(r.n_splits == 1 for r in per_source)
    # assignment is total and covers more than one split overall
    assert out.filter(F.col("split").isNull()).count() == 0
    assert out.select("split").distinct().count() >= 2


def test_dataset_split_total_deterministic_and_proportional(spark, sf_dir):
    import duckdb

    from nyc_taxi_data_ingestion_spark.llm.curation import (
        dataset_split,
        split_thresholds_sql,
    )
    from nyc_taxi_data_ingestion_spark.sources.readers import read_table

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = read_table(spark, sf_dir, "documents")
    out = dataset_split(docs, w).select("doc_id", "split")
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    n = len(rows)
    assert n == docs.count()  # total assignment
    # deterministic across runs
    rows2 = {r["doc_id"]: r["split"] for r in dataset_split(docs, w)
             .select("doc_id", "split").collect()}
    assert rows == rows2
    # proportions within loose binomial bounds
    frac_train = sum(1 for s in rows.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9
    assert set(rows.values()) == {"train", "val", "test"}
    # cross-engine: the SQL CASE twin agrees id-for-id
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    case = split_thresholds_sql(w, "doc_id")
    oracle = dict(
        con.execute(f"SELECT doc_id, {case} FROM documents").fetchall()
    )
    assert rows == oracle


def test_score_buckets_fractions_and_determinism(spark):
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.llm.curation import score_buckets

    # 100 docs with distinct scores 0.00..0.99 → exact 10/40/50 split
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") / 100.0).alias("score")
    )
    out = score_buckets(df, head_frac=0.1, middle_frac=0.4)
    counts = {
        r["bucket"]: r["cnt"]
        for r in out.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts == {"head": 10, "middle": 40, "tail": 50}
    # head is exactly the top scores
    head_ids = {
        r["doc_id"] for r in out.filter(F.col("bucket") == "head").collect()
    }
    assert head_ids == set(range(90, 100))


def test_score_buckets_ties_share_a_tier(spark):
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.llm.curation import score_buckets

    # every doc has the same score → one bin; the head threshold lands
    # on it, so ALL docs are head (deterministic overshoot, never a
    # partitioning-dependent split)
    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit(0.5).alias("score")
    )
    out = score_buckets(df, head_frac=0.1, middle_frac=0.4)
    assert all(r["bucket"] == "head" for r in out.collect())


def test_remove_duplicated_spans_planted(spark):
    from nyc_taxi_data_ingestion_spark.llm.curation import remove_duplicated_spans

    shared = "a b c d e f g h"
    rows = [
        (1, shared + " u1 u2 u3 u4 u5 u6 u7 u8"),
        (2, shared + " v1 v2 v3 v4 v5 v6 v7 v8"),
        (3, "clean doc with no duplicated windows at all here ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicated_spans(df, k=8).collect()}
    # the shared window's 8 tokens are cut from both docs; tails survive
    assert out[1].removed_tokens == 8 and out[2].removed_tokens == 8
    assert out[1].cleaned == "u1 u2 u3 u4 u5 u6 u7 u8"
    assert out[2].cleaned == "v1 v2 v3 v4 v5 v6 v7 v8"
    assert out[3].removed_tokens == 0
    assert out[3].cleaned == rows[2][1]


def test_dsir_weights_match_numpy_reference(spark):
    import math

    from nyc_taxi_data_ingestion_spark.llm.curation import dsir_weights

    corpus = [
        (0, "spark query engine shuffle join"),
        (1, "medical patient clinical trial dose"),
        (2, "spark shuffle partition skew join"),
        (3, "one"),  # no bigrams -> weight 0
    ]
    target = [(10, "medical clinical dose patient care")]
    B = 97
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    out = {r.doc_id: r for r in dsir_weights(cdf, tdf, num_buckets=B).collect()}

    # independent reference with xxhash via Spark (hash fn must agree)
    from pyspark.sql import functions as F
    def buckets(text):
        toks = text.strip().lower().split()
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            return []
        row = spark.range(1).select(
            *[F.pmod(F.xxhash64(F.lit(g)), F.lit(B)).alias(f"b{i}") for i, g in enumerate(grams)]
        ).collect()[0]
        return [row[f"b{i}"] for i in range(len(grams))]

    cc, tc = {}, {}
    for _, t in corpus:
        for b in buckets(t):
            cc[b] = cc.get(b, 0) + 1
    for _, t in target:
        for b in buckets(t):
            tc[b] = tc.get(b, 0) + 1
    ct, tt = sum(cc.values()), sum(tc.values())
    def lw(text):
        return sum(
            math.log((tc.get(b, 0) + 1) / (tt + B))
            - math.log((cc.get(b, 0) + 1) / (ct + B))
            for b in buckets(text)
        )
    for did, text in corpus:
        assert abs(out[did].log_weight - lw(text)) < 1e-9, did
    assert out[3].n_feats == 0 and out[3].log_weight == 0.0
    # the medical doc must outrank the spark docs for the medical target
    assert out[1].log_weight > out[0].log_weight
    assert out[1].log_weight > out[2].log_weight


def test_partitioned_prefix_sum_doubles_nulls_and_null_groups(spark):
    import pytest as _pytest

    from nyc_taxi_data_ingestion_spark.operators.transform import (
        partitioned_prefix_sum,
    )

    rows = [
        ("a", 1, 0.5), ("a", 2, 0.7), ("a", 3, None),
        (None, 1, 1.5), (None, 2, 2.5),   # NULL group must survive
    ]
    df = spark.createDataFrame(rows, "g string, o long, v double")
    got = {
        (r["g"], r["o"]): r["run"]
        for r in partitioned_prefix_sum(
            df, ["g"], "o", "v", "run", n_buckets=2
        ).collect()
    }
    # fractional sums must not truncate; NULL values count as 0
    assert got[("a", 1)] == 0.0
    assert got[("a", 2)] == 0.5
    assert got[("a", 3)] == 0.5 + 0.7
    assert got[(None, 1)] == 0.0 and got[(None, 2)] == 1.5
    # non-numeric order columns raise with guidance, not a cast crash
    sdf = spark.createDataFrame(
        [("a", "d1", 1)], "g string, o string, v long"
    )
    with _pytest.raises(ValueError, match="numeric"):
        partitioned_prefix_sum(sdf, ["g"], "o", "v", "run")


def test_partitioned_prefix_sum_timestamp_order_and_unique_assert(spark):
    import datetime as dt

    import pytest

    from nyc_taxi_data_ingestion_spark.operators.transform import (
        partitioned_prefix_sum,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + dt.timedelta(hours=h), h + 1) for h in range(6)
    ]
    sdf = spark.createDataFrame(rows, "g string, ts timestamp, v long")
    got = {
        r.ts: r.run
        for r in partitioned_prefix_sum(
            sdf, ["g"], "ts", "v", "run", n_buckets=3,
            assert_unique_order=True,
        ).collect()
    }
    # exclusive prefix over a temporal order column
    assert got[t0] == 0
    assert got[t0 + dt.timedelta(hours=5)] == 1 + 2 + 3 + 4 + 5
    # duplicate order key within a group -> explicit error, not an
    # ambiguous within-bucket prefix
    dup = spark.createDataFrame(
        [("a", t0, 1), ("a", t0, 2)], "g string, ts timestamp, v long"
    )
    with pytest.raises(ValueError, match="duplicate order key"):
        partitioned_prefix_sum(
            dup, ["g"], "ts", "v", "run", assert_unique_order=True
        )


def test_sequence_pack_slices_exactly(spark):
    """Hand-computed packing: docs of 5/3/9 tokens at seq_len=4 →
    stream [0,17) cuts at 4/8/12/16; doc 2 (tokens 5..7) stays inside
    seq 1; docs 1 and 3 straddle cuts."""
    from nyc_taxi_data_ingestion_spark.llm.curation import sequence_pack

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h"), (3, "i j k l m n o p q")],
        "doc_id long, text string",
    )
    out = sequence_pack(docs, seq_len=4)
    rows = sorted(
        (r.doc_id, r.seq_id, r.doc_lo, r.doc_hi, r.seq_off, r.n_tok)
        for r in out.collect()
    )
    assert rows == [
        (1, 0, 0, 4, 0, 4),
        (1, 1, 4, 5, 0, 1),
        (2, 1, 0, 3, 1, 3),
        (3, 2, 0, 4, 0, 4),
        (3, 3, 4, 8, 0, 4),
        (3, 4, 8, 9, 0, 1),
    ]


def test_sequence_pack_invariants(spark, sf_dir):
    """Every sequence except the last holds exactly seq_len tokens;
    each doc's slices partition [0, n) contiguously; zero-token docs
    vanish."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_ingestion_spark.llm.curation import sequence_pack
    from nyc_taxi_data_ingestion_spark.llm.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    L = 128
    out = sequence_pack(docs, seq_len=L).localCheckpoint(eager=True)
    per_seq = out.groupBy("seq_id").agg(F.sum("n_tok").alias("t")).collect()
    last = max(r.seq_id for r in per_seq)
    for r in per_seq:
        assert r.t == L or (r.seq_id == last and 0 < r.t <= L), r
    # per-doc slices reassemble the doc exactly
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.sum("n_tok").alias("t"),
            F.min("doc_lo").alias("lo"),
            F.max("doc_hi").alias("hi"),
        )
        .join(docs.withColumn("n", token_count("text")), "doc_id")
        .collect()
    )
    for r in per_doc:
        assert (r.lo, r.hi, r.t) == (0, r.n, r.n), r
    # in-sequence offsets tile without overlap
    tiled = (
        out.groupBy("seq_id")
        .agg(
            F.sum("n_tok").alias("t"),
            F.min("seq_off").alias("o"),
            F.max(F.col("seq_off") + F.col("n_tok")).alias("e"),
        )
        .collect()
    )
    for r in tiled:
        assert r.o == 0 and r.e == r.t, r
