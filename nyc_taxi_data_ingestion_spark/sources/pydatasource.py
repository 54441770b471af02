"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a partition-planned, DETERMINISTIC synthetic-corpus generator.

Why an engine needs this: benchmark and soak corpora at arbitrary
scale with ZERO input files — ``spark.read.format("synthetic_corpus")
.option("rows", 10**9).load()`` plans one InputPartition per slice and
every executor generates its slice independently, so a 100 TB load
test needs no 100 TB of storage. Content is a pure function of
(seed, doc_id): the same options yield byte-identical corpora on any
cluster, any partitioning — which is what makes generated-input tests
reproducible.

This is also the repo's exercise of the modern custom-source surface
(the S-row family beyond the reference's HTTP/CSV/S3/JDBC enums —
``src/ingestion/http_client.py`` etc. are all *fetch* sources; a
planned generator source has no reference counterpart).

Scale shape: ``partitions()`` returns row-range slices (pure
metadata); ``read()`` yields plain tuples — fine for test corpora.
A production text generator would yield Arrow ``RecordBatch``es from
the same interface for ~100× throughput; the planning contract is
identical, so this class is the template.

Duplicate-injection: ``dup_rate`` makes every k-th document
(k = floor(1/dup_rate)) an exact copy of its predecessor
(deterministically), so dedup operators have a known planted ground
truth: expected duplicate count is exactly ``floor((rows-1) / k)``.
Rates above 0.5 are rejected — k would collapse to 1 and planted
copies would chain onto content that was itself replaced, destroying
the ground-truth invariant.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = [
    "data", "spark", "corpus", "token", "model", "train", "shard",
    "batch", "quality", "filter", "sample", "index", "vector", "merge",
    "window", "stream", "graph", "label", "metric", "score", "cache",
    "plan", "scan", "join", "group", "order", "limit", "union",
]
_LANGS = ["en", "de", "fr", "es"]
_SOURCES = ["web", "books", "code", "wiki"]


def _doc(seed: int, doc_id: int) -> tuple:
    """The whole row as a pure function of (seed, doc_id)."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_tokens = 5 + h[0] % 60
    words = []
    state = h
    while len(words) < n_tokens:
        for b in state:
            words.append(_VOCAB[b % len(_VOCAB)])
            if len(words) >= n_tokens:
                break
        state = hashlib.md5(state).digest()
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[h[1] % len(_LANGS)],
        _SOURCES[h[2] % len(_SOURCES)],
        len(text),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 42))
        self.dup_rate = float(options.get("dupRate", 0.0))
        if not (0.0 <= self.dup_rate <= 0.5):
            raise ValueError(
                f"dupRate must be in [0, 0.5], got {self.dup_rate}: "
                f"above 0.5 every doc would be a copy of a copy and "
                f"the planted-duplicate count contract breaks"
            )

    def partitions(self):
        n = max(1, self.num_partitions)
        per = -(-self.rows // n)  # ceil
        return [
            _RangePartition(i * per, min((i + 1) * per, self.rows))
            for i in range(n)
            if i * per < self.rows
        ]

    def read(self, partition: _RangePartition):
        dup_every = int(1 / self.dup_rate) if self.dup_rate > 0 else 0
        for doc_id in range(partition.start, partition.end):
            if dup_every and doc_id and doc_id % dup_every == 0:
                # planted exact duplicate of the PREDECESSOR doc —
                # content copied, id kept unique (the dedup target
                # shape). The predecessor is never itself a planted
                # copy (ids divisible by dup_every>1 aren't adjacent),
                # so every plant collides with exactly one pure doc
                # and the expected duplicate count is exactly
                # floor((rows-1)/dup_every).
                src = _doc(self.seed, doc_id - 1)
                yield (doc_id, src[1], src[2], src[3], src[4])
            else:
                yield _doc(self.seed, doc_id)


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("synthetic_corpus")`` after
    ``spark.dataSource.register(SyntheticCorpusDataSource)``.

    Options: ``rows`` (total docs), ``numPartitions`` (parallelism of
    the generation — pure metadata planning), ``seed``, ``dupRate``
    (fraction of docs that are planted exact duplicates)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return (
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )

    def reader(self, schema) -> DataSourceReader:
        return SyntheticCorpusReader(self.options)


def register_synthetic_corpus(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SyntheticCorpusDataSource)
