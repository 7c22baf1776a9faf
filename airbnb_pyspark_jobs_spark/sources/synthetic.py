"""Synthetic corpus connector on Spark 4's Python Data Source API —
the engine's custom-connector extension point, exercised end to end.

``spark.read.format("synthetic_docs").option("n", 10**9)`` generates a
deterministic document corpus IN the executors: generation is a pure
function of (doc_id), partitioned into independent id ranges, so a
terabyte-scale test corpus needs no storage, no driver memory, and no
shuffle — each task streams its own range. This is also the reference
pattern for wrapping any external system (REST pages, message queues,
proprietary stores) as a first-class `spark.read` source when no JVM
connector exists: implement `schema()` / `partitions()` / `read()`,
register once, read anywhere.

Determinism contract: every (n, dup_every) pair yields byte-identical
corpora across runs, partition counts and engines — md5-seeded word
choice, no RNG state shared across rows. Every ``dup_every``-th doc
copies its predecessor's text, so dedup operators have planted exact
duplicates at a known rate.
"""

from __future__ import annotations

import bisect
import hashlib
import math
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark the a "
    "line sort window order data column join small customer query big group "
    "stream filter vector"
).split()


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _doc_text(
    doc_id: int, vocab: Sequence[str], cum: Sequence[int] | None = None
) -> str:
    h = hashlib.md5(f"doc{doc_id}".encode()).digest()
    n_words = 20 + h[0] % 30
    words = []
    seed = int.from_bytes(h[:8], "big")
    for i in range(n_words):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        if cum is None:
            words.append(vocab[seed % len(vocab)])
        else:
            # Zipfian pick: inverse-CDF lookup on the precomputed
            # 2^64-scaled cumulative weights (rank 0 = heaviest word)
            words.append(vocab[bisect.bisect_right(cum, seed)])
    return " ".join(words)


def _zipf_cum(n_words: int, s: float) -> list[int]:
    """2^64-scaled cumulative Zipf(s) weights over word ranks — the
    skewed word-frequency law real text follows (and uniform synthetic
    vocab does not); pure function of (n_words, s)."""
    w = [1.0 / (r + 1) ** s for r in range(n_words)]
    tot = sum(w)
    cum, acc = [], 0.0
    for x in w[:-1]:
        acc += x
        cum.append(int(acc / tot * (1 << 64)))
    return cum


def _synthetic_vocab(size: int) -> list[str]:
    """``size`` distinct md5-derived lowercase words (3-10 letters) —
    a rich word-type distribution for vocabulary-scale tests (the
    default 31-word ``_VOCAB`` exhausts BPE at ~106 merges; a real
    tokenizer run needs thousands of types). Deterministic: word i is
    a pure function of ``md5('w{i}')``."""
    out: list[str] = []
    seen: set[str] = set()
    i = 0
    while len(out) < size:
        h = hashlib.md5(f"w{i}".encode()).digest()
        ln = 3 + h[0] % 8
        w = "".join(chr(ord("a") + b % 26) for b in h[1 : 1 + ln])
        i += 1
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.dup_every = int(options.get("dup_every", 10))
        # vocab_size=0 -> the classic 31-word _VOCAB (existing corpora
        # stay byte-identical); >0 -> md5-derived synthetic vocabulary
        self.vocab_size = int(options.get("vocab_size", 0))
        self.vocab = _synthetic_vocab(self.vocab_size) if self.vocab_size else None
        # zipf_s > 0 -> Zipfian word frequencies (rank-r weight 1/r^s);
        # 0 keeps the classic uniform draw (existing corpora unchanged)
        self.zipf_s = float(options.get("zipf_s", 0.0))
        self.cum = (
            _zipf_cum(len(self.vocab or _VOCAB), self.zipf_s)
            if self.zipf_s > 0
            else None
        )

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, math.ceil(self.n / self.num_partitions))
        return [
            _IdRange(start, min(start + step, self.n))
            for start in range(0, self.n, step)
        ]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            # planted exact duplicate of the predecessor at a known rate
            yield _doc_row(doc_id, self.dup_every, self.vocab, self.cum)


def _doc_row(
    doc_id: int,
    dup_every: int,
    vocab: Sequence[str] | None = None,
    cum: Sequence[int] | None = None,
) -> tuple:
    """One deterministic corpus row — shared by the batch and stream
    readers so a streamed corpus is byte-identical to the batch one."""
    src_id = (
        doc_id - 1 if (dup_every and doc_id % dup_every == 0 and doc_id > 0) else doc_id
    )
    text = _doc_text(src_id, vocab if vocab is not None else _VOCAB, cum)
    return (doc_id, text, "en", f"src{doc_id % 20}", len(text))


class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Streaming variant (executor-side read path, unlike the
    driver-side SimpleDataSourceStreamReader): offsets are
    ``{"next_id": N}``, each trigger advances by ``rows_per_batch``
    ids, and ``partitions(start, end)`` splits the id range so tasks
    generate their slices in parallel.

    Exactly-once comes free from determinism: a replayed offset range
    regenerates byte-identical rows (generation is a pure function of
    doc_id), which is the actual contract behind ``readBetweenOffsets``
    -style recovery — no source-side buffering needed. ``max_rows``
    bounds the stream (further triggers see an unchanged latest offset
    → empty batches), mimicking a drained queue."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.num_partitions = int(options.get("partitions", 4))
        self.dup_every = int(options.get("dup_every", 10))
        self.max_rows = int(options.get("max_rows", 0))  # 0 = unbounded
        self._current = 0

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def latestOffset(self) -> dict:
        nxt = self._current + self.rows_per_batch
        if self.max_rows:
            nxt = min(nxt, self.max_rows)
        self._current = nxt
        return {"next_id": self._current}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["next_id"], end["next_id"]
        step = max(1, math.ceil((hi - lo) / self.num_partitions))
        return [_IdRange(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(doc_id, self.dup_every)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: ranges regenerate on demand


class SyntheticDocsDataSource(DataSource):
    """format name: ``synthetic_docs``; options: ``n`` (row count),
    ``partitions`` (parallelism), ``dup_every`` (0 disables planted
    duplicates). Streaming adds ``rows_per_batch`` (per-trigger ids)
    and ``max_rows`` (bound the stream; 0 = unbounded)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def streamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: after this, any session code can
    ``spark.read.format("synthetic_docs")``."""
    spark.dataSource.register(SyntheticDocsDataSource)
