"""`docsgen`: a Python DataSource (Spark 4 `pyspark.sql.datasource`
API) that generates a deterministic synthetic document corpus of any
size — the load-testing / capacity-planning input for the LLM-data
operators when you want a 10^9-doc corpus without staging 10^9 docs.

Why a DataSource and not ``spark.range(...).select(udf(...))``: the
generator IS the scan. Each `InputPartition` materializes its own id
range executor-side (no shuffle, no driver materialization, linear
scale-out by adding partitions), and the source composes with
everything downstream exactly like a parquet scan — the dedup/quality/
packing pipelines run unchanged on generated input.

Determinism: every column is a closed-form function of ``doc_id``
(splitmix64-style bit mixing — no RNG state, no seed ordering hazard),
so the corpus for a given (num_docs, salt) is bit-identical across
runs, partition counts, and machines. Near-duplicate pairs are planted
at a fixed rate (every 10th doc repeats its predecessor's text with a
one-token edit) so dedup operators have ground truth to find.

Usage::

    spark.dataSource.register(DocsGenDataSource)
    docs = (spark.read.format("docsgen")
            .option("num_docs", 100_000)
            .option("num_partitions", 32)
            .load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_LANGS = ("en", "en", "en", "de", "es", "fr", "zh")
_VOCAB = (
    "data spark shuffle partition token model train corpus quality filter "
    "join window rollup stream batch vector index pack sample"
).split()

_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer: a closed-form 64-bit bit mixer."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _doc_text(doc_id: int, salt: int) -> str:
    h = _mix(doc_id ^ salt)
    n_tokens = 20 + h % 180
    words = [
        _VOCAB[_mix(doc_id * 1_000_003 + i ^ salt) % len(_VOCAB)]
        for i in range(n_tokens)
    ]
    return " ".join(words)


class _Range(InputPartition):
    def __init__(self, start: int, end: int, salt: int):
        self.start, self.end, self.salt = start, end, salt


class DocsGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.num_docs = int(options.get("num_docs", 1000))
        self.num_partitions = max(1, int(options.get("num_partitions", 8)))
        self.salt = int(options.get("salt", 0))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.num_docs // self.num_partitions)
        return [
            _Range(lo, min(lo + step, self.num_docs), self.salt)
            for lo in range(0, self.num_docs, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            if doc_id % 10 == 9 and doc_id > 0:
                # planted near-dup: predecessor's text, one token edited
                base = _doc_text(doc_id - 1, partition.salt)
                text = base.rsplit(" ", 1)[0] + " edited"
            else:
                text = _doc_text(doc_id, partition.salt)
            h = _mix(doc_id * 31 ^ partition.salt)
            yield (
                doc_id,
                text,
                _LANGS[h % len(_LANGS)],
                f"src{h % 20}",
                len(text),
            )


class DocsGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the corpus arrives as
    micro-batches of ``docs_per_batch`` ids. Offsets are plain doc-id
    positions and every batch is the deterministic id range
    [start.pos, end.pos), so replay is exact.

    Built on the SIMPLE stream-reader protocol deliberately: Spark
    hands the committed start offset to every ``read(start)`` call, so
    the reader holds NO position state of its own and checkpoint
    restart is exactly-once by construction. (A stateful
    ``latestOffset``-based reader loses its position on restart; if its
    availability counter restarts below the WAL frontier, Spark plans a
    regressed batch and re-delivers committed spans — caught by the
    restart test.) Tradeoff: simple-reader batches surface through the
    driver; bulk generation belongs to the partition-parallel batch
    reader, the stream is for pipeline/recovery semantics at bounded
    rates."""

    def __init__(self, options: dict):
        self.inner = DocsGenReader(options)
        self.docs_per_batch = max(1, int(options.get("docs_per_batch", 100)))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["pos"]
        hi = min(lo + self.docs_per_batch, self.inner.num_docs)
        return self._rows(lo, hi), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Replay path runs on executors, whose read wrapper REQUIRES an
        # iterator (lists are rejected) — the mirror of read()'s
        # constraint below.
        return iter(self._rows(start["pos"], end["pos"]))

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # Materialized, not a generator: the driver-side prefetch cache
        # copy.copy()s what read() returns, which generators do not
        # support. Bounded by docs_per_batch, so driver-safe.
        return list(self.inner.read(_Range(lo, max(lo, hi), self.inner.salt)))

    def commit(self, end: dict) -> None:
        pass


class DocsGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docsgen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DocsGenReader:
        return DocsGenReader(self.options)

    def simpleStreamReader(self, schema) -> DocsGenStreamReader:
        return DocsGenStreamReader(self.options)
