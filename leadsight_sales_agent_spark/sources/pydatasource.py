"""Custom Python data source (Spark 4 `pyspark.sql.datasource` API).

Demonstrates the engine's pluggable-source seam: a DataSource subclass
declares schema + partition PLANNING on the driver, and each
InputPartition materializes its slice executor-side — the same
contract a real connector (REST cursor pages, message-queue offsets,
proprietary scan ranges) implements. Parallelism is owned by the
planner: N partitions → N concurrent reader tasks, so at 100 TB the
partition count IS the scan parallelism and must derive from the
source's natural split points (here: fixed-size id ranges).

The generator is fully deterministic (salted md5 over the row id, the
repo-wide device), so tests can pin exact content, and re-reads are
stable — a property real ingest connectors need for retry idempotency.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_LANGS = ("en", "de", "fr", "es", "zh")
_WORDS = (
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
)


def _doc_for(doc_id: int) -> tuple[int, str, str]:
    """Deterministic (doc_id, text, lang) — pure function of the id."""
    h = hashlib.md5(f"pyds:{doc_id}".encode()).hexdigest()
    lang = _LANGS[int(h[:2], 16) % len(_LANGS)]
    n_words = 5 + int(h[2:4], 16) % 12
    words = [
        _WORDS[int(h[(4 + 2 * i) % 28 : (6 + 2 * i) % 28 or 28], 16) % len(_WORDS)]
        for i in range(n_words)
    ]
    return doc_id, " ".join(words), lang


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):  # driver-side planning: fixed-size id ranges
        per = max(1, -(-self.n_rows // self.n_partitions))  # ceil division
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _doc_for(i)


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs")` after
    `spark.dataSource.register(SyntheticDocsDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT, text STRING, lang STRING"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return _SyntheticDocsStreamReader(self.options)


class _SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Offset-based streaming replayer over the same deterministic
    generator: each micro-batch advances the offset by `batch_rows`
    until `n_rows` is exhausted, then reports no new data. This is the
    message-queue-consumer contract (offset in, rows + next offset
    out) with replay support (`readBetweenOffsets` re-materializes any
    committed range bit-identically — the recovery path after a
    checkpoint restore)."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 120))
        self.batch_rows = int(options.get("batch_rows", 50))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.batch_rows, self.n_rows)
        return iter([_doc_for(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_doc_for(i) for i in range(int(start["pos"]), int(end["pos"]))])
