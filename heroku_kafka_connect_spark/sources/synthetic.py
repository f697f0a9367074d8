"""Custom PySpark DataSources (Spark 4 Python data source API): a
deterministic synthetic corpus generator, batch and streaming.

The reference ships connectors that *pull* rows from external systems
(JDBC source, reference main.sh:146-196 deploys them); the sandbox has
no external system, so this is the engine's own first-class source:
``spark.read.format("hkc_synthdocs")`` generates a documents-shaped
corpus of any size without files — scale tests, soak tests, and bench
warm-ups stop needing fixture IO.

Every field derives from md5 over a namespaced key, so (a) any row is
recomputable from its doc_id alone — generation is embarrassingly
parallel and partition-count-independent, and (b) DuckDB can replay
the generator exactly (same md5-prefix idiom as llmops.hex32), which
gives the corpus query a full SQL oracle: the driver hash-compares
md5(text) per row across engines.

The streaming variant (``hkc_synthevents``) implements
SimpleDataSourceStreamReader: offsets are plain row indices, each
micro-batch emits ``rows_per_batch`` rows up to ``rows`` total —
restart-safe because rows are a pure function of their index.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

#: 24 words — the generated docs look like the fixture's word soup.
VOCAB = [
    "the", "a", "spark", "query", "row", "data", "join", "filter",
    "window", "stream", "batch", "merge", "sort", "agg", "key",
    "table", "scan", "hash", "group", "order", "line", "part",
    "value", "column",
]
LANGS = ["de", "en", "es", "fr", "zh"]


def h32(s: str) -> int:
    """First 32 bits of md5 as an int — llmops.hex32 in pure Python
    (DuckDB: CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT))."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def doc_row(doc_id: int) -> tuple[int, str, str, str, int]:
    """(doc_id, text, lang, source, n_chars) — pure function of id."""
    n_words = 5 + h32(f"n:{doc_id}") % 28
    text = " ".join(
        VOCAB[h32(f"w:{doc_id}:{i}") % len(VOCAB)] for i in range(n_words)
    )
    lang = LANGS[h32(f"l:{doc_id}") % len(LANGS)]
    source = f"src{h32(f's:{doc_id}') % 10}"
    return (doc_id, text, lang, source, len(text))


def event_row(event_id: int) -> tuple[int, int, str, float]:
    """(event_id, user_id, event_type, value) — pure function of id.
    (No ts column: a deterministic replayable stream derives event
    time downstream; wall-clock stamps would break exactly-once
    replay equality.)"""
    user_id = h32(f"u:{event_id}") % 1000
    etype = ["click", "view", "purchase", "signup", "error"][
        h32(f"t:{event_id}") % 5
    ]
    value = round((h32(f"v:{event_id}") % 100_000) / 100.0, 2)
    return (event_id, user_id, etype, value)


try:  # pragma: no cover - import guard mirrors serde/avro_wire.py
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    HAVE_DATASOURCE_API = True
except ImportError:  # pyspark < 4
    HAVE_DATASOURCE_API = False
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]


DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EVENTS_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        per = max(1, -(-self.rows // self.num_partitions))  # ceil div
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield doc_row(doc_id)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("hkc_synthdocs").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "hkc_synthdocs"

    def schema(self) -> str:
        return DOCS_SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Row-index offsets; each batch advances by ``rows_per_batch``
    until ``rows`` — a bounded, restart-safe stream (rows are pure
    functions of their index, so replaying an offset range after a
    checkpoint recovery yields byte-identical rows)."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        lo = start["idx"]
        hi = min(lo + self.rows_per_batch, self.rows)
        # iterator, not list: the runtime's prefetch cache drives it
        # with next() (datasource_internal.add_result_to_cache)
        return (iter([event_row(i) for i in range(lo, hi)]), {"idx": hi})

    def readBetweenOffsets(self, start, end):
        return iter([event_row(i) for i in range(start["idx"], end["idx"])])


class SyntheticEventsDataSource(DataSource):
    """``spark.readStream.format("hkc_synthevents")`` — bounded
    deterministic event stream for streaming tests without files."""

    @classmethod
    def name(cls) -> str:
        return "hkc_synthevents"

    def schema(self) -> str:
        return EVENTS_SCHEMA

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_sources(spark) -> bool:
    """Idempotently register both sources on the session. Returns
    False (and registers nothing) on pyspark < 4."""
    if not HAVE_DATASOURCE_API:
        return False
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)
    return True
