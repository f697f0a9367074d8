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


#: Open-vocabulary mode: ~1e5 word types, Zipf(s≈1)-weighted. The
#: 24-word fixture vocab makes every 2/3-shingle a birthday collision
#: at scale — LSH band buckets fill with FALSE candidate mass that
#: grows ~quadratically in the corpus even though the real dup rate is
#: constant (r11 SCALE.md adjudicated the cascade's residual
#: alpha_shufW 1.3-1.55 as exactly this). A realistic corpus has
#: heavy-tailed open vocabulary: shingle types grow with the corpus,
#: bucket collisions stay ~dup-driven, and candidate mass stays
#: ~linear. `vocab=realistic` generates that — while PLANTING a
#: constant dup rate (10% exact clones + 10% near-clones at ~90%
#: token overlap) so the dedup rungs still have work to find.
V_OPEN = 100_000


def _open_word(key: str) -> str:
    """Zipf(s≈1)-weighted word id over V_OPEN types: with u uniform in
    [0,1), rank = floor(V^u) inverts the ~ln CDF of 1/r weights —
    rank 1 appears ~ln(V)/V · n times more often than rank V. Pure
    function of the key (md5), like every other generator field."""
    u = h32(key) / 4294967296.0
    return f"w{int(V_OPEN ** u)}"


def _base_words(doc_id: int) -> list[str]:
    """The open-vocab word list a NON-clone doc would carry — clones
    copy a donor's base words, so any row stays a pure function of its
    own id (no recursion through clone chains)."""
    n_words = 5 + h32(f"n:{doc_id}") % 28
    return [_open_word(f"w:{doc_id}:{i}") for i in range(n_words)]


def doc_row(doc_id: int, vocab: str = "fixture") -> tuple[int, str, str, str, int]:
    """(doc_id, text, lang, source, n_chars) — pure function of id.

    ``vocab="fixture"`` (default) replays the original 24-word soup —
    byte-identical to every pre-r12 corpus, and what the
    src_python_datasource oracle replays in SQL. ``vocab="realistic"``
    switches to the open-vocabulary generator above."""
    if vocab == "realistic":
        r = h32(f"c:{doc_id}") % 10
        if r == 0 and doc_id > 0:
            # exact clone: copy a nearby earlier doc's BASE words —
            # all clones of one donor share identical text (an exact
            # dup cluster), at a constant ~10% rate at every scale
            donor = max(0, doc_id - 1 - h32(f"d:{doc_id}") % 50)
            words = _base_words(donor)
        elif r == 1 and doc_id > 0:
            # near-clone: donor's words with ~10% of positions
            # rewritten — constant near-dup (MinHash-rung) mass
            donor = max(0, doc_id - 1 - h32(f"d:{doc_id}") % 50)
            words = [
                _open_word(f"p:{doc_id}:{i}")
                if h32(f"m:{doc_id}:{i}") % 10 == 0
                else w
                for i, w in enumerate(_base_words(donor))
            ]
        else:
            words = _base_words(doc_id)
        text = " ".join(words)
    else:
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
        self.vocab = options.get("vocab", "fixture")
        if self.vocab not in ("fixture", "realistic"):
            raise ValueError(f"unknown vocab mode: {self.vocab!r}")

    def partitions(self):
        per = max(1, -(-self.rows // self.num_partitions))  # ceil div
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield doc_row(doc_id, self.vocab)


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
