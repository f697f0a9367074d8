"""Query registry backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are SQL-expressible, an equivalent DuckDB oracle SQL string.
The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: A DuckDB oracle is either a static SQL string or, when the SQL must
#: replay scale-adaptive engine parameters (e.g. the semantic family's
#: LSH plane/table counts derived from the embeddings row count), a
#: callable ``sf_dir -> SQL`` resolved against the fixture it will run
#: on. The driver contract (`oracle_sql()`) stays ``dict[str, str]`` by
#: resolving callables at the driver's own gate fixture.
OracleSpec = "str | Callable[[str], str] | None"

#: The fixture the driver runs `oracle_sql()` output against (sf0.01).
DRIVER_ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


def resolve_oracle(oracle, sf_dir: str) -> str | None:
    """Materialize an oracle spec for a concrete fixture dir."""
    if oracle is None:
        return None
    return oracle(sf_dir) if callable(oracle) else oracle


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: object | None  # OracleSpec; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle=None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap


def alias(new_name: str, existing: str) -> None:
    """Register an existing query under a second name (e.g. SURVEY
    llm_dedup_latest = sink_upsert_latest)."""
    q = _REGISTRY[existing]
    _REGISTRY[new_name] = Query(name=new_name, fn=q.fn, oracle=q.oracle, doc=q.doc)


def all_queries() -> dict[str, Query]:
    _load_corpus()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: resolve_oracle(q.oracle, DRIVER_ORACLE_SF_DIR)
        for name, q in all_queries().items()
        if q.oracle
    }


_LOADED = False


def _load_corpus() -> None:
    """Import every corpus module exactly once (imports populate the
    registry via the @register decorator)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        llm,
        multimodal_queries,
        pipeline_queries,
        relational,
        sinks_queries,
        smt_queries,
        sources_queries,
        streaming_queries,
        text_queries,
        udf_queries,
    )

    _LOADED = True
