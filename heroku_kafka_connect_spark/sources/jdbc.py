"""JDBC source modes — §2.A (SURVEY.md).

The Confluent JDBC source connector (installed at reference
Dockerfile:36-40, configured per-connector via CONNECTOR_${name} JSON,
reference main.sh:148-159) polls a relational table in one of four
modes: bulk, incrementing, timestamp, timestamp+incrementing — plus a
`query=` mode that pushes arbitrary SQL to the database.

Spark-native mapping: each mode is a *predicate factory* over a
DataFrame. Against a real database the same predicates ride along
`spark.read.jdbc` and are pushed down to the remote DB by Catalyst
(JDBC filter pushdown), which is exactly the connector's behavior —
`WHERE id > ?` server-side, never a full-table pull. Against the
fixture parquet, the same predicates hit the parquet row-group stats.

Offsets: the connector persists the last-seen (ts, id) watermark in
the offset topic (reference main.sh:63); batch callers persist
`Offset` themselves, streaming callers get it from the checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Offset:
    """Last-committed incremental position (the connector's stored
    offset, reference main.sh:63 analog)."""

    incrementing: Any | None = None
    timestamp: Any | None = None


def bulk(df: DataFrame) -> DataFrame:
    """mode=bulk: full snapshot each poll."""
    return df


def incrementing_predicate(id_col: str, offset: Offset) -> Column:
    """mode=incrementing: strictly-monotonic id high-watermark."""
    if offset.incrementing is None:
        return F.lit(True)
    return F.col(id_col) > F.lit(offset.incrementing)


def timestamp_predicate(ts_col: str, offset: Offset) -> Column:
    """mode=timestamp: rows newer than the stored timestamp."""
    if offset.timestamp is None:
        return F.lit(True)
    return F.col(ts_col) > F.lit(offset.timestamp).cast("timestamp")


def timestamp_incrementing_predicate(ts_col: str, id_col: str, offset: Offset) -> Column:
    """mode=timestamp+incrementing: compound watermark that is safe
    under same-timestamp ties — (ts > T) OR (ts = T AND id > K)."""
    if offset.timestamp is None:
        return incrementing_predicate(id_col, offset)
    ts_lit = F.lit(offset.timestamp).cast("timestamp")
    inc = (
        F.lit(True)
        if offset.incrementing is None
        else F.col(id_col) > F.lit(offset.incrementing)
    )
    return (F.col(ts_col) > ts_lit) | ((F.col(ts_col) == ts_lit) & inc)


def poll(df: DataFrame, mode: str, offset: Offset, *, id_col: str | None = None, ts_col: str | None = None) -> DataFrame:
    """One connector poll in the given mode."""
    if mode == "bulk":
        return bulk(df)
    if mode == "incrementing":
        return df.filter(incrementing_predicate(id_col, offset))
    if mode == "timestamp":
        return df.filter(timestamp_predicate(ts_col, offset))
    if mode == "timestamp+incrementing":
        return df.filter(timestamp_incrementing_predicate(ts_col, id_col, offset))
    raise ValueError(f"unknown JDBC source mode: {mode}")


def read_query(spark: SparkSession, url: str, query: str, **options) -> DataFrame:
    """`query=` mode against a real database: Spark ships the SQL to
    the DB as a subquery — computation happens remotely, like the
    connector's query mode."""
    return spark.read.format("jdbc").option("url", url).option("query", query).options(**options).load()


def stride_predicates(col: str, lower: int, upper: int, n: int) -> list[str]:
    """Partition a numeric key range into `n` contiguous WHERE clauses
    for `spark.read.jdbc(..., predicates=...)` — one DB connection per
    clause. This is the engine's `tasks.max`: a single-connection JDBC
    read is the classic 100 TB ingestion bottleneck (the Connect
    source parallelizes the same way, one query span per task).
    Clauses cover (-inf, +inf) so rows outside [lower, upper) are
    never silently dropped — identical to Spark's own
    partitionColumn/lowerBound/upperBound semantics."""
    if n < 1 or upper <= lower:
        raise ValueError("need n >= 1 and upper > lower")
    if n == 1:
        return ["1=1"]
    stride = (upper - lower) / n
    bounds = [lower + round(i * stride) for i in range(1, n)]
    preds = [f"{col} < {bounds[0]} OR {col} IS NULL"]
    preds += [f"{col} >= {bounds[i - 1]} AND {col} < {bounds[i]}" for i in range(1, n - 1)]
    preds.append(f"{col} >= {bounds[-1]}")
    return preds


def read_partitioned(
    spark: SparkSession, url: str, table: str, col: str, lower: int, upper: int, n: int, **options
) -> DataFrame:
    """Parallel JDBC table read: `n` concurrent range-partitioned
    connections (A1 bulk mode at scale)."""
    return spark.read.jdbc(url, table, predicates=stride_predicates(col, lower, upper, n), properties=options)
