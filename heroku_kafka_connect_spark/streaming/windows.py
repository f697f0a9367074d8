"""Event-time windowing — §2.F6-F10 (SURVEY.md).

The deployed stack's only time semantics are tumbling file rollover
(Camel sink, reference Dockerfile:46-59) and timestamp routing
(TimestampRouter SMT); the north star adds the full streaming window
family. Every builder here works identically on a batch DataFrame and
a streaming one — that's the point of Structured Streaming's unified
model, and it's what lets the driver's DuckDB oracle check streaming
semantics in batch mode.

100 TB/unbounded-state discipline: every streaming aggregation MUST
carry a watermark (bounds state store size); session windows and
dedup additionally bound key cardinality by TTL. The builders take
`watermark=` so callers can't silently create unbounded state on a
stream (enforced: streaming input without watermark raises).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """F9: late-data bound. On a stream this caps state and drops
    rows later than `delay` behind the max event time seen."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def _guard(df: DataFrame, watermark: str | None) -> None:
    if df.isStreaming and not watermark:
        raise ValueError(
            "streaming aggregation without watermark => unbounded state; pass watermark="
        )


def tumbling(df: DataFrame, ts_col: str, size: str, *keys: str, watermark: str | None = None):
    """F6: tumbling window grouped-data (epoch-aligned, same alignment
    as DuckDB's epoch integer-division bucketing)."""
    _guard(df, watermark)
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    return df.groupBy(F.window(ts_col, size), *keys)


def sliding(df: DataFrame, ts_col: str, size: str, slide: str, *keys: str, watermark: str | None = None):
    """F7: sliding window — each row lands in size/slide windows."""
    _guard(df, watermark)
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    return df.groupBy(F.window(ts_col, size, slide), *keys)


def session(df: DataFrame, ts_col: str, gap: str, *keys: str, watermark: str | None = None):
    """F8: session window (gap-based). Spark's session end = last
    event + gap. State is merged incrementally on a stream; batch
    mode = gaps-and-islands."""
    _guard(df, watermark)
    if watermark:
        df = with_watermark(df, ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap), *keys)


def dedup_stream(df: DataFrame, keys: list[str], ts_col: str | None = None, watermark: str | None = None) -> DataFrame:
    """F10: streaming dedup by key. With a watermark the state store
    evicts keys older than the delay (dropDuplicatesWithinWatermark);
    without one on a stream this would grow forever — guarded."""
    _guard(df, watermark)
    if df.isStreaming and watermark and ts_col:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def late_data_filter(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """F9 batch-equivalent of the watermark drop: keep rows within
    `delay` of the max event time. (On a stream, use with_watermark —
    this exists so the semantics are oracle-checkable in batch.)"""
    max_ts = df.agg(F.max(F.col(ts_col).cast("timestamp")).alias("__max_ts"))
    return (
        df.crossJoin(F.broadcast(max_ts))
        .filter(F.col(ts_col).cast("timestamp") >= F.col("__max_ts") - F.expr(f"INTERVAL {delay}"))
        .drop("__max_ts")
    )


def window_bounds_us(window_col: str = "window") -> list[Column]:
    """Emit window bounds as epoch µs (cross-engine hashable)."""
    return [
        F.unix_micros(F.col(f"{window_col}.start")).alias("window_start_us"),
        F.unix_micros(F.col(f"{window_col}.end")).alias("window_end_us"),
    ]
