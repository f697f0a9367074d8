"""Cross-engine determinism helpers.

The driver hash-compares Spark results against DuckDB at sf0.01, so
every aggregate must be bit-identical across engines. Conventions:

- **Money/measure sums** go through ``decimal(18,2)`` (exact, order-
  independent) and are cast back to double at the end. Double sums
  accumulate order-dependent FP error (~n·eps·sum) that can cross a
  round(x, 2) boundary at scale; decimal sums cannot. The same
  convention appears in the oracle SQL (``SUM(CAST(x AS
  DECIMAL(18,2)))``), so both engines do exact decimal arithmetic.
- **Timestamps** are emitted as epoch microseconds (``unix_micros`` /
  DuckDB ``epoch_us``) or DATE — never raw TIMESTAMP columns, whose
  tz-awareness differs between engines.
- **Limits/top-k** always carry a unique tie-break key so the selected
  rows are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parallelize_scan(df, key: str | None = None):
    """Round-robin/hash repartition to the session's default
    parallelism. Use ONLY in front of compute-heavy narrow stages
    (Arrow/pandas UDFs, per-row hashing): a small-file scan yields
    fewer input splits than cores, serializing the Python stage. At
    cluster scale the scan has ample splits and this is a no-op-cost
    shuffle of the projected columns — keep the projection narrow
    before calling."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, F.col(key)) if key else df.repartition(par)


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2, out_scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum / count, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(dec(c, scale)).cast("double") / F.count(c), out_scale
    )


def ts_us(col: Column | str) -> Column:
    """Epoch microseconds from TIMESTAMP or TIMESTAMP_NTZ columns.
    Fixture parquet mixes both (orders/lineitem read as NTZ,
    events as instant after the ns→µs conversion); the session is
    pinned to UTC, so the NTZ→instant cast is the identity on the
    wall-clock value and matches DuckDB's epoch_us."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


# DuckDB oracle-side fragments mirroring the helpers above.
def o_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def o_davg(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {out_scale})"
    )
