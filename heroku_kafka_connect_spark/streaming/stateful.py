"""Custom stateful streaming operators — applyInPandasWithState.

The Connect framework's only state is source offsets; anything
stateful (Debezium upsert history, sessionization) lives in the
external DB. Spark's arbitrary-state API lets this engine own such
operators: state lives in the checkpointed state store, partitioned
by key, and survives restarts exactly like source offsets
(SURVEY.md §2.F, reference main.sh:63 analog).

Scale notes (100 TB): state is hash-partitioned by the grouping key
across executors; per-key state here is O(1) (three scalars), so
total state = O(distinct keys), not O(events). On unbounded key
domains pair with a watermark + state TTL (GroupStateTimeout) —
enforced for session windows in windows.py; running totals
deliberately keep all keys (the operator's contract).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of running_totals (cumulative per key, emitted per batch)
TOTALS_SCHEMA = "user_id bigint, n_events bigint, sum_value double, last_ts_us bigint"
#: state: (event count, exact cents sum, max event-time micros)
TOTALS_STATE = "n bigint, cents bigint, last_us bigint"


def _totals_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Cumulative (count, exact-cents sum, max ts) per key. Money is
    accumulated as int64 cents — float accumulation across batches
    would drift with batch boundaries and break determinism."""
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [cents / 100.0],
            "last_ts_us": [last_us],
        }
    )


def running_totals(
    events: DataFrame, *, key_col: str = "user_id", ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Per-key running totals over a STREAM: one output row per key
    per micro-batch carrying the cumulative state (outputMode=update
    downstream). The canonical applyInPandasWithState shape: grouped
    Arrow batches in, checkpointed per-key state, Arrow batches out."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(value_col).alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
