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


def _accumulate_totals(
    totals: tuple[int, int, int], pdfs: Iterator[pd.DataFrame]
) -> tuple[int, int, int]:
    """THE totals accumulation — shared by the v1 (applyInPandasWith
    State) and v2 (transformWithStateInPandas) operators so the two
    API surfaces cannot drift semantically. Money accumulates as
    int64 cents: float accumulation across batches would drift with
    batch boundaries and break determinism."""
    n, cents, last_us = totals
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_us"].max()))
    return n, cents, last_us


def _totals_row(key: tuple[Any, ...], totals: tuple[int, int, int]) -> pd.DataFrame:
    n, cents, last_us = totals
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [cents / 100.0],
            "last_ts_us": [last_us],
        }
    )


def _totals_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Cumulative (count, exact-cents sum, max ts) per key."""
    totals = _accumulate_totals(
        state.get if state.exists else (0, 0, 0), pdfs
    )
    state.update(totals)
    yield _totals_row(key, totals)


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


#: output schema of sessionize: one row per CLOSED session
SESSIONS_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, n_events bigint"
)
SESSIONS_STATE = "start_us bigint, last_us bigint, n bigint"


def make_sessionize_fn(gap_ms: int):
    """Builds the applyInPandasWithState callable for ``sessionize``
    (module-level factory so cloudpickle ships it by reference)."""
    gap_us = gap_ms * 1000

    def _fn(key, pdfs, state: "GroupState"):
        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is
            # CLOSED — emit it and drop the state (the TTL is the
            # unbounded-key-domain guard: idle keys cost nothing)
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                }
            )
            return
        # Gaps-and-islands merge over the batch events PLUS the open
        # session interval, in sorted order — so a late event (admitted
        # by the watermark in a later batch) is evaluated against both
        # neighbors: within gap of the open session it merges (never
        # dragging session_end backwards); EARLIER than session_start −
        # gap it forms its own separate session instead of silently
        # extending the open one (which made output depend on
        # micro-batch boundaries — the same two events in one batch
        # were split by the gap check).
        items = [[int(t), int(t), 1] for pdf in pdfs for t in pdf["ts_us"].tolist()]
        if state.exists:
            items.append(list(state.get))
        if not items:  # defensive: no events and no state
            return
        items.sort(key=lambda s: (s[0], s[1]))
        merged = [items[0]]
        for s in items[1:]:
            prev = merged[-1]
            if s[0] - prev[1] <= gap_us:
                prev[1] = max(prev[1], s[1])
                prev[2] += s[2]
            else:
                merged.append(s)
        # all but the latest island are closed now; NB an island that
        # closes here can in principle still be extended by an even
        # later-arriving event when the watermark delay exceeds the
        # gap — that event then (correctly) opens a new session rather
        # than corrupting this one, the bounded-state trade-off of
        # keeping ONE open interval per key
        closed = [tuple(s) for s in merged[:-1]]
        start_us, last_us, n = merged[-1]
        state.update((start_us, last_us, n))
        # TTL: wake this key when the watermark passes last + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return _fn


def sessionize(
    events: DataFrame,
    *,
    gap_ms: int = 30 * 60 * 1000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Custom sessionization with state TTL — the
    GroupStateTimeout.EventTimeTimeout counterpart of the builtin
    `session_window` (F8): sessions CLOSE (and emit) when the
    watermark passes last-event + gap, so per-key state is evicted
    exactly when no future event can extend the session. This is the
    pattern for stateful operators over UNBOUNDED key domains
    (users, IPs): without a TTL, state grows with every key ever
    seen; with it, state is O(active keys in one gap window).
    Exercised live in tests/test_streaming.py::
    test_custom_sessionize_emits_on_timeout."""
    from pyspark.sql import functions as F

    prepared = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("user_id"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(ts_col),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_sessionize_fn(gap_ms),
        outputStructType=SESSIONS_SCHEMA,
        stateStructType=SESSIONS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def make_running_totals_processor():
    """`transformWithStateInPandas` (Spark 4 arbitrary-state v2 API)
    processor for ``running_totals_tws``: same cumulative totals per
    key, kept in a typed ValueState instead of the v1 tuple blob, and
    computed by the SAME ``_accumulate_totals`` the v1 operator uses
    — one accumulation, two API surfaces. The v2 API is the forward
    path (typed state, timers, TTL); this is the migration template.

    A factory (class body built at call time) so importing this
    module never requires the v2 API or its protobuf dependency."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            from pyspark.sql.types import LongType, StructField, StructType

            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("cents", LongType()),
                        StructField("last_us", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            totals = _accumulate_totals(
                self._state.get() if self._state.exists() else (0, 0, 0), rows
            )
            self._state.update(totals)
            yield _totals_row(key, totals)

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def running_totals_tws(
    events: DataFrame, *, key_col: str = "user_id", ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """``running_totals`` on the v2 arbitrary-state API
    (`transformWithStateInPandas`) — identical semantics and output
    schema, pinned equal to the v1 path by
    tests/test_streaming.py::test_tws_running_totals_matches_v1.
    ENVIRONMENT-GATED like the spark-avro jar: the v2 state protocol
    is protobuf-serialized between the JVM and the Python driver
    worker, so this path needs ``google.protobuf`` installed (absent
    in this sandbox — the test importorskips; the v1 path remains
    the in-sandbox-proven default)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(value_col).alias("value"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_totals_processor(),
        outputStructType=TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
