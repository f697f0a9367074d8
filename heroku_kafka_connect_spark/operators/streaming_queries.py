"""§2.F — streaming semantics, batch-equivalent corpus queries.

Each query applies the REAL streaming operator (window/session_window/
dropDuplicates) on the batch fixture — Structured Streaming's unified
model guarantees identical semantics on a stream — so DuckDB can
oracle-check them. stream_resume runs an actual checkpointed
micro-batch stream (rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_tables
from ..streaming import windows
from ..streaming.runner import read_events_stream, run_available_now
from .common import msum


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
           (epoch_us(ts) // 600000000) * 600000000 + 600000000 AS window_end_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100 AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: 10-minute tumbling windows per event type (epoch-aligned,
    identical on a stream with a watermark)."""
    t = load_tables(spark, sf_dir)
    return windows.tumbling(t.events, "ts", "10 minutes", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        msum("value").alias("sum_value"),
    ).select(*windows.window_bounds_us(), "event_type", "n", "sum_value")


@register(
    "stream_sliding_window",
    oracle="""
    SELECT ws AS window_start_us,
           ws + 600000000 AS window_end_us,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100 AS DOUBLE) AS sum_value
    FROM (
      SELECT ((epoch_us(ts) // 300000000) - g.g) * 300000000 AS ws, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS g) g
    )
    GROUP BY ws
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: 10-minute windows sliding every 5 — each event lands in two
    windows; oracle materializes both bucket assignments per row."""
    t = load_tables(spark, sf_dir)
    return windows.sliding(t.events, "ts", "10 minutes", "5 minutes").agg(
        F.count(F.lit(1)).alias("n"),
        msum("value").alias("sum_value"),
    ).select(*windows.window_bounds_us(), "n", "sum_value")


@register(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(epoch_us(ts)) AS session_start_us,
           MAX(epoch_us(ts)) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: 30-minute-gap session windows per user (Spark session end =
    last event + gap; oracle is the gaps-and-islands equivalent).
    On a stream this REQUIRES a watermark — state merges sessions
    incrementally and evicts closed ones."""
    t = load_tables(spark, sf_dir)
    return windows.session(t.events, "ts", "30 minutes", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
        "n_events",
    )


@register(
    "stream_late_data",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us
    FROM events
    WHERE epoch_us(ts) >= (SELECT MAX(epoch_us(ts)) FROM events) - 86400000000
    """,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 batch-equivalent: watermark '1 day' — rows more than a day
    behind the max observed event time are dropped."""
    t = load_tables(spark, sf_dir)
    kept = windows.late_data_filter(t.events, "ts", "1 DAY")
    return kept.select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))


@register(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, epoch_us(ts) AS first_ts_us
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts ASC, event_id ASC) = 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: keep-first dedup per (user, type). dropDuplicates keeps an
    arbitrary row, so the deterministic engine path is first-by-
    event-time — same state shape, oracle-checkable."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        t.events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.unix_micros("ts").alias("first_ts_us"),
        )
    )


@register(
    "stream_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS user_id,
           epoch_us(p.ts) AS purchase_ts_us, epoch_us(c.ts) AS click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (batch-equivalent): every click
    within the hour before a purchase by the same user — attribution,
    the canonical stream-stream join. On streams both sides carry
    watermarks and the interval condition bounds join state to one
    hour per side (tested live in tests/test_streaming.py). At 100 TB
    the time bound IS the scalability: without it, stream-stream join
    state grows without limit."""
    t = load_tables(spark, sf_dir)
    p = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = t.events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("c_ts").alias("click_ts_us"),
    )


@register(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MAX(epoch_us(ts)) AS last_ts_us
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals on a REAL checkpointed stream. The fixture arrives
    as one micro-batch, so the cumulative emission equals the batch
    aggregate — which is exactly what the oracle checks; cross-batch
    state accumulation is exercised in tests/test_streaming.py."""
    from ..streaming.stateful import running_totals

    stream = read_events_stream(spark, sf_dir)
    return run_available_now(running_totals(stream), output_mode="update")


@register(
    "stream_resume",
    oracle="""
    WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
    mx AS (SELECT MAX(us) AS m FROM e)
    SELECT CAST((us // 3600000000) * 3600000000 AS BIGINT) AS window_start_us,
           CAST((us // 3600000000) * 3600000000 + 3600000000 AS BIGINT) AS window_end_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM e, mx
    GROUP BY 1, 2, 3, m
    HAVING window_end_us <= m - 86400000000
    """,
)
def stream_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: REAL Structured Streaming run — file source over the events
    fixture, watermarked tumbling count, checkpointed memory sink,
    Trigger.AvailableNow. Resume-without-loss is asserted in
    tests/test_streaming.py (the multi-run checkpoint leg, which no
    single-invocation oracle can observe); what a single run emits IS
    deterministic, and since r11 the oracle replays it in SQL: APPEND
    mode finalizes exactly the windows the final watermark has passed,
    so the emitted set is the hourly counts whose window_end <=
    max(ts) - 1 day (the watermark delay). The fixture file arrives as
    one micro-batch with watermark 0, so nothing emits mid-stream; the
    AvailableNow no-data flush batch advances the watermark to
    max - 1d and evicts the closed windows — StateStoreSave(append)
    evicts on window_end <= watermark, replayed by the HAVING. This
    retired the corpus's last rows-only query: 314/314 oracled."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        windows.tumbling(stream, "ts", "1 hour", "event_type", watermark="1 day")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(*windows.window_bounds_us(), "event_type", "n")
    )
    return run_available_now(agg, output_mode="append")


@register(
    "stream_join_left_outer",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS user_id,
           epoch_us(p.ts) AS purchase_ts_us, epoch_us(c.ts) AS click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    """,
)
def stream_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked LEFT OUTER stream-stream join (batch-equivalent):
    `stream_interval_join` plus the unmatched purchases, null-padded —
    the attribution query that must also report conversions without a
    preceding click. On streams, outer emission is watermark-driven:
    an unmatched left row is held in state until the watermark passes
    its join window, then emitted with nulls (state eviction is the
    scalability story, exercised live in tests/test_streaming.py::
    test_stream_stream_left_outer_join_live; the fixture arrives as
    one batch, so the final emission equals this batch left join,
    which is what the oracle pins)."""
    t = load_tables(spark, sf_dir)
    p = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = t.events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left",
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("c_ts").alias("click_ts_us"),
    )


@register(
    "stream_static_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
           n.n_name AS nation, e.event_type, e.value,
           epoch_us(e.ts) AS ts_us
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE e.event_type IN ('purchase', 'signup')
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the Connect-style 'decorate the
    stream with dimension data' pattern (batch-equivalent here; the
    live stream-static join needs no watermark because the static
    side is re-read per micro-batch, not held in state). Both dims
    broadcast: at 100 TB of events the fact side never shuffles —
    the same star shape as rel_join_broadcast_star."""
    t = load_tables(spark, sf_dir)
    enriched = (
        t.events.filter(F.col("event_type").isin("purchase", "signup"))
        .join(
            F.broadcast(t.customer),
            F.col("c_custkey") == F.col("user_id"),
        )
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return enriched.select(
        "event_id",
        "user_id",
        "c_name",
        "c_mktsegment",
        F.col("n_name").alias("nation"),
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )


@register(
    "stream_window_topk",
    oracle="""
    WITH w AS (
      SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT window_start_us, event_type, n, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY window_start_us ORDER BY n DESC, event_type) AS rn
          FROM w)
    WHERE rn <= 2
    """,
)
def stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k: the 2 busiest event types per 10-minute tumbling
    window — the trending-topics shape. On a live stream this runs as
    windowed agg (update mode) + rank on the complete windows; in the
    unified model the batch plan below is semantically identical.
    Scale: the rank partitions by window, so WindowGroupLimit pushes
    the k-cut map-side and only ~k rows per window per task reach the
    exchange; no global sort anywhere. Tie-break on event_type keeps
    the selected rows deterministic across engines."""
    t = load_tables(spark, sf_dir)
    agg = windows.tumbling(t.events, "ts", "10 minutes", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("window").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select(windows.window_bounds_us()[0], "event_type", "n", "rank")
    )


@register(
    "stream_window_distinct_users",
    oracle="""
    SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
           (epoch_us(ts) // 600000000) * 600000000 + 600000000 AS window_end_us,
           event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F: EXACT windowed distinct users (per-window unique reach) the
    streaming-legal way — COUNT(DISTINCT) is unsupported in streaming
    aggregations, so the production composition is dropDuplicates on
    (window, type, user) followed by a windowed count: both stages
    are watermark-compatible (dedup state evicts with the watermark,
    the count is an ordinary stateful agg), and on a batch frame the
    composition is semantically COUNT(DISTINCT), which is what the
    oracle checks. The unbounded-window sibling of
    rel_rolling_distinct_users, and the exact counterpart of an
    approx_count_distinct sketch when reach numbers must reconcile.

    Scale: the dedup is one hash exchange on (window, type, user) —
    state O(distinct triples per live watermark window), not
    O(events); the count then reuses that partitioning map-side."""
    t = load_tables(spark, sf_dir)
    win = F.window("ts", "10 minutes")
    dedup = t.events.select(win.alias("window"), "event_type", "user_id").dropDuplicates(
        ["window", "event_type", "user_id"]
    )
    return (
        dedup.groupBy("window", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(*windows.window_bounds_us(), "event_type", "n_users")
    )


# ------------------------------------------------- r10: foreachBatch idempotent MERGE


def _latest_version_below(target: str, epoch_id: int | None) -> str | None:
    """Highest committed version dir strictly below ``v{epoch_id}``
    (or the overall highest when ``epoch_id`` is None — the read
    path). Temp dirs from in-flight/failed writes are excluded: only
    atomically-renamed ``v*`` names count as committed."""
    import os

    cut = None if epoch_id is None else f"v{epoch_id:06d}"
    vs = sorted(
        v
        for v in os.listdir(target)
        if v.startswith("v") and ".tmp" not in v and (cut is None or v < cut)
    )
    return os.path.join(target, vs[-1]) if vs else None


def merge_into_versioned(target: str, batch_df: DataFrame, epoch_id: int, keyw) -> None:
    """The foreachBatch MERGE body, retry-idempotent (r10 ADVICE):

    - prior state = highest version STRICTLY BELOW v{epoch_id}, so a
      retried epoch replays from the pre-batch state instead of
      reading (and overwriting) its own possibly-partial output;
    - the merged result is written to a ``.tmp`` staging dir first,
      then renamed over v{epoch_id} — readers never observe a
      half-written version, and a retry discards the poisoned dir.
    """
    import os
    import shutil

    s = batch_df.sparkSession
    cur = _latest_version_below(target, epoch_id)
    merged = batch_df if cur is None else s.read.parquet(cur).unionByName(batch_df)
    resolved = (
        merged.withColumn("__rn", F.row_number().over(keyw))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    final = os.path.join(target, f"v{epoch_id:06d}")
    tmp = final + ".tmp"
    # mode=overwrite clears a tmp dir left by an earlier failed attempt
    resolved.write.mode("overwrite").parquet(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)  # poisoned/partial dir from the failed try
    os.rename(tmp, final)  # POSIX-atomic commit


@register(
    "stream_foreachbatch_merge",
    oracle="""
    SELECT user_id, event_type,
           event_id AS last_event_id, epoch_us(ts) AS last_ts_us
    FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def stream_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch idempotent MERGE — THE production streaming-sink
    pattern for stores without a streaming writer (JDBC, Delta MERGE,
    every warehouse): a REAL checkpointed stream (file source staged
    as FOUR files, maxFilesPerTrigger=1 ⇒ four micro-batches,
    Trigger.AvailableNow) whose every batch merges keep-latest-per-
    (user, event_type) into a versioned parquet target — read current
    state, union the batch, resolve by (ts, event_id) DESC, write
    version[epoch]. Idempotence falls out of the versioning: the
    prior state a batch merges against is the highest version dir
    STRICTLY BELOW v{epoch_id}, and the write goes to a temp dir that
    is atomically renamed in — so a RETRIED epoch replays from the
    pre-batch state (never reads-and-overwrites its own output, which
    Spark rejects, and a partial dir from a mid-write failure is
    simply replaced, r10 ADVICE; the exactly-once-for-idempotent-
    sinks contract, F2; merge_into_versioned below, regression-tested
    in tests/test_round11_ops.py). Batch-order
    independence falls out of keep-latest being a semilattice join
    (any merge order converges — the property the oracle's global
    keep-latest pins). This is the streaming twin of rel_merge_into's
    batch MERGE and the streaming complement of B2 sink_upsert_latest.

    Scale: per batch the merge shuffles on the merge key only; state
    lives in the TARGET table (not executor state stores), so state
    size is bounded by distinct keys exactly like a real MERGE sink;
    a Delta/Iceberg writer drops into the same foreachBatch body."""
    import os

    from ..session import configure

    configure(spark)
    t = load_tables(spark, sf_dir)
    keyw = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def _write(loc: str) -> None:
        staged = os.path.join(loc, "staged")
        # stage the fixture as 4 hash-scattered files => 4 micro-batches
        t.events.select("event_id", "ts", "user_id", "event_type").repartition(
            4, "event_id"
        ).write.mode("overwrite").parquet(staged)

        schema = spark.read.parquet(staged).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .format("parquet")
            .load(staged)
        )

        target = os.path.join(loc, "target")
        os.makedirs(target, exist_ok=True)

        def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
            merge_into_versioned(target, batch_df, epoch_id, keyw)

        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", os.path.join(loc, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    from .common import derived_fixture

    base = derived_fixture(spark, sf_dir, "febm", _write)
    final = _latest_version_below(os.path.join(base, "target"), None)
    return spark.read.parquet(final).select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.unix_micros("ts").alias("last_ts_us"),
    )
