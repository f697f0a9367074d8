"""Structured Streaming semantics: checkpoint resume without loss or
duplication (F1/F2 — the analog of Connect's offset topic,
reference main.sh:63), watermark guard, and window helpers."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from heroku_kafka_connect_spark.streaming import windows


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "k int, v int").coalesce(1).write.mode("append").parquet(path)


def _run_once(spark, src, cp, out):
    """One availableNow run into a DURABLE (parquet) sink — the memory
    sink cannot recover a checkpoint, exactly like Connect's offset
    topic only matters for durable targets."""
    stream = spark.readStream.schema("k int, v int").parquet(src)
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_checkpoint_resume_no_loss_no_dup(spark, tmp_path):
    """Run → stop → append more input → restart with the SAME
    checkpoint: the sink must hold the full input EXACTLY once (the
    resumed run processed only the new file); a fresh checkpoint over
    the same sink duplicates the history, proving the checkpoint was
    what prevented reprocessing."""
    src, cp, out = str(tmp_path / "src"), str(tmp_path / "cp"), str(tmp_path / "out")
    _write_batch(spark, src, [(1, 10), (2, 20)])
    got1 = _run_once(spark, src, cp, out).collect()
    assert sorted(r.k for r in got1) == [1, 2]

    _write_batch(spark, src, [(3, 30)])
    got2 = _run_once(spark, src, cp, out).collect()
    assert sorted(r.k for r in got2) == [1, 2, 3]  # no loss, no dup

    # A fresh checkpoint into a fresh sink replays ALL input — proving
    # it was the checkpoint (not the sink) that prevented reprocessing.
    # (Same sink would hide the dup: the file-sink _spark_metadata log
    # is batch-id-keyed, so batch 0 of a restarted query overwrites it.)
    shutil.rmtree(cp)
    got3 = _run_once(spark, src, cp, str(tmp_path / "out2")).collect()
    assert sorted(r.k for r in got3) == [1, 2, 3]


def test_streaming_windowed_agg_end_to_end(spark, sf_dir):
    """Real micro-batch run of a watermarked tumbling window over the
    events fixture — equals the batch computation of the same window."""
    from heroku_kafka_connect_spark.session import load_tables
    from heroku_kafka_connect_spark.streaming.runner import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    agg = (
        windows.tumbling(stream, "ts", "1 hour", watermark="1 hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(*windows.window_bounds_us(), "n")
    )
    got = {
        (r.window_start_us, r.window_end_us, r.n)
        for r in run_available_now(agg, output_mode="append").collect()
    }

    events = load_tables(spark, sf_dir).events
    batch = (
        windows.tumbling(events, "ts", "1 hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(*windows.window_bounds_us(), "n")
    )
    want = {(r.window_start_us, r.window_end_us, r.n) for r in batch.collect()}
    # append mode emits a window once the watermark (max event time -
    # 1 hour) passes its end: that is every batch window except those
    # touching the final hour of the fixture
    max_us = events.agg(F.unix_micros(F.max("ts"))).first()[0]
    want_final = {w for w in want if w[1] <= max_us - 3_600_000_000}
    assert want_final and want_final <= got <= want


def test_watermark_guard_requires_watermark_on_streams(spark, tmp_path):
    """Unbounded state is a 100 TB outage: session windows on a stream
    without a watermark must be rejected by our API."""
    stream = spark.readStream.schema("k int, v int").parquet(str(tmp_path))
    ts = stream.withColumn("ts", F.current_timestamp())
    with pytest.raises(ValueError, match="watermark"):
        windows.session(ts, "ts", "30 minutes", "k")
    # batch frames need no watermark
    batch = spark.createDataFrame([(1,)], "k int").withColumn("ts", F.current_timestamp())
    windows.session(batch, "ts", "30 minutes", "k")


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key state must survive micro-batch
    boundaries AND restarts (checkpointed state store). Two separate
    availableNow runs over a growing source directory — the second run
    processes ONLY the new file yet emits cumulative totals."""
    from pyspark.sql import functions as F

    from heroku_kafka_connect_spark.streaming.stateful import running_totals

    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")

    def run(name):
        # memory sink can't recover a checkpoint; foreachBatch can
        captured = []
        stream = (
            spark.readStream.schema("user_id bigint, ts_s long, value double")
            .parquet(src)
            .withColumn("ts", F.timestamp_seconds("ts_s"))
        )
        q = (
            running_totals(stream)
            .writeStream.foreachBatch(lambda df, _bid: captured.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.user_id: r for r in captured}

    spark.createDataFrame([(1, 100, 1.25), (1, 200, 2.25), (2, 50, 5.0)],
                          "user_id bigint, ts_s long, value double").write.parquet(src)
    got1 = run("totals_run1")
    assert got1[1].n_events == 2 and got1[1].sum_value == 3.5
    assert got1[1].last_ts_us == 200_000_000

    spark.createDataFrame([(1, 300, 0.50)], "user_id bigint, ts_s long, value double")\
        .write.mode("append").parquet(src)
    got2 = run("totals_run2")
    assert got2[1].n_events == 3 and got2[1].sum_value == 4.0  # state resumed
    assert got2[1].last_ts_us == 300_000_000
    assert 2 not in got2  # update mode: untouched keys are not re-emitted


def test_dedup_stream_semantics(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    out = windows.dedup_stream(df, ["k"])
    assert out.count() == 2


def test_late_data_filter(spark):
    df = spark.createDataFrame(
        [("2024-01-10 00:00:00",), ("2024-01-01 00:00:00",), ("2024-01-09 12:00:00",)],
        "s string",
    ).withColumn("ts", F.to_timestamp("s"))
    kept = windows.late_data_filter(df, "ts", "1 DAY")
    assert sorted(r.s for r in kept.collect()) == ["2024-01-09 12:00:00", "2024-01-10 00:00:00"]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """F10 on a REAL stream: dropDuplicatesWithinWatermark must drop a
    key's reappearance in a later micro-batch (state persisted in the
    checkpoint) — the Debezium-upsert-analog dedup the batch tests
    can't prove."""
    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")
    seen = []

    def run():
        stream = (
            spark.readStream.schema("k int, ts_s long, v string")
            .parquet(src)
            .withColumn("ts", F.timestamp_seconds("ts_s"))
        )
        deduped = windows.dedup_stream(stream, ["k"], ts_col="ts", watermark="1 hour")
        q = (
            deduped.writeStream.foreachBatch(lambda df, _b: seen.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(1, 100, "first"), (2, 100, "other")],
                          "k int, ts_s long, v string").write.parquet(src)
    run()
    assert sorted(r.k for r in seen) == [1, 2]

    # duplicate k=1 within the watermark + a fresh k=3
    spark.createDataFrame([(1, 200, "dup"), (3, 200, "new")],
                          "k int, ts_s long, v string").write.mode("append").parquet(src)
    run()
    assert sorted(r.k for r in seen) == [1, 2, 3]  # dup suppressed across batches
    assert {r.v for r in seen if r.k == 1} == {"first"}


def test_stream_stream_interval_join_live(spark, tmp_path):
    """REAL stream-stream inner join: two watermarked file streams,
    interval condition bounding state. Late-arriving matches in a
    second batch still join (state held within the watermark)."""
    psrc, csrc, cp = str(tmp_path / "p"), str(tmp_path / "c"), str(tmp_path / "cp")
    seen = []

    def run():
        p = (
            spark.readStream.schema("pid int, user int, ts_s long").parquet(psrc)
            .withColumn("p_ts", F.timestamp_seconds("ts_s")).drop("ts_s")
            .withWatermark("p_ts", "1 hour")
        )
        c = (
            spark.readStream.schema("cid int, cuser int, ts_s long").parquet(csrc)
            .withColumn("c_ts", F.timestamp_seconds("ts_s")).drop("ts_s")
            .withWatermark("c_ts", "1 hour")
        )
        j = p.join(
            c,
            (F.col("user") == F.col("cuser"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        q = (
            j.writeStream.foreachBatch(lambda df, _b: seen.extend(df.collect()))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # purchase at t=1000; matching click at t=700 (within 10 min)
    spark.createDataFrame([(1, 7, 1000)], "pid int, user int, ts_s long").write.parquet(psrc)
    spark.createDataFrame([(10, 7, 700), (11, 7, 100)], "cid int, cuser int, ts_s long").write.parquet(csrc)
    run()
    assert {(r.pid, r.cid) for r in seen} == {(1, 10)}  # t=100 outside window

    # second batch: new purchase matching the OLD click (state held)
    spark.createDataFrame([(2, 7, 1100)], "pid int, user int, ts_s long").write.mode("append").parquet(psrc)
    run()
    assert {(r.pid, r.cid) for r in seen} == {(1, 10), (2, 10)}


def test_stream_stream_left_outer_join_live(spark, tmp_path):
    """REAL left-outer stream-stream join: unmatched left rows are
    held in state and emitted null-padded only once the watermark
    passes their join window — the state-eviction semantics the
    corpus query (stream_join_left_outer) documents."""
    psrc, csrc, cp = str(tmp_path / "p"), str(tmp_path / "c"), str(tmp_path / "cp")
    seen = []

    def run():
        p = (
            spark.readStream.schema("pid int, user int, ts_s long").parquet(psrc)
            .withColumn("p_ts", F.timestamp_seconds("ts_s")).drop("ts_s")
            .withWatermark("p_ts", "0 seconds")
        )
        c = (
            spark.readStream.schema("cid int, cuser int, ts_s long").parquet(csrc)
            .withColumn("c_ts", F.timestamp_seconds("ts_s")).drop("ts_s")
            .withWatermark("c_ts", "0 seconds")
        )
        j = p.join(
            c,
            (F.col("user") == F.col("cuser"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "leftOuter",
        )
        q = (
            j.writeStream.foreachBatch(lambda df, _b: seen.extend(df.collect()))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: matched purchase (1,@1000 w/ click @700) and an
    # unmatched one (2,@1000, click @100 outside the 10-min window)
    spark.createDataFrame(
        [(1, 7, 1000), (2, 8, 1000)], "pid int, user int, ts_s long"
    ).write.parquet(psrc)
    spark.createDataFrame(
        [(10, 7, 700), (11, 8, 100)], "cid int, cuser int, ts_s long"
    ).write.parquet(csrc)
    run()
    matched = {(r.pid, r.cid) for r in seen}
    assert (1, 10) in matched
    # the unmatched purchase must NOT have emitted yet: its join
    # window is still open at watermark == max event time (1000)
    assert (2, None) not in matched

    # batch 2: far-future events on BOTH streams (the global watermark
    # is the MIN across inputs — a stalled side pins it) push the
    # watermark past purchase 2's window. The watermark a batch USES
    # is the one computed at the END of the previous batch, so the
    # eviction lands in batch 3, not batch 2.
    spark.createDataFrame(
        [(99, 9, 50_000)], "cid int, cuser int, ts_s long"
    ).write.mode("append").parquet(csrc)
    spark.createDataFrame(
        [(3, 9, 50_000)], "pid int, user int, ts_s long"
    ).write.mode("append").parquet(psrc)
    run()
    spark.createDataFrame(
        [(100, 9, 50_001)], "cid int, cuser int, ts_s long"
    ).write.mode("append").parquet(csrc)
    spark.createDataFrame(
        [(4, 9, 50_001)], "pid int, user int, ts_s long"
    ).write.mode("append").parquet(psrc)
    run()
    assert (2, None) in {(r.pid, r.cid) for r in seen}


def test_custom_sessionize_emits_on_timeout(spark, tmp_path):
    """GroupStateTimeout.EventTimeTimeout end-to-end: a user's open
    session emits exactly when the watermark passes last-event + gap
    (state TTL = the unbounded-key-domain guard), and an intra-batch
    gap closes a session without waiting for the timeout."""
    from heroku_kafka_connect_spark.streaming.stateful import sessionize

    src, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    seen = []

    def run():
        stream = (
            spark.readStream.schema("user int, ts_s long").parquet(src)
            .withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")
        )
        out = sessionize(stream, gap_ms=60_000, key_col="user", ts_col="ts")
        q = (
            out.writeStream.foreachBatch(lambda df, _b: seen.extend(df.collect()))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: user 1 has two sessions separated by an intra-batch
    # gap (> 60s): the first closes immediately, the second stays
    # open in state
    spark.createDataFrame(
        [(1, 100), (1, 130), (1, 400), (1, 420)], "user int, ts_s long"
    ).write.parquet(src)
    run()
    got = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events) for r in seen}
    assert (1, 100_000_000, 130_000_000, 2) in got  # intra-batch close
    assert len(got) == 1  # the 400-420 session is still open

    # batch 2: another user's far-future event pushes the watermark
    # past 420s + 60s -> user 1's open session times out and emits
    spark.createDataFrame([(2, 10_000)], "user int, ts_s long").write.mode(
        "append"
    ).parquet(src)
    run()
    # the timeout fires in the batch AFTER the watermark advances
    spark.createDataFrame([(2, 10_001)], "user int, ts_s long").write.mode(
        "append"
    ).parquet(src)
    run()
    got = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events) for r in seen}
    assert (1, 400_000_000, 420_000_000, 2) in got  # TTL-evicted session


def test_tws_running_totals_matches_v1(spark, tmp_path):
    """The v2 arbitrary-state API (transformWithStateInPandas, typed
    ValueState) must produce the same cumulative totals across
    micro-batch runs as the v1 applyInPandasWithState path — same
    semantics, new engine surface. Requires protobuf (the v2 state
    protocol is proto-serialized driver<->worker); environment-gated
    exactly like the spark-avro jar."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf (not in this sandbox)",
    )
    from heroku_kafka_connect_spark.streaming.stateful import running_totals_tws

    src, cp = str(tmp_path / "src"), str(tmp_path / "cp")

    def run():
        captured = []
        stream = (
            spark.readStream.schema("user_id bigint, ts_s long, value double")
            .parquet(src)
            .withColumn("ts", F.timestamp_seconds("ts_s"))
        )
        q = (
            running_totals_tws(stream)
            .writeStream.foreachBatch(lambda df, _bid: captured.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.user_id: r for r in captured}

    spark.createDataFrame(
        [(1, 100, 1.25), (1, 200, 2.25), (2, 50, 5.0)],
        "user_id bigint, ts_s long, value double",
    ).write.parquet(src)
    got1 = run()
    assert got1[1].n_events == 2 and got1[1].sum_value == 3.5
    assert got1[1].last_ts_us == 200_000_000 and got1[2].n_events == 1

    spark.createDataFrame(
        [(1, 300, 0.50)], "user_id bigint, ts_s long, value double"
    ).write.mode("append").parquet(src)
    got2 = run()
    assert got2[1].n_events == 3 and got2[1].sum_value == 4.0  # state resumed


def test_custom_sessionize_late_event_cannot_move_session_backwards(spark, tmp_path):
    """A LATE event (admitted by the watermark in a later batch,
    earlier than the open session's last event) must clamp into the
    session — never drag session_end backwards (which emitted
    end < start and split continuous sessions)."""
    from heroku_kafka_connect_spark.streaming.stateful import sessionize

    src, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    seen = []

    def run():
        stream = (
            spark.readStream.schema("user int, ts_s long").parquet(src)
            .withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")
        )
        out = sessionize(
            stream, gap_ms=600_000, key_col="user", ts_col="ts",
            watermark="10 minutes",
        )
        q = (
            out.writeStream.foreachBatch(lambda df, _b: seen.extend(df.collect()))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(1, 1000)], "user int, ts_s long").write.parquet(src)
    run()
    # late event at 700s: within the 10-min watermark AND the 10-min
    # gap of the open session -> merges, session stays [700, 1000]
    spark.createDataFrame([(1, 700)], "user int, ts_s long").write.mode(
        "append"
    ).parquet(src)
    run()
    # push the watermark far ahead on both streams of the key space,
    # then once more so the timeout batch fires
    for t in (100_000, 100_001):
        spark.createDataFrame([(2, t)], "user int, ts_s long").write.mode(
            "append"
        ).parquet(src)
        run()
    sessions = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events) for r in seen
    }
    assert (1, 700_000_000, 1_000_000_000, 2) in sessions
    assert all(s[1] <= s[2] for s in sessions)  # no inverted session anywhere


def test_custom_sessionize_very_late_event_forms_own_session(spark, tmp_path):
    """A late event EARLIER than session_start - gap (admissible when
    the watermark delay exceeds the gap) must become its own separate
    session — not silently extend the open session's start backwards,
    which made output depend on micro-batch boundaries (the same two
    events in ONE batch are split by the gap check)."""
    from heroku_kafka_connect_spark.streaming.stateful import sessionize

    src, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    seen = []

    def run():
        stream = (
            spark.readStream.schema("user int, ts_s long").parquet(src)
            .withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")
        )
        out = sessionize(
            stream, gap_ms=600_000, key_col="user", ts_col="ts",
            watermark="30 minutes",
        )
        q = (
            out.writeStream.foreachBatch(lambda df, _b: seen.extend(df.collect()))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(1, 2000)], "user int, ts_s long").write.parquet(src)
    run()
    # 500s < 2000s - 600s gap, but within the 30-min watermark delay:
    # admitted, and must close as its own (500, 500, 1) session
    spark.createDataFrame([(1, 500)], "user int, ts_s long").write.mode(
        "append"
    ).parquet(src)
    run()
    # advance the watermark so the open [2000, 2000] session times out
    for t in (100_000, 100_001):
        spark.createDataFrame([(2, t)], "user int, ts_s long").write.mode(
            "append"
        ).parquet(src)
        run()
    sessions = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events) for r in seen
    }
    assert (1, 500_000_000, 500_000_000, 1) in sessions
    assert (1, 2_000_000_000, 2_000_000_000, 1) in sessions
