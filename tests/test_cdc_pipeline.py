"""End-to-end CDC sink pipeline (B2-B4 + F1/F2): a checkpointed
stream of change records applied onto a durable table via
foreachBatch upsert — the engine analog of the Debezium JDBC sink
(reference Dockerfile:28-31): last-write-per-PK wins, tombstones
delete, restarts resume from the checkpoint without re-applying."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from heroku_kafka_connect_spark.sinks import writers

SCHEMA = "pk int, ts int, payload string, tomb boolean"


def _apply_run(spark, src, cp, tbl, version):
    """One availableNow run: merge each micro-batch into the table.
    State is written to a versioned dir (a real JDBC target MERGEs in
    place; parquet needs copy-on-write) — `current` tracks the live
    version like a manifest."""

    def merge(batch_df, batch_id):
        existing = None
        cur = os.path.join(tbl, "current")
        if os.path.exists(cur):
            with open(cur) as f:
                existing = spark.read.parquet(f.read().strip())
        merged = writers.upsert_batch(existing, batch_df, ["pk"], [F.col("ts").desc()])
        out = os.path.join(tbl, f"v{version}_{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        with open(cur, "w") as f:
            f.write(out)

    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    with open(os.path.join(tbl, "current")) as f:
        return spark.read.parquet(f.read().strip())


def test_cdc_upsert_tombstone_resume(spark, tmp_path):
    src, cp, tbl = str(tmp_path / "src"), str(tmp_path / "cp"), str(tmp_path / "tbl")
    os.makedirs(tbl)

    spark.createDataFrame(
        [(1, 10, "v1", False), (2, 10, "w1", False), (3, 10, "x1", False)], SCHEMA
    ).write.parquet(src)
    state1 = _apply_run(spark, src, cp, tbl, 1)
    live1 = {r.pk: r.payload for r in state1.filter(~F.col("tomb")).collect()}
    assert live1 == {1: "v1", 2: "w1", 3: "x1"}

    # update pk1, tombstone pk2, insert pk4 — resumed run must apply
    # ONLY these (checkpoint prevents re-reading batch 1)
    spark.createDataFrame(
        [(1, 20, "v2", False), (2, 20, None, True), (4, 20, "y1", False)], SCHEMA
    ).write.mode("append").parquet(src)
    state2 = _apply_run(spark, src, cp, tbl, 2)
    live2 = {r.pk: r.payload for r in state2.filter(~F.col("tomb")).collect()}
    assert live2 == {1: "v2", 3: "x1", 4: "y1"}  # pk2 deleted, pk1 updated
    # the tombstone marker is retained until compaction (Kafka-compaction
    # semantics); the LIVE view above is what a JDBC DELETE would show
    assert state2.filter(F.col("pk") == 2).count() == 1

    # an out-of-order late event for pk1 (older ts) must NOT win
    spark.createDataFrame([(1, 15, "stale", False)], SCHEMA).write.mode("append").parquet(src)
    state3 = _apply_run(spark, src, cp, tbl, 3)
    assert {r.pk: r.payload for r in state3.filter(F.col("pk") == 1).collect()} == {1: "v2"}
