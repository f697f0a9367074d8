"""Live-broker Kafka integration (VERDICT r3 item 5) — the one path
the sandbox cannot exercise (§2.A6/B6: option builder, envelope, and
checkpoint-resume are unit-tested; the TRANSPORT is not).

Opt-in via env: set SPARK_GRAFT_KAFKA_BOOTSTRAP to a reachable broker
(plaintext; for SSL also set SPARK_GRAFT_KAFKA_SSL=1 and the PEM env
vars) and ship the spark-sql-kafka package (e.g.
SPARK_GRAFT_KAFKA_PACKAGE=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>
before the session is built). Skipped — not failed — otherwise.

Covers the reference deployment's first end-to-end motion
(main.sh:38-58): produce → streaming read → checkpoint resume →
produce back to a second topic.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.kafka


@pytest.mark.skipif(
    not BOOTSTRAP, reason="no live broker (set SPARK_GRAFT_KAFKA_BOOTSTRAP)"
)
def test_kafka_produce_consume_resume_produce_back(spark, tmp_path):
    from heroku_kafka_connect_spark.sources.kafka import kafka_options, read_stream

    opts = kafka_options(BOOTSTRAP, ssl=bool(os.environ.get("SPARK_GRAFT_KAFKA_SSL")))
    topic_in = f"hkcs_it_{uuid.uuid4().hex[:8]}"
    topic_out = f"{topic_in}_out"
    cp = str(tmp_path / "cp")
    got: list = []

    def produce(rows):
        (
            spark.createDataFrame(rows, "key string, value string")
            .select(F.col("key").cast("binary"), F.col("value").cast("binary"))
            .write.format("kafka")
            .options(**opts)
            .option("topic", topic_in)
            .save()
        )

    def consume_once():
        stream = read_stream(spark, topic_in, opts)
        q = (
            stream.selectExpr(
                "CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v"
            )
            .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    produce([("a", "1"), ("b", "2")])
    consume_once()
    assert {(r.k, r.v) for r in got} == {("a", "1"), ("b", "2")}

    # checkpoint resume: only the NEW record arrives in run 2
    produce([("c", "3")])
    n_before = len(got)
    consume_once()
    assert {(r.k, r.v) for r in got[n_before:]} == {("c", "3")}

    # produce back (B6): batch-write the consumed set to a second topic
    # and read it back whole
    (
        spark.createDataFrame([(r.k, r.v) for r in got], "key string, value string")
        .select(F.col("key").cast("binary"), F.col("value").cast("binary"))
        .write.format("kafka")
        .options(**opts)
        .option("topic", topic_out)
        .save()
    )
    back = (
        spark.read.format("kafka")
        .options(**opts)
        .option("subscribe", topic_out)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v")
    )
    assert {(r.k, r.v) for r in back.collect()} == {
        ("a", "1"),
        ("b", "2"),
        ("c", "3"),
    }
