"""Micro-batch streaming runner — file source → memory sink.

Gives tests and the corpus a way to run REAL Structured Streaming
queries (checkpointed, watermarked, Trigger.AvailableNow) against the
parquet fixtures without brokers. The checkpoint is the engine analog
of Connect's offset-storage topic (reference main.sh:63): restart the
same (source, checkpoint) pair and the stream resumes exactly where
it stopped — exercised by tests/test_streaming.py::test_resume.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events fixture as a file source, with the same ts
    normalization as session.Tables (ns-as-long → µs instant, or
    µs NTZ → instant; fixture generations differ)."""
    from ..session import configure

    configure(spark)
    # the file streaming source requires a directory; expose the single
    # fixture file through a symlinked temp dir (no data copy)
    src = os.path.join(sf_dir, "events.parquet")
    # stream_resume's SQL oracle (and the one-micro-batch arrival the
    # watermark-append queries document) assumes the fixture is ONE
    # file: a single AvailableNow batch at watermark 0, then the
    # no-data flush. A multi-file fixture would let windows finalize
    # mid-stream and genuinely-late rows be dropped — Spark would then
    # diverge from the oracle confusingly. Fail loudly instead.
    if not os.path.isfile(src):
        raise ValueError(
            f"events fixture at {src} is not a single parquet file — "
            "the watermark-append oracles (stream_resume) assume "
            "one-file/one-micro-batch arrival; re-derive them for a "
            "multi-file fixture before streaming it"
        )
    # Stable digest, not hash(): Python string hashing is salted per
    # process, which would mint a fresh tmp dir every run (and could
    # collide across different sf_dirs within one).
    digest = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"hkc-stream-src-{digest}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if os.path.islink(link) and os.readlink(link) != src:
        os.remove(link)  # stale link from a colliding/moved fixture
    if not os.path.exists(link):
        os.symlink(src, link)
    # The file source needs an explicit schema; take it from the batch
    # reader's footer inference so either fixture generation works
    # (streams can't infer, but the batch path already resolves the
    # nanosAsLong vs TIMESTAMP_NTZ question for us).
    from pyspark.sql.types import LongType

    batch_schema = spark.read.parquet(src).schema
    raw = spark.readStream.schema(batch_schema).format("parquet").load(stage)
    if isinstance(batch_schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


#: state-store partition count for fixture-scale streams. Streaming
#: aggregations key their state store to spark.sql.shuffle.partitions
#: AT FIRST RUN (the count is then fixed in the checkpoint forever) and
#: pay per-partition store init each micro-batch — 32 empty HDFS-backed
#: stores was pure overhead on KB-scale fixtures. At 100 TB this knob
#: is sized to cluster cores BEFORE the first run instead.
STREAM_SHUFFLE_PARTITIONS = 8


def run_available_now(
    stream_df: DataFrame,
    *,
    query_name: str | None = None,
    checkpoint: str | None = None,
    output_mode: str = "append",
    shuffle_partitions: int | None = STREAM_SHUFFLE_PARTITIONS,
) -> DataFrame:
    """Run the streaming DataFrame to completion (AvailableNow) into a
    memory sink; return the sink table as a DataFrame.

    ``shuffle_partitions`` pins the session's shuffle-partition conf
    for the duration of the run (restored after) — the value is baked
    into new checkpoints, so keep it stable across resumes of the same
    checkpoint (None = leave the session conf alone)."""
    name = query_name or f"q_{uuid.uuid4().hex[:8]}"
    cp = checkpoint or os.path.join(tempfile.mkdtemp(prefix="hkc-ckpt-"), "cp")
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
