"""Custom Python DataSource (sources/synthetic.py): batch generator
determinism/partitioning and the streaming variant's bounded,
exactly-once micro-batch delivery."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from heroku_kafka_connect_spark.sources import synthetic


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    assert synthetic.register_synthetic_sources(spark)


def test_batch_rows_and_schema(spark):
    df = (
        spark.read.format("hkc_synthdocs")
        .option("rows", 300)
        .option("partitions", 7)
        .load()
    )
    assert df.count() == 300
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>"
    )
    # ids are exactly 0..N-1, once each (no partition overlap/gap)
    assert df.agg(
        F.count_distinct("doc_id"), F.min("doc_id"), F.max("doc_id")
    ).first() == (300, 0, 299)


def test_batch_partition_count_does_not_change_content(spark):
    a = (
        spark.read.format("hkc_synthdocs")
        .option("rows", 100)
        .option("partitions", 1)
        .load()
    )
    b = (
        spark.read.format("hkc_synthdocs")
        .option("rows", 100)
        .option("partitions", 13)
        .load()
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_batch_rows_match_pure_python(spark):
    got = {
        r.doc_id: (r.text, r.lang, r.source, r.n_chars)
        for r in spark.read.format("hkc_synthdocs").option("rows", 20).load().collect()
    }
    for i in range(20):
        _, text, lang, source, n_chars = synthetic.doc_row(i)
        assert got[i] == (text, lang, source, n_chars)


def _drain(spark, cp, seen, rows, rows_per_batch):
    """availableNow over a SimpleDataSourceStreamReader delivers the
    one batch prefetched at planning time; drain by re-running until
    an idle run. Returns the number of non-idle runs."""
    runs = 0
    while True:
        before = len(seen)
        q = (
            spark.readStream.format("hkc_synthevents")
            .option("rows", rows)
            .option("rows_per_batch", rows_per_batch)
            .load()
            .writeStream.foreachBatch(lambda df, _b: seen.extend(df.collect()))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if len(seen) == before:
            return runs
        runs += 1


def test_stream_delivers_all_rows_exactly_once(spark, tmp_path):
    """Bounded stream drains to exactly-once totality, one
    rows_per_batch slice per availableNow run."""
    seen: list = []
    runs = _drain(spark, str(tmp_path / "cp"), seen, rows=250, rows_per_batch=100)
    ids = [r.event_id for r in seen]
    assert sorted(ids) == list(range(250))
    assert len(ids) == len(set(ids))
    assert runs == 3  # 100 + 100 + 50: the batch bound is honored
    # rows are the deterministic event_row function of their id
    by_id = {r.event_id: (r.user_id, r.event_type, r.value) for r in seen}
    for i in (0, 99, 249):
        _, user_id, etype, value = synthetic.event_row(i)
        assert by_id[i] == (user_id, etype, value)


def test_stream_resume_from_checkpoint_no_dup(spark, tmp_path):
    """Restarting against the same checkpoint continues from the
    stored offset instead of replaying delivered rows — the custom
    source honors Structured Streaming's recovery contract."""
    cp = str(tmp_path / "cp")
    seen: list = []
    _drain(spark, cp, seen, rows=80, rows_per_batch=40)
    assert sorted(r.event_id for r in seen) == list(range(80))
    # "more data arrives": same source, higher bound, same checkpoint —
    # the restart resumes from the stored offset, no replay of 0..79
    _drain(spark, cp, seen, rows=120, rows_per_batch=40)
    ids = sorted(r.event_id for r in seen)
    assert ids == list(range(120)) and len(ids) == len(set(ids))
