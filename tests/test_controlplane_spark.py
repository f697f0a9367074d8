"""End-to-end declarative pipeline: spec JSON → compiled streaming
query → reconcile against the live SparkSession (§3.2)."""

from __future__ import annotations

import json
import time

from heroku_kafka_connect_spark.controlplane import PipelineSpec, Reconciler, SparkRuntime


def _wait_done(spark, name: str, timeout_s: float = 60.0) -> None:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if not any(q.name == name for q in spark.streams.active):
            return
        time.sleep(0.2)
    raise TimeoutError(name)


def test_spec_compiles_and_runs_pipeline(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 5.0)],
        "id int, name string, amount double",
    ).write.parquet(src)

    spec = PipelineSpec(
        name="p1",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "id int, name string, amount double",
            "transforms": "big,tag",
            "transforms.big.type": "filter",
            "transforms.big.predicate": "amount >= 10.0",
            "transforms.tag.type": "insertField",
            "transforms.tag.name": "pipeline",
            "transforms.tag.value": "'p1'",
            "sink.format": "memory",
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rep = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep.started == ["p1"] and not rep.failed
    _wait_done(spark, "p1")
    out = spark.table("p1").collect()
    assert sorted(r.id for r in out) == [1, 2]
    assert all(r.pipeline == "p1" for r in out)


def test_stop_missing_query_is_success(spark, tmp_path):
    """DELETE on an already-gone query is success, not an error to
    retry (the reference treats 404 the same way, main.sh:130-141) —
    stop() must return immediately and drop the stale fingerprint."""
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rt._fingerprints["ghost"] = "deadbeef"
    rt.stop("ghost")  # must not raise
    assert "ghost" not in rt._fingerprints


def test_reconcile_prunes_spark_query(spark, tmp_path):
    src = str(tmp_path / "in2")
    spark.range(5).write.parquet(src)
    spec = PipelineSpec(
        name="p2",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "id bigint",
            "sink.format": "memory",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp2"))
    r = Reconciler(rt, sleep=lambda _s: None)
    r.reconcile_once([spec])
    assert "p2" in rt.list_running()
    rep = r.reconcile_once([])  # desired set now empty → prune
    assert rep.pruned == ["p2"]
    assert "p2" not in rt.list_running()


def test_spec_fingerprint_change_restarts(spark, tmp_path):
    src = str(tmp_path / "in3")
    spark.range(3).write.parquet(src)

    def mk(predicate: str) -> PipelineSpec:
        return PipelineSpec(
            name="p3",
            config={
                "source.format": "parquet",
                "source.path": src,
                "source.schema": "id bigint",
                "transforms": "f",
                "transforms.f.type": "filter",
                "transforms.f.predicate": predicate,
                "sink.format": "memory",
            },
        )

    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp3"))
    r = Reconciler(rt, sleep=lambda _s: None)
    r.reconcile_once([mk("id > 0")])
    rep = r.reconcile_once([mk("id > 1")])
    assert rep.restarted == ["p3"]
    r.reconcile_once([])  # cleanup


def test_spec_json_shape_matches_reference_config():
    """The spec is a flat JSON map exactly like CONNECTOR_${name}."""
    raw = json.dumps({"source.format": "kafka", "sink.format": "parquet", "sink.path": "/x"})
    spec = PipelineSpec("k1", json.loads(raw))
    spec.validate()
    assert spec.fingerprint() == PipelineSpec("k1", json.loads(raw)).fingerprint()


def test_transform_chain_full_smt_coverage(spark):
    """Every compiler-dispatchable SMT type in one declared chain,
    applied to a batch frame (the chain is source-agnostic)."""
    from pyspark.sql import functions as F

    from heroku_kafka_connect_spark.controlplane import apply_transform_chain

    df = spark.createDataFrame(
        [(1, "u1", 5.5, "2024-03-01 10:00:00", "t-a")],
        "id int, user string, amount double, ts_s string, route string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    cfg = {
        "transforms": "h,fl,conv,rt,mask,key",
        "transforms.h.type": "hoistField",
        "transforms.h.fields": '["user", "amount"]',
        "transforms.h.name": "payload",
        "transforms.fl.type": "flatten",
        "transforms.fl.field": "payload",
        "transforms.conv.type": "timestampConverter",
        "transforms.conv.field": "ts",
        "transforms.conv.target": "unix_micros",
        "transforms.rt.type": "regexRouter",
        "transforms.rt.field": "route",
        "transforms.rt.pattern": "^t-",
        "transforms.rt.replacement": "topic-",
        "transforms.mask.type": "maskField",
        "transforms.mask.field": "payload_user",
        "transforms.key.type": "valueToKey",
        "transforms.key.fields": '["id"]',
    }
    out = apply_transform_chain(df, cfg)
    row = out.first()
    assert row.payload_amount == 5.5
    assert row.payload_user is None  # masked
    assert row.ts == 1709287200000000  # 2024-03-01T10:00Z in micros
    assert row.route == "topic-a"
    assert row.key.id == 1


def test_continuous_source_compiles_and_streams(spark, tmp_path):
    """A genuinely unbounded source (rate) through the declarative
    compiler: the pipeline must come up as a live StreamingQuery and
    produce rows — the no-brokers stand-in for the Kafka source path
    (same reader surface, different format string)."""
    spec = PipelineSpec(
        name="p_rate",
        config={
            "source.format": "rate",
            "source.option.rowsPerSecond": "50",
            "transforms": "tag",
            "transforms.tag.type": "insertField",
            "transforms.tag.name": "src",
            "transforms.tag.value": "'rate'",
            "sink.format": "memory",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rep = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep.started == ["p_rate"] and not rep.failed
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.table("p_rate").count()
            if n > 0:
                break
            time.sleep(0.3)
        assert n > 0
        assert spark.table("p_rate").first().src == "rate"
    finally:
        Reconciler(rt, sleep=lambda _s: None).reconcile_once([])  # prune
    assert not any(q.name == "p_rate" for q in spark.streams.active)


def test_transform_chain_header_smts(spark):
    from heroku_kafka_connect_spark.controlplane import apply_transform_chain

    df = spark.createDataFrame([(1, "x")], "id int, src string")
    cfg = {
        "transforms": "ih,hf,dh",
        "transforms.ih.type": "insertHeader",
        "transforms.ih.header": "pipeline",
        "transforms.ih.value": "'p9'",
        "transforms.hf.type": "headerFrom",
        "transforms.hf.field": "src",
        "transforms.hf.header": "origin",
        "transforms.dh.type": "dropHeaders",
        "transforms.dh.headers": '["pipeline"]',
    }
    out = apply_transform_chain(df, cfg)
    headers = out.first().headers
    assert headers == {"origin": "x"}  # inserted then dropped; copied stays


def test_declared_pipeline_with_header_smts_end_to_end(spark, tmp_path):
    """Every header SMT (D14) reachable from a DECLARED pipeline: a
    full spec (source → insertHeader/headerFrom/dropHeaders chain →
    parquet sink) driven through the Reconciler, not just the chain
    helper — the Connect `transforms=` config surface."""
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame([(1, "alpha"), (2, "beta")], "id int, src string").write.parquet(src)

    spec = PipelineSpec(
        name="p_headers",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "id int, src string",
            "transforms": "ih,hf,dh",
            "transforms.ih.type": "insertHeader",
            "transforms.ih.header": "pipeline",
            "transforms.ih.value": "'p_headers'",
            "transforms.hf.type": "headerFrom",
            "transforms.hf.field": "src",
            "transforms.hf.header": "origin",
            "transforms.dh.type": "dropHeaders",
            "transforms.dh.headers": '["pipeline"]',
            "sink.format": "parquet",
            "sink.path": out,
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rep = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep.started == ["p_headers"] and not rep.failed
    _wait_done(spark, "p_headers")
    got = {r.id: dict(r.headers) for r in spark.read.parquet(out).collect()}
    assert got == {1: {"origin": "alpha"}, 2: {"origin": "beta"}}


def test_declared_upsert_pipeline_end_to_end(spark, tmp_path):
    """The migration target shape (MIGRATION.md): a declared pipeline
    with sink.format=parquet-upsert — change records stream in, the
    table materializes latest-per-key, and a second reconcile run
    (same checkpoint) applies only new batches."""
    import os

    src, tbl = str(tmp_path / "in"), str(tmp_path / "tbl")
    os.makedirs(tbl)
    spark.createDataFrame(
        [(1, 10, "v1"), (2, 10, "w1")], "id int, ts int, payload string"
    ).write.parquet(src)

    spec = PipelineSpec(
        name="p_upsert",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "id int, ts int, payload string",
            "sink.format": "parquet-upsert",
            "sink.path": tbl,
            "sink.option.keys": "id",
            "sink.option.orderBy": "ts",
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))

    def state():
        with open(os.path.join(tbl, "_current")) as f:
            return {r.id: r.payload for r in spark.read.parquet(f.read().strip()).collect()}

    rep = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep.started == ["p_upsert"] and not rep.failed
    _wait_done(spark, "p_upsert")
    assert state() == {1: "v1", 2: "w1"}

    # update id=1 + insert id=3; restart the SAME spec (unchanged
    # fingerprint would be a no-op, so bump a cosmetic option? no —
    # the query finished; reconcile sees it gone and restarts it)
    spark.createDataFrame([(1, 20, "v2"), (3, 20, "x1")], "id int, ts int, payload string")\
        .write.mode("append").parquet(src)
    rep2 = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep2.started == ["p_upsert"]  # availableNow query had terminated
    _wait_done(spark, "p_upsert")
    assert state() == {1: "v2", 2: "w1", 3: "x1"}


def test_declared_dlq_pipeline_splits_corrupt_records(spark, tmp_path):
    """errors.tolerance=all as a declared pipeline: valid payloads land
    in the main sink, corrupt ones in the DLQ sink — neither poisons
    the stream (the Connect DLQ-topic analog)."""
    import os

    src = str(tmp_path / "in")
    good, dlq = str(tmp_path / "good"), str(tmp_path / "dlq")
    spark.createDataFrame(
        [(1, '{"k": 1}'), (2, "{broken"), (3, '{"k": 3}'), (4, None)],
        "id int, payload string",
    ).write.parquet(src)

    spec = PipelineSpec(
        name="p_dlq",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "id int, payload string",
            "sink.format": "dlq-split",
            "sink.path": good,
            "sink.dlqPath": dlq,
            "sink.option.jsonColumn": "payload",
            "sink.option.schema": "k int",
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rep = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep.started == ["p_dlq"] and not rep.failed
    _wait_done(spark, "p_dlq")
    ok = {r.id for r in spark.read.parquet(good).collect()}
    bad = {r.id: r["__error"] for r in spark.read.parquet(dlq).collect()}
    assert ok == {1, 3}
    assert set(bad) == {2, 4} and all(v == "json-parse-failed" for v in bad.values())


def test_dlq_reader_dedups_replayed_batch(spark, tmp_path):
    """Effective exactly-once through the DLQ sink: the writer is two
    at-least-once parquet appends, so a batch replayed after partial
    failure re-appends its rows under the SAME __batch_id (the epoch
    is checkpointed before the sink runs). read_dlq_exactly_once must
    collapse the replay on (__batch_id, key) while keeping identical
    payloads that arrive in genuinely different batches."""
    from heroku_kafka_connect_spark.controlplane import read_dlq_exactly_once

    path = str(tmp_path / "valid")
    batch = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], "id int, payload string, __batch_id long"
    )
    batch.write.mode("append").parquet(path)
    batch.write.mode("append").parquet(path)  # the replay
    # same natural key re-emitted later in a DIFFERENT batch: kept
    spark.createDataFrame(
        [(1, "a", 1)], "id int, payload string, __batch_id long"
    ).write.mode("append").parquet(path)

    raw = spark.read.parquet(path)
    assert raw.count() == 5  # duplicates really are on disk
    got = [
        (r.id, r.payload, r["__batch_id"])
        for r in read_dlq_exactly_once(spark, path, ["id"]).collect()
    ]
    assert sorted(got) == [(1, "a", 0), (1, "a", 1), (2, "b", 0)]


def test_declared_avro_converter_pipeline(spark, tmp_path):
    """value.converter=avro in a declared pipeline: wire-format binary
    records (mixed writer schema versions) decode by registry id
    before the SMT chain runs — the Connect converter-then-transforms
    order (main.sh:72-75)."""
    import json as _json

    from heroku_kafka_connect_spark.serde import avro_codec, avro_wire
    from heroku_kafka_connect_spark.serde.schema_registry import SchemaRegistry

    v1 = {"type": "record", "name": "e", "fields": [{"name": "id", "type": "long"}]}
    v2 = {
        "type": "record",
        "name": "e",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "tag", "type": "string", "default": "old"},
        ],
    }
    reg = SchemaRegistry()
    id1, id2 = reg.register("e", v1), reg.register("e", v2)

    def wire(rec, schema, sid):
        body = avro_codec.encode_record(rec, schema)
        return b"\x00" + sid.to_bytes(4, "big") + body

    rows = [
        (1, wire({"id": 1}, v1, id1)),
        (2, wire({"id": 2, "tag": "new"}, v2, id2)),
        (3, wire({"id": 3}, v1, id1)),
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "k int, value binary").write.parquet(src)

    spec = PipelineSpec(
        name="p_avro",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "k int, value binary",
            "value.converter": "avro",
            "value.converter.schemas": _json.dumps({id1: v1, id2: v2}),
            "value.converter.reader": _json.dumps(v2),
            "transforms": "big",
            "transforms.big.type": "filter",
            "transforms.big.predicate": "id >= 2",
            "sink.format": "memory",
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rep = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep.started == ["p_avro"] and not rep.failed
    _wait_done(spark, "p_avro")
    got = {(r.id, r.tag) for r in spark.table("p_avro").collect()}
    assert got == {(2, "new"), (3, "old")}  # v1 record took the reader default


def test_declared_key_and_value_converters(spark, tmp_path):
    """key.converter + value.converter together: the key decodes into
    a `key` struct (envelope shape preserved), the value's fields
    flatten to the top level — Connect's independent key/value
    converter model."""
    import json as _json

    spec_cfg_rows = [
        (b'{"uid": 7}', '{"amount": 1.5}'),
        (b'{"uid": 8}', '{"amount": 2.5}'),
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(spec_cfg_rows, "key binary, value string").write.parquet(src)
    spec = PipelineSpec(
        name="p_kv",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "key binary, value string",
            "key.converter": "json",
            "key.converter.schema": "uid bigint",
            "value.converter": "json",
            "value.converter.schema": "amount double",
            "sink.format": "memory",
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rep = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep.started == ["p_kv"] and not rep.failed
    _wait_done(spark, "p_kv")
    got = {(r.key.uid, r.amount) for r in spark.table("p_kv").collect()}
    assert got == {(7, 1.5), (8, 2.5)}


def test_boot_end_to_end(spark, tmp_path):
    """The whole main.sh sequence in one call: env validation →
    specs-from-env → status REST up → async reconcile. The pipeline
    declared in the env comes up; the status endpoint reports it."""
    import json as _json
    import urllib.request

    from heroku_kafka_connect_spark.controlplane import boot

    src = str(tmp_path / "in")
    spark.range(4).write.parquet(src)
    env = {
        "CONNECTOR_NAMES": "pboot",
        "CONNECTOR_PBOOT": _json.dumps(
            {
                "source.format": "parquet",
                "source.path": src,
                "source.schema": "id bigint",
                "sink.format": "memory",
                "trigger": "availableNow",
            }
        ),
    }
    runtime, server, thread = boot(
        spark, checkpoint_root=str(tmp_path / "cp"), env=env, require_kafka_env=False
    )
    try:
        thread.join(timeout=60)
        assert not thread.is_alive()
        _wait_done(spark, "pboot")
        assert spark.table("pboot").count() == 4
        listed = _json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{server.port}/connectors").read()
        )
        # availableNow query may have already finished (and been pruned
        # from the fingerprint map) — the endpoint must answer either way
        assert listed in ([], ["pboot"])
    finally:
        server.shutdown()
        Reconciler(runtime, sleep=lambda _s: None).reconcile_once([])


def test_boot_fail_fast_missing_env(spark, tmp_path):
    from heroku_kafka_connect_spark.controlplane import SpecError, boot

    try:
        boot(spark, checkpoint_root=str(tmp_path / "cp"), env={})
        raise AssertionError("expected SpecError")
    except SpecError as e:
        assert "KAFKA_URL" in str(e)


def test_converter_value_field_shadows_envelope_column(spark, tmp_path):
    """A value field named like an envelope column (`timestamp`) must
    not produce duplicate columns — the decoded record wins, as in
    Connect where the converted value replaces the raw one."""
    from heroku_kafka_connect_spark.controlplane import apply_converter

    df = spark.createDataFrame(
        [(1, 111, '{"timestamp": 999, "x": "a"}')], "k int, timestamp long, value string"
    )
    out = apply_converter(
        df,
        {"value.converter": "json", "value.converter.schema": "timestamp bigint, x string"},
    )
    assert out.columns.count("timestamp") == 1
    row = out.first()
    assert row.timestamp == 999 and row.x == "a" and row.k == 1


def test_dlq_reader_keeps_distinct_same_key_rows_within_batch(spark, tmp_path):
    """The writer stamps __row_n (row_number over a total order of the
    batch's columns — identical on replay), so two DIFFERENT records
    sharing a natural key inside one micro-batch both survive the
    exactly-once read, while a replayed append still collapses."""
    from heroku_kafka_connect_spark.controlplane import read_dlq_exactly_once

    path = str(tmp_path / "valid")
    batch = spark.createDataFrame(
        [(1, "a", 0, 1), (1, "b", 0, 2)],  # same key, distinct payloads
        "id int, payload string, __batch_id long, __row_n int",
    )
    batch.write.mode("append").parquet(path)
    batch.write.mode("append").parquet(path)  # the replay
    got = sorted(
        (r.id, r.payload) for r in read_dlq_exactly_once(spark, path, ["id"]).collect()
    )
    assert got == [(1, "a"), (1, "b")]


def test_dlq_writer_stamps_row_n(spark, tmp_path):
    """The declared dlq-split pipeline's sink output carries the
    (__batch_id, __row_n) identity the exactly-once reader relies
    on."""
    import json as _json

    from heroku_kafka_connect_spark.controlplane import PipelineSpec, SparkRuntime

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, _json.dumps({"v": 1})), (2, "{not json")], "id int, body string"
    ).write.mode("overwrite").parquet(src)
    spec = PipelineSpec(
        name="dlqstamp",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "id int, body string",
            "sink.format": "dlq-split",
            "sink.option.jsonColumn": "body",
            "sink.option.schema": "v int",
            "sink.path": str(tmp_path / "good"),
            "sink.dlqPath": str(tmp_path / "bad"),
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rt.start(spec)
    _wait_done(spark, "dlqstamp")
    good = spark.read.parquet(str(tmp_path / "good"))
    bad = spark.read.parquet(str(tmp_path / "bad"))
    for df in (good, bad):
        assert "__batch_id" in df.columns and "__row_n" in df.columns
        assert df.filter(df["__row_n"].isNull()).count() == 0


def test_tasks_max_and_rebalance(spark, tmp_path):
    """F4: `tasks.max` caps the per-batch sink parallelism (every
    micro-batch writes through exactly N tasks). F5: scaling it is a
    rebalance — the knob participates in the spec fingerprint, so
    reconcile restarts the query with the new parallelism from the
    same checkpoint, without loss or duplication."""
    import glob

    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "id int, amount double"
    ).write.parquet(src)

    def spec(tasks: int) -> PipelineSpec:
        return PipelineSpec(
            name="ptm",
            config={
                "source.format": "parquet",
                "source.path": src,
                "source.schema": "id int, amount double",
                "tasks.max": str(tasks),
                "sink.format": "parquet",
                "sink.path": out,
                "trigger": "availableNow",
            },
        )

    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rec = Reconciler(rt, sleep=lambda _s: None)
    rep = rec.reconcile_once([spec(2)])
    assert rep.started == ["ptm"] and not rep.failed
    _wait_done(spark, "ptm")
    first_files = glob.glob(f"{out}/part-*")
    assert len(first_files) == 2  # one batch through exactly 2 tasks

    # rebalance: new tasks.max = new fingerprint -> restart; new data
    # lands through 4 tasks, old offsets are not replayed
    spark.createDataFrame(
        [(i, float(i)) for i in range(40, 80)], "id int, amount double"
    ).write.mode("append").parquet(src)
    rep2 = rec.reconcile_once([spec(4)])
    # the availableNow query already self-terminated, so reconcile
    # sees a fresh start (restart-on-fingerprint-change of a LIVE
    # query is pinned by test_spec_fingerprint_change_restarts)
    assert "ptm" in rep2.started + rep2.restarted and not rep2.failed
    _wait_done(spark, "ptm")
    new_files = sorted(set(glob.glob(f"{out}/part-*")) - set(first_files))
    assert len(new_files) == 4  # the rebalanced batch used 4 tasks
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(80))  # no loss, no dup across the restart


def test_tasks_max_invalid(spark, tmp_path):
    from heroku_kafka_connect_spark.controlplane import SpecError

    import pytest as _pytest

    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    bad = PipelineSpec(
        name="pbad",
        config={
            "source.format": "parquet",
            "source.path": str(tmp_path),
            "source.schema": "id int",
            "tasks.max": "0",
            "sink.format": "memory",
        },
    )
    with _pytest.raises(SpecError, match="tasks.max"):
        rt.compile(bad)


def test_dlq_pipeline_with_map_column_source(spark, tmp_path):
    """The stamp's row-identity sort must survive unorderable source
    columns: a map column is serialized to JSON for the sort key
    instead of crashing the ordering (Spark rejects maps in
    orderBy) or being skipped (which would weaken replay identity)."""
    src = str(tmp_path / "in")
    good, dlq = str(tmp_path / "good"), str(tmp_path / "dlq")
    spark.sql(
        """SELECT * FROM VALUES
           (1, '{"k": 1}', map('a', 'x')),
           (2, '{broken',  map('b', 'y'))
           AS t(id, payload, attrs)"""
    ).write.parquet(src)

    spec = PipelineSpec(
        name="p_dlq_map",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "id int, payload string, attrs map<string,string>",
            "sink.format": "dlq-split",
            "sink.path": good,
            "sink.dlqPath": dlq,
            "sink.option.jsonColumn": "payload",
            "sink.option.schema": "k int",
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rep = Reconciler(rt, sleep=lambda _s: None).reconcile_once([spec])
    assert rep.started == ["p_dlq_map"] and not rep.failed
    _wait_done(spark, "p_dlq_map")
    ok = spark.read.parquet(good).collect()
    bad = spark.read.parquet(dlq).collect()
    assert [r.id for r in ok] == [1] and [r.id for r in bad] == [2]
    assert all(r["__row_n"] == 1 for r in ok + bad)


def test_dlq_stamp_is_parallel_and_replay_deterministic(spark, tmp_path):
    """r5 verdict fix: the DLQ __row_n stamp must NOT funnel the
    micro-batch through one unpartitioned-window sort task. The new
    hash-bucket + in-bucket rank + broadcast-offset decomposition
    must (a) still assign a permutation of 1..n per batch, (b)
    re-derive IDENTICAL (content → __row_n) mappings when the same
    batch is replayed (fresh checkpoint, same source), so the
    exactly-once reader collapses replays, and (c) show no
    unpartitioned WindowExec over the batch in the stamped plan."""
    import json as _json

    src = str(tmp_path / "src")
    rows = [(i % 7, _json.dumps({"v": i})) for i in range(40)]  # dup natural keys
    spark.createDataFrame(rows, "id int, body string").write.parquet(src)
    good = str(tmp_path / "good")

    def run(pipeline_name: str, cp: str) -> None:
        spec = PipelineSpec(
            name=pipeline_name,
            config={
                "source.format": "parquet",
                "source.path": src,
                "source.schema": "id int, body string",
                "sink.format": "dlq-split",
                "sink.option.jsonColumn": "body",
                "sink.option.schema": "v int",
                "sink.path": good,
                "sink.dlqPath": str(tmp_path / "bad"),
                "trigger": "availableNow",
            },
        )
        rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / cp))
        rt.start(spec)
        _wait_done(spark, pipeline_name)

    run("stamp1", "cp1")
    first = spark.read.parquet(good)
    got = sorted(r["__row_n"] for r in first.collect())
    assert got == list(range(1, 41))  # a permutation of 1..n

    # replay: same source content, fresh checkpoint → identical stamps
    run("stamp2", "cp2")
    both = spark.read.parquet(good)
    assert both.count() == 80
    # every (content, __batch_id, __row_n) row appears exactly twice —
    # i.e. the replay re-derived the same mapping bit-for-bit
    dup = both.groupBy(both.columns).count()
    assert dup.filter("count <> 2").count() == 0

    from heroku_kafka_connect_spark.controlplane import read_dlq_exactly_once

    assert read_dlq_exactly_once(spark, good, ["id"]).count() == 40


def test_dlq_metrics_via_observation(spark, tmp_path):
    """r6: declared sink.metricsPath makes the dlq-split sink emit
    per-batch (n_good, n_bad) via the Observation API — accumulator
    metrics riding the write pass, no extra scan. The metric row must
    match the actually-written row counts."""
    import json as _json

    src = str(tmp_path / "src")
    rows = [(i, _json.dumps({"v": i}) if i % 3 else "{broken") for i in range(12)]
    spark.createDataFrame(rows, "id int, body string").write.parquet(src)
    spec = PipelineSpec(
        name="dlqmetrics",
        config={
            "source.format": "parquet",
            "source.path": src,
            "source.schema": "id int, body string",
            "sink.format": "dlq-split",
            "sink.option.jsonColumn": "body",
            "sink.option.schema": "v int",
            "sink.path": str(tmp_path / "good"),
            "sink.dlqPath": str(tmp_path / "bad"),
            "sink.metricsPath": str(tmp_path / "metrics"),
            "trigger": "availableNow",
        },
    )
    rt = SparkRuntime(spark, checkpoint_root=str(tmp_path / "cp"))
    rt.start(spec)
    _wait_done(spark, "dlqmetrics")
    good = spark.read.parquet(str(tmp_path / "good")).count()
    bad = spark.read.parquet(str(tmp_path / "bad")).count()
    m = spark.read.parquet(str(tmp_path / "metrics")).collect()
    assert good == 8 and bad == 4  # i=0,3,6,9 broken
    assert sum(r.n_good for r in m) == good and sum(r.n_bad for r in m) == bad


def test_metrics_sidecar_replay_collapses(spark, tmp_path):
    """r6 advice (controlplane.py metrics idempotence): the metrics
    sidecar is a separate append after the data writes, so a replayed
    micro-batch appends a duplicate (batch_id, n_good, n_bad) row.
    read_metrics_exactly_once must collapse replays to one row per
    batch_id while keeping distinct batches intact."""
    from heroku_kafka_connect_spark.controlplane import read_metrics_exactly_once

    path = str(tmp_path / "metrics")
    rows = [(0, 8, 4), (0, 8, 4), (1, 5, 0)]  # batch 0 replayed once
    spark.createDataFrame(
        rows, "batch_id long, n_good long, n_bad long"
    ).write.mode("append").parquet(path)
    got = sorted(
        (r.batch_id, r.n_good, r.n_bad)
        for r in read_metrics_exactly_once(spark, path).collect()
    )
    assert got == [(0, 8, 4), (1, 5, 0)]


def test_controlplane_soak(spark, tmp_path):
    """r10 verdict item 3 — the COMPOSED control plane: one boot()
    managing three concurrent live streaming queries (file micro-batch
    sources, maxFilesPerTrigger=1) driven through the full production
    sequence — spec mutation via REST PUT (tasks.max rebalance), a
    mid-flight kill with pending input, and a prune — asserting the
    F1/F5 no-loss/no-dup invariants JOINTLY at the end. The reference's
    main.sh:146-196 reconcile loop IS this composition, run forever;
    E1-E10/J126 test each piece in isolation, this is the soak.

    No-dup rigor: the parquet sinks are FileStreamSinks, so batch
    read-back goes through _spark_metadata (exactly-once even across
    the kill/restart); the dlq-split sink is two at-least-once appends
    restored to exactly-once by read_dlq_exactly_once."""
    import urllib.request

    from heroku_kafka_connect_spark.controlplane import (
        boot,
        read_dlq_exactly_once,
    )

    def feed(src: str, lo: int, hi: int, files: int = 4) -> None:
        spark.createDataFrame(
            [(i, float(i), '{"k": %d}' % i) for i in range(lo, hi)],
            "id int, amount double, payload string",
        ).repartition(files).write.mode("append").parquet(src)

    def drain(name: str, timeout_s: float = 90.0) -> None:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            q = next((q for q in spark.streams.active if q.name == name), None)
            if q is not None:
                q.processAllAvailable()
                return
            time.sleep(0.2)
        raise TimeoutError(f"{name} never became active")

    d = {n: str(tmp_path / n) for n in
         ("src_a", "src_b", "src_c", "out_a", "out_b", "good_c", "dlq_c")}
    for n in ("src_a", "src_b", "src_c"):
        feed(d[n], 0, 20)

    schema = "id int, amount double, payload string"

    def plain_cfg(tasks: int) -> dict:
        return {
            "source.format": "parquet",
            "source.path": d["src_a"],
            "source.schema": schema,
            "source.option.maxFilesPerTrigger": "1",
            "tasks.max": str(tasks),
            "sink.format": "parquet",
            "sink.path": d["out_a"],
        }

    smt_cfg = {
        "source.format": "parquet",
        "source.path": d["src_b"],
        "source.schema": schema,
        "source.option.maxFilesPerTrigger": "1",
        "transforms": "big",
        "transforms.big.type": "filter",
        "transforms.big.predicate": "amount >= 10.0",
        "sink.format": "parquet",
        "sink.path": d["out_b"],
    }
    dlq_cfg = {
        "source.format": "parquet",
        "source.path": d["src_c"],
        "source.schema": schema,
        "source.option.maxFilesPerTrigger": "1",
        "sink.format": "dlq-split",
        "sink.path": d["good_c"],
        "sink.dlqPath": d["dlq_c"],
        "sink.option.jsonColumn": "payload",
        "sink.option.schema": "k int",
    }
    env = {
        "CONNECTOR_NAMES": "soak_a soak_b soak_c",
        "CONNECTOR_SOAK_A": json.dumps(plain_cfg(2)),
        "CONNECTOR_SOAK_B": json.dumps(smt_cfg),
        "CONNECTOR_SOAK_C": json.dumps(dlq_cfg),
    }
    runtime, server, thread = boot(
        spark, checkpoint_root=str(tmp_path / "cp"), env=env,
        require_kafka_env=False,
    )
    try:
        thread.join(timeout=90)
        assert not thread.is_alive()
        for n in ("soak_a", "soak_b", "soak_c"):
            drain(n)
        base = f"http://127.0.0.1:{server.port}"
        assert json.loads(urllib.request.urlopen(base).read())["ready"]
        listed = json.loads(urllib.request.urlopen(f"{base}/connectors").read())
        assert listed == ["soak_a", "soak_b", "soak_c"]

        # --- REST PUT rebalance: tasks.max 2 -> 4 restarts soak_a from
        # its checkpoint; data fed across the restart arrives once
        feed(d["src_a"], 20, 40)
        drain("soak_a")
        req = urllib.request.Request(
            f"{base}/connectors/soak_a/config",
            data=json.dumps(plain_cfg(4)).encode(),
            method="PUT",
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert json.loads(resp.read())["outcome"] == "restarted"
        feed(d["src_a"], 40, 60)
        drain("soak_a")

        # --- mid-flight kill: new input lands, the query dies OUTSIDE
        # the reconciler (worker death), reconcile restarts it from the
        # checkpoint and the pending input arrives exactly once
        feed(d["src_b"], 20, 40)
        victim = next(q for q in spark.streams.active if q.name == "soak_b")
        victim.stop()  # no drain first: input is pending at kill time
        specs_now = [
            PipelineSpec("soak_a", plain_cfg(4)),
            PipelineSpec("soak_b", smt_cfg),
            PipelineSpec("soak_c", dlq_cfg),
        ]
        rec = Reconciler(runtime, sleep=lambda _s: None)
        rep = rec.reconcile_once(specs_now)
        assert "soak_b" in rep.started and not rep.failed
        drain("soak_b")

        # --- more traffic to the dlq pipeline, including corrupt rows
        spark.createDataFrame(
            [(100, 1.0, "{broken"), (101, 1.0, None), (102, 1.0, '{"k":102}')],
            schema,
        ).write.mode("append").parquet(d["src_c"])
        drain("soak_c")

        # --- prune, both ways: REST DELETE soak_c, declarative
        # reconcile drops soak_b; only soak_a survives
        req = urllib.request.Request(
            f"{base}/connectors/soak_c", method="DELETE"
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
        rep2 = rec.reconcile_once([PipelineSpec("soak_a", plain_cfg(4))])
        assert rep2.pruned == ["soak_b"]
        active = {q.name for q in spark.streams.active}
        assert "soak_b" not in active and "soak_c" not in active
        assert "soak_a" in active

        # --- joint no-loss/no-dup audit over everything that happened
        got_a = [r.id for r in spark.read.parquet(d["out_a"]).collect()]
        assert sorted(got_a) == list(range(60))  # across PUT-rebalance
        got_b = [r.id for r in spark.read.parquet(d["out_b"]).collect()]
        assert sorted(got_b) == list(range(10, 40))  # across the kill
        good = read_dlq_exactly_once(spark, d["good_c"], ["id"])
        bad = read_dlq_exactly_once(spark, d["dlq_c"], ["id"])
        assert sorted(r.id for r in good.collect()) == list(range(20)) + [102]
        assert sorted(r.id for r in bad.collect()) == [100, 101]
    finally:
        server.shutdown()
        Reconciler(runtime, sleep=lambda _s: None).reconcile_once([])
