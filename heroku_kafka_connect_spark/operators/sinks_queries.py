"""§2.B + §2.C — sink-semantics and serde corpus queries.

Tombstone convention for the fixtures: `event_type='error'` records
act as deletes for their user_id (Connect's tombstone is a null value
payload; the fixture has no nulls, so the error type stands in)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import alias, register
from ..serde import avro_wire
from ..serde.jsonserde import dlq_split
from ..session import load_tables
from ..sinks import writers

_ORDER = lambda: [F.col("ts").desc(), F.col("event_id").desc()]  # noqa: E731

from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=None)
def _sink_dir(sf_dir: str) -> str:
    """One tmp dir per (process, fixture dir): bounded growth, no
    cross-harness race, and a DataFrame returned for one sf_dir is
    never invalidated by a later call for a different one (a single
    shared dir would let the second call's overwrite delete files the
    first call's lazy plan still references)."""
    return tempfile.mkdtemp(prefix="hkc_file_sink_")


@register(
    "sink_insert_projection",
    oracle="""
    SELECT o_orderkey AS id, o_custkey AS customer_id,
           o_totalprice AS amount, o_orderstatus AS status
    FROM orders
    """,
)
def sink_insert_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 insert.mode=insert: the projected batch that would be
    appended to the target table (column mapping = sink field
    renames)."""
    t = load_tables(spark, sf_dir)
    return t.orders.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderstatus").alias("status"),
    )


@register(
    "sink_upsert_latest",
    oracle="""
    SELECT user_id, event_type AS last_type, value AS last_value,
           epoch_us(ts) AS last_ts_us
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def sink_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 insert.mode=upsert, pk.mode=user_id: last write per PK wins.
    One shuffle on the PK; this exact transform runs inside
    foreach_batch_upsert on the streaming path."""
    t = load_tables(spark, sf_dir)
    latest = writers.latest_per_key(t.events, ["user_id"], _ORDER())
    return latest.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("last_ts_us"),
    )


@register(
    "sink_tombstone_delete",
    oracle="""
    SELECT user_id, event_type AS last_type, epoch_us(ts) AS last_ts_us
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
            AND event_type <> 'error'
    """,
)
def sink_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 delete.enabled: keys whose latest record is a tombstone
    (event_type='error') are deleted from the materialized state."""
    t = load_tables(spark, sf_dir)
    live = writers.apply_tombstones(
        t.events, ["user_id"], _ORDER(), tombstone=F.col("event_type") == "error"
    )
    return live.select(
        "user_id", F.col("event_type").alias("last_type"), F.unix_micros("ts").alias("last_ts_us")
    )


@register(
    "cdc_apply_envelope",
    oracle="""
    WITH env AS (
      SELECT user_id,
             CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
             value AS after_value, ts, event_id
      FROM events
    )
    SELECT user_id, op AS last_op, after_value
    FROM env
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
            AND op <> 'd'
    """,
)
def cdc_apply_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 Debezium envelope apply: build {op, before, after} change
    events from the fixture stream, then materialize final state
    (latest op per key; op='d' removes the key)."""
    t = load_tables(spark, sf_dir)
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
    )
    env = t.events.select(
        "user_id",
        op.alias("op"),
        F.col("value").alias("after_value"),
        "ts",
        "event_id",
    )
    state = writers.cdc_apply(env, ["user_id"], _ORDER())
    return state.select("user_id", F.col("op").alias("last_op"), "after_value")


@register(
    "file_sink_roundtrip",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def file_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 file sink: write the batch as parquet (the Camel SFTP sink's
    engine half), read it back, prove losslessness — the oracle is the
    original table, so any write/read corruption fails the hash."""
    t = load_tables(spark, sf_dir)
    # Per-(process, sf_dir) tmpdir: a fixed path would race concurrent
    # harnesses, a fresh mkdtemp per invocation leaks a parquet copy
    # of events on every bench/correctness run — the cached dir
    # (overwrite mode) bounds growth to one copy per fixture.
    out = os.path.join(_sink_dir(sf_dir), "roundtrip")
    df = t.events.select("event_id", "user_id", "event_type", "value")
    writers.write_files(df, out, fmt="parquet", partition_by=["event_type"])
    back = spark.read.parquet(out)
    return back.select("event_id", "user_id", "event_type", "value")


@register(
    "avro_roundtrip",
    oracle="""
    SELECT event_id, 7 AS schema_id, props AS payload_str, 1 AS frame_ok
    FROM events
    """,
)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 Confluent wire format (framing half): frame each payload as
    [0x00][schema-id=7][body], then unframe and prove the id and body
    survive. Pure JVM Column expressions. (The avro BODY codec is
    covered by `avro_body_roundtrip` / `avro_schema_evolution`.)"""
    t = load_tables(spark, sf_dir)
    framed = t.events.select(
        "event_id",
        avro_wire.frame(F.encode("props", "UTF-8"), 7).alias("value"),
    )
    un = avro_wire.unframe(framed, "value")
    return un.select(
        "event_id",
        F.col("schema_id").cast("int").alias("schema_id"),
        F.decode("payload", "UTF-8").alias("payload_str"),
        F.when(avro_wire.is_wire_format(F.col("value")), 1).otherwise(0).alias("frame_ok"),
    )


_EVENT_V1 = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
    ],
}
_EVENT_V2 = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "source", "type": "string", "default": "unknown"},
    ],
}


@register(
    "avro_body_roundtrip",
    oracle="""
    SELECT event_id, event_type, value FROM events
    """,
)
def avro_body_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 Avro body codec (reference main.sh:72-75 — AvroConverter is
    the default serde for EVERY record): encode each event as a real
    Avro binary record, frame it with the registry-assigned schema id,
    then decode by resolving that id back through the registry. The
    oracle is the source table, so any encode/decode corruption fails
    the hash. Arrow-batched pandas UDFs (serde/avro_codec.py); on a
    cluster with the spark-avro jar (session.get_spark resolves it
    when SPARK_GRAFT_AVRO_PACKAGE is set) the JVM from_avro/to_avro
    route is taken instead — same wire framing, same output."""
    from ..serde.schema_registry import SchemaRegistry

    t = load_tables(spark, sf_dir)
    reg = SchemaRegistry()
    sid = reg.register("event", _EVENT_V1)
    if avro_wire.jvm_avro_available(spark):
        import json as _json

        body_schema = _json.dumps(
            {
                "type": "record",
                "name": "event",
                "fields": [f for f in _EVENT_V1["fields"] if f["name"] != "source"],
            }
        )
        framed = t.events.select(
            avro_wire.frame(
                avro_wire.to_avro_body(
                    F.struct("event_id", "event_type", "value"), body_schema
                ),
                sid,
            ).alias("wire")
        )
        return framed.select(
            avro_wire.from_avro_body(
                F.expr(f"substring(wire, {avro_wire.HEADER_LEN + 1}, length(wire) - {avro_wire.HEADER_LEN})"),
                body_schema,
            ).alias("r")
        ).select("r.*")
    enc = avro_wire.to_avro_body_py(_EVENT_V1)
    framed = t.events.select(
        avro_wire.frame(enc(F.struct("event_id", "event_type", "value")), sid).alias("wire")
    )
    dec = avro_wire.from_avro_framed_py(reg.schemas_by_id(), _EVENT_V1)
    return framed.select(dec("wire").alias("r")).select("r.*")


@register(
    "avro_schema_evolution",
    oracle="""
    SELECT event_id, event_type, value,
           CASE WHEN event_id % 2 = 0 THEN 'unknown' ELSE 'fixture' END AS source
    FROM events
    """,
)
def avro_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4.3.1 registry-driven evolution: one stream carries TWO writer
    schema versions (even event_ids → v1, odd → v2 which adds
    `source`), each framed with its own registry id; the consumer
    decodes every record by its id and projects into reader schema v2
    — v1 records take the reader default for the added field. This is
    the schema-evolution contract the Connect AvroConverter provides
    (backward-compatible reads across producer upgrades)."""
    from ..serde.schema_registry import SchemaRegistry

    t = load_tables(spark, sf_dir)
    reg = SchemaRegistry()
    id1 = reg.register("event", _EVENT_V1)
    id2 = reg.register("event", _EVENT_V2)
    enc = avro_wire.to_avro_body_multi_py(reg.schemas_by_id())
    ev = t.events.withColumn("source", F.lit("fixture")).withColumn(
        "sid", F.when(F.col("event_id") % 2 == 0, id1).otherwise(id2)
    )
    framed = ev.select(
        avro_wire.frame(
            enc(F.col("sid"), F.struct("event_id", "event_type", "value", "source")),
            F.col("sid"),
        ).alias("wire")
    )
    dec = avro_wire.from_avro_framed_py(reg.schemas_by_id(), _EVENT_V2)
    return framed.select(dec("wire").alias("r")).select("r.*")


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS valid
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 schemaless JsonConverter: PERMISSIVE parse + field extract."""
    t = load_tables(spark, sf_dir)
    parsed = t.events.withColumn("__p", F.from_json("props", "struct<k:bigint>"))
    return parsed.select(
        "event_id",
        F.col("__p.k").alias("k"),
        F.when(F.col("__p").isNotNull(), 1).otherwise(0).alias("valid"),
    )


@register(
    "dlq_split",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props) AND json_extract_string(props, '$.k') IS NOT NULL
                THEN 'valid' ELSE 'dlq' END AS route
    FROM events
    """,
)
def dlq_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 errors.tolerance=all + DLQ: records that fail PERMISSIVE
    parse (or lack the required field) route to the dead-letter side."""
    t = load_tables(spark, sf_dir)
    valid, dlq = dlq_split(t.events, "props", "struct<k:bigint>")
    v = valid.filter(F.col("__parsed.k").isNotNull()).select("event_id", F.lit("valid").alias("route"))
    bad = valid.filter(F.col("__parsed.k").isNull()).select("event_id", F.lit("dlq").alias("route"))
    d = dlq.select("event_id", F.lit("dlq").alias("route"))
    return v.unionByName(bad).unionByName(d)


alias("llm_dedup_latest", "sink_upsert_latest")


@register(
    "cdc_scd2_history",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           epoch_us(ts) AS valid_from_us,
           LEAD(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us,
           CAST(CASE WHEN LEAD(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS INT) AS is_current
    FROM events
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build from a CDC-style event stream: each
    per-key change opens a validity interval [ts, next_ts); the
    latest change stays open (valid_to null, is_current = 1) — the
    event-sourced dimension table a warehouse keeps next to the
    `sink_upsert_latest` compaction (which retains only the current
    row). One window shuffle on the natural (key, ts) sort;
    deterministic under ts ties via the event_id tiebreak."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    to_us = F.lead(F.unix_micros("ts")).over(w)
    return t.events.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("valid_from_us"),
        to_us.alias("valid_to_us"),
        F.when(to_us.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


@register(
    "cdc_extract_diff",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    v1 AS (SELECT k, cents FROM base WHERE k % 7 <> 0),
    v2 AS (SELECT k,
                  CASE WHEN k % 5 = 0
                       THEN cents + CAST(FLOOR(cents / 20.0) AS BIGINT)
                       ELSE cents END AS cents
           FROM base WHERE k % 11 <> 0)
    SELECT COALESCE(v1.k, v2.k) AS order_key,
           CASE WHEN v1.k IS NULL THEN 'c'
                WHEN v2.k IS NULL THEN 'd'
                ELSE 'u' END AS op,
           v1.cents AS before_cents,
           v2.cents AS after_cents
    FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    WHERE v1.k IS NULL OR v2.k IS NULL OR v1.cents <> v2.cents
    """,
)
def cdc_extract_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC EXTRACT — the reverse of `cdc_apply_envelope`: diff two
    table snapshots into a Debezium-style change feed {op c/u/d,
    before, after}. This is how a lake without a transactional source
    log still feeds downstream CDC consumers (the JDBC source
    connector's bulk-diff mode; reference stack's Debezium sink
    consumes exactly this envelope, main.sh:148-159 declares such
    pipelines). The two snapshots here are deterministic derivations
    of `orders` (v1 drops key%7==0 rows = inserts-to-be; v2 drops
    key%11==0 = deletes; key%5==0 rows get a +5% price change in
    integer cents = updates), so the oracle replays them exactly.

    Money is diffed in scaled-long CENTS (common.mlong convention):
    the +5% bump is `cents + floor(cents/20)` — pure integer
    arithmetic, bit-identical across engines, no double rounding.

    Scale shape: ONE co-partitioned full-outer hash join on the
    snapshot key, then a residual filter that drops unchanged rows —
    the emitted feed is O(|Δ|), not O(|table|). At 100 TB both
    snapshots are bucketed/partitioned by the same key so the join is
    shuffle-free; AQE coalesces the mostly-empty change partitions."""
    from .common import mlong

    t = load_tables(spark, sf_dir)
    base = t.orders.select(
        F.col("o_orderkey").alias("k"), mlong("o_totalprice").alias("cents")
    )
    v1 = base.filter(F.col("k") % 7 != 0)
    v2 = base.filter(F.col("k") % 11 != 0).select(
        "k",
        F.when(
            F.col("k") % 5 == 0,
            F.col("cents") + F.floor(F.col("cents") / F.lit(20.0)).cast("long"),
        )
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    j = v1.alias("a").join(v2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    op = (
        F.when(F.col("a.k").isNull(), "c")
        .when(F.col("b.k").isNull(), "d")
        .otherwise("u")
    )
    return (
        j.filter(
            F.col("a.k").isNull()
            | F.col("b.k").isNull()
            | (F.col("a.cents") != F.col("b.cents"))
        )
        .select(
            F.coalesce(F.col("a.k"), F.col("b.k")).alias("order_key"),
            op.alias("op"),
            F.col("a.cents").alias("before_cents"),
            F.col("b.cents").alias("after_cents"),
        )
    )


# ------------------------------------------------- r8: Avro OCF roundtrip


@register(
    "avro_ocf_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def avro_ocf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-row: Avro Object Container Files — the FILE half of the Avro
    surface (serde/avro_ocf.py; avro_wire.py owns the Kafka wire
    framing). Orders are written ONCE per session as one `.avro` OCF
    per partition — header, schema metadata, sync-marker-delimited
    blocks, pure-Python spec codec — then read back through the
    `binaryFile` source and decoded in an Arrow-batched stage; the
    oracle is the ORIGINAL table, so any encode/decode corruption
    fails the hash.

    Scale: write is embarrassingly parallel (each partition encodes
    its own container; on a lake the files land on shared storage —
    here /tmp, same contract); read maps whole files to decode tasks,
    the standard OCF split unit when blocks aren't indexed. The
    decode stage is mapInPandas (Arrow), never a row-wise UDF; sync
    markers are VERIFIED per block, so torn writes fail loudly."""
    import glob
    import pandas as pd

    from ..serde.avro_ocf import read_ocf, write_ocf

    t = load_tables(spark, sf_dir)
    schema = {
        "type": "record",
        "name": "Order",
        "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_orderstatus", "type": "string"},
            {"name": "o_totalprice", "type": "double"},
        ],
    }
    out = os.path.join(_sink_dir(sf_dir), "ocf")
    key = (spark.sparkContext.applicationId, out)
    if key not in _OCF_WRITTEN:
        for k in [k for k in _OCF_WRITTEN if k[0] != key[0]]:
            _OCF_WRITTEN.discard(k)
        os.makedirs(out, exist_ok=True)
        for f in glob.glob(os.path.join(out, "*.avro")):
            os.remove(f)

        def _write_part(rows) -> None:
            import hashlib as _hashlib

            recs = [
                {
                    "o_orderkey": r["o_orderkey"],
                    "o_orderstatus": r["o_orderstatus"],
                    "o_totalprice": r["o_totalprice"],
                }
                for r in rows
            ]
            if not recs:
                return
            buf = write_ocf(recs, schema)
            # content-addressed name: unique per partition, stable across
            # reruns, no partition-index API needed on the DF path
            name = _hashlib.md5(buf).hexdigest()[:16]
            with open(os.path.join(out, f"part-{name}.avro"), "wb") as fh:
                fh.write(buf)

        (
            t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
            .repartition(4, "o_orderkey")
            .foreachPartition(_write_part)
        )
        _OCF_WRITTEN.add(key)

    def _decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                recs, _ = read_ocf(bytes(content))
                if recs:
                    yield pd.DataFrame(recs)

    files = spark.read.format("binaryFile").load(os.path.join(out, "*.avro"))
    decoded = files.select("content").mapInPandas(
        _decode,
        schema="o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    return decoded.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0)
        .cast("double")
        .alias("sum_price"),
    )


_OCF_WRITTEN: set = set()


# ------------------------------------------------- r10: SCD2 MERGE INTO


@register(
    "cdc_merge_scd2",
    oracle=f"""
    WITH tgt AS (
      SELECT c_custkey, c_mktsegment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      FROM customer
    ),
    src AS (
      SELECT c_custkey, 'D' AS op, CAST(NULL AS BIGINT) AS new_bal,
             CAST(NULL AS VARCHAR) AS new_seg
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, 'U', bal + 100 * c_custkey, 'UPDATED'
      FROM tgt WHERE c_custkey % 3 = 0 AND c_custkey % 10 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, 'I', 100 * c_custkey, 'NEW'
      FROM customer WHERE c_custkey % 7 = 0
    ),
    hist AS (
      -- layer 1: every pre-existing version; U/D changes CLOSE it
      SELECT t.c_custkey, 1 AS version, t.c_mktsegment AS mktsegment,
             t.bal AS acctbal_cents,
             CAST(0 AS BIGINT) AS valid_from,
             CASE WHEN s.op IN ('U', 'D') THEN CAST(1000 AS BIGINT) END AS valid_to,
             CASE WHEN s.op IN ('U', 'D') THEN 0 ELSE 1 END AS is_current
      FROM tgt t LEFT JOIN src s USING (c_custkey)
      UNION ALL
      -- layer 2: new OPEN versions from updates and inserts
      SELECT s.c_custkey,
             CASE WHEN s.op = 'U' THEN 2 ELSE 1 END AS version,
             s.new_seg, s.new_bal,
             CAST(1000 AS BIGINT), CAST(NULL AS BIGINT), 1
      FROM src s WHERE s.op IN ('U', 'I')
    )
    SELECT c_custkey, CAST(version AS BIGINT) AS version, mktsegment,
           acctbal_cents, valid_from, valid_to,
           CAST(is_current AS INTEGER) AS is_current
    FROM hist
    """,
)
def cdc_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 MERGE — the history-preserving flavor of
    `rel_merge_into` (Kimball's slowly-changing-dimension type 2, the
    default for warehouse dims): instead of overwriting, an UPDATE
    CLOSES the current version (valid_to = batch time, is_current=0)
    AND inserts a new open version; a DELETE only closes; an INSERT
    opens version 1 under the new key. Expressed as the two-layer
    union every SCD2 MERGE compiles to — (target LEFT JOIN changes)
    for the close pass, plus the change rows for the open pass — so
    ONE shuffle on the merge key serves both layers. Deterministic
    change source shared with rel_merge_into; `cdc_scd2_history` is
    the event-sourced builder of the same shape, this is the
    batch-MERGE builder.

    All-integer validity bounds (logical batch time 1000) and
    scaled-long money, so the whole versioned dimension value-hashes.
    Scale: the standard Delta/Iceberg SCD2 MERGE plan — change set
    broadcasts when small, history table never rewrites closed rows."""
    t = load_tables(spark, sf_dir)
    from .common import mlong as _mlong

    tgt = t.customer.select(
        "c_custkey", "c_mktsegment", _mlong("c_acctbal").alias("bal")
    )
    src = (
        t.customer.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.lit("D").alias("op"),
            F.lit(None).cast("long").alias("new_bal"),
            F.lit(None).cast("string").alias("new_seg"),
        )
        .unionAll(
            tgt.filter(
                (F.col("c_custkey") % 3 == 0) & (F.col("c_custkey") % 10 != 0)
            ).select(
                "c_custkey",
                F.lit("U").alias("op"),
                (F.col("bal") + 100 * F.col("c_custkey")).alias("new_bal"),
                F.lit("UPDATED").alias("new_seg"),
            )
        )
        .unionAll(
            t.customer.filter(F.col("c_custkey") % 7 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("I").alias("op"),
                (100 * F.col("c_custkey")).cast("long").alias("new_bal"),
                F.lit("NEW").alias("new_seg"),
            )
        )
    )
    closing = F.col("op").isin("U", "D")
    hist = tgt.join(src, "c_custkey", "left").select(
        "c_custkey",
        F.lit(1).cast("long").alias("version"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("bal").alias("acctbal_cents"),
        F.lit(0).cast("long").alias("valid_from"),
        F.when(closing, F.lit(1000)).cast("long").alias("valid_to"),
        F.when(closing, 0).otherwise(1).cast("int").alias("is_current"),
    )
    opened = src.filter(F.col("op").isin("U", "I")).select(
        "c_custkey",
        F.when(F.col("op") == "U", 2).otherwise(1).cast("long").alias("version"),
        F.col("new_seg").alias("mktsegment"),
        F.col("new_bal").alias("acctbal_cents"),
        F.lit(1000).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(1).cast("int").alias("is_current"),
    )
    return hist.unionAll(opened)
