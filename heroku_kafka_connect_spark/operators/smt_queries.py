"""§2.D — SMT corpus queries, each exercising functions/smt.py against
the `events` fixture (batch stand-in for a Kafka topic) with a DuckDB
oracle. The library call IS the query body, so the oracle checks the
library semantics, not a reimplementation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import smt
from ..registry import register
from ..session import load_tables


@register(
    "smt_cast",
    oracle="""
    SELECT event_id,
           CAST(user_id AS INTEGER) AS user_id,
           CAST(value AS VARCHAR) AS value,
           CAST(event_type AS VARCHAR) AS event_type
    FROM events
    """,
)
def smt_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 Cast: narrow the key type, stringify the measure."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", "user_id", "value", "event_type")
    return smt.cast_fields(df, {"user_id": "int", "value": "string"})


@register(
    "smt_extract_field",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def smt_extract_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 ExtractField: struct-ify props, then extract one field —
    the Connect pattern of replacing a record by a single field."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", F.from_json("props", "struct<k:bigint>").alias("v"))
    return smt.extract_field(df, "v", "k").select("event_id", "k")


@register(
    "smt_filter_predicate",
    oracle="""
    SELECT event_id, event_type, user_id FROM events
    WHERE regexp_matches(event_type, '^(click|view|purchase)$')
      AND NOT (value IS NULL)
    """,
)
def smt_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 Filter + TopicNameMatches/RecordIsTombstone predicates
    (event_type stands in for the topic; null value = tombstone)."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", "event_type", "user_id", "value")
    df = smt.filter_records(df, smt.topic_name_matches("^(click|view|purchase)$", "event_type"))
    df = smt.filter_records(df, smt.record_is_tombstone("value"), keep=False)
    return df.select("event_id", "event_type", "user_id")


@register(
    "smt_flatten",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS payload_meta_k,
           user_id AS payload_uid
    FROM events
    """,
)
def smt_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 Flatten: nested struct → delimiter-joined top-level columns."""
    t = load_tables(spark, sf_dir)
    df = t.events.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("uid"),
            F.from_json("props", "struct<k:bigint>").alias("meta"),
        ).alias("payload"),
    )
    flat = smt.flatten(df, "payload")
    return flat.select("event_id", "payload_meta_k", "payload_uid")


@register(
    "smt_hoist_field",
    oracle="SELECT event_id, value AS hoisted_value FROM events",
)
def smt_hoist_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 HoistField: wrap into a struct, prove round-trip by
    re-extracting (struct outputs don't hash across engines)."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", "value")
    hoisted = smt.hoist_field(df, ["value"], "wrapped")
    return hoisted.select("event_id", F.col("wrapped.value").alias("hoisted_value"))


@register(
    "smt_insert_field",
    oracle="""
    SELECT event_id,
           'events' AS topic,
           CAST(user_id % 8 AS INTEGER) AS partition,
           event_id AS offset,
           epoch_us(ts) AS ts_us,
           'v1' AS schema_version
    FROM events
    """,
)
def smt_insert_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 InsertField: static field + record metadata
    (topic/partition/offset/timestamp), as Connect injects them."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", "user_id", "ts")
    df = smt.insert_field(df, "topic", F.lit("events"))
    df = smt.insert_field(df, "partition", F.pmod("user_id", F.lit(8)).cast("int"))
    df = smt.insert_field(df, "offset", F.col("event_id"))
    df = smt.insert_field(df, "ts_us", F.unix_micros("ts"))
    df = smt.insert_field(df, "schema_version", F.lit("v1"))
    return df.select("event_id", "topic", "partition", "offset", "ts_us", "schema_version")


@register(
    "smt_mask_field",
    oracle="""
    SELECT event_id,
           0.0 AS value,
           CAST(NULL AS VARCHAR) AS props,
           sha256(event_type) AS event_type_pseudo
    FROM events
    """,
)
def smt_mask_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 MaskField: zero-mask, null-mask, and SHA-256 pseudonymize."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", "value", "props", F.col("event_type").alias("event_type_pseudo"))
    df = smt.mask_field(df, "value", 0.0)
    df = smt.mask_field(df, "props", None)
    df = smt.mask_field(df, "event_type_pseudo", hash_with_sha256=True)
    return df


@register(
    "smt_regex_router",
    oracle="""
    SELECT event_id,
           regexp_replace('topic.events.' || event_type, '^topic\\.', 'dw_') AS topic
    FROM events
    """,
)
def smt_regex_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 RegexRouter: rewrite topic names by pattern."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", F.concat(F.lit("topic.events."), "event_type").alias("topic"))
    return smt.regex_router(df, "topic", r"^topic\.", "dw_")


@register(
    "smt_replace_field",
    oracle="SELECT event_id AS id, user_id AS uid, event_type AS kind FROM events",
)
def smt_replace_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 ReplaceField: include-list + renames (drops the rest)."""
    t = load_tables(spark, sf_dir)
    return smt.replace_field(
        t.events,
        renames={"event_id": "id", "user_id": "uid", "event_type": "kind"},
        include=["event_id", "user_id", "event_type"],
    )


@register(
    "smt_timestamp_converter",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix,
           strftime(ts, '%Y-%m-%d %H:%M') AS ts_str,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS ts_date
    FROM events
    """,
)
def smt_timestamp_converter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 TimestampConverter: epoch seconds / formatted string / date."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", "ts")
    df = smt.timestamp_converter(df, "ts", "unix", alias="ts_unix")
    df = smt.timestamp_converter(df, "ts", "string", fmt="yyyy-MM-dd HH:mm", alias="ts_str")
    df = smt.timestamp_converter(df, "ts", "date", alias="ts_date")
    return df.select("event_id", "ts_unix", "ts_str", F.col("ts_date").cast("string").alias("ts_date"))


@register(
    "smt_timestamp_router",
    oracle="""
    SELECT event_id, 'events' || '-' || strftime(ts, '%Y%m%d') AS topic
    FROM events
    """,
)
def smt_timestamp_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12 TimestampRouter: daily topic routing — the same semantics
    as time-bucketed file rollover in the Camel SFTP sink."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", "ts", F.lit("events").alias("topic"))
    return smt.timestamp_router(df, "topic", "ts").select("event_id", "topic")


@register(
    "smt_value_to_key",
    oracle="""
    SELECT event_id, user_id AS key_user_id, event_type AS key_event_type
    FROM events
    """,
)
def smt_value_to_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13 ValueToKey: key struct built from value fields (re-projected
    to scalars for hashing)."""
    t = load_tables(spark, sf_dir)
    df = smt.value_to_key(t.events, ["user_id", "event_type"])
    return df.select(
        "event_id",
        F.col("key.user_id").alias("key_user_id"),
        F.col("key.event_type").alias("key_event_type"),
    )


@register(
    "smt_headers",
    oracle="""
    SELECT event_id,
           'parquet' AS hdr_source,
           CAST(user_id AS VARCHAR) AS hdr_uid,
           2 AS n_headers
    FROM events
    """,
)
def smt_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14 InsertHeader/HeaderFrom/DropHeaders over a map column."""
    t = load_tables(spark, sf_dir)
    df = t.events.select("event_id", "user_id")
    df = smt.insert_header(df, "source", F.lit("parquet"))
    df = smt.insert_header(df, "tmp", F.lit("drop-me"))
    df = smt.header_from(df, "user_id", "uid")
    df = smt.drop_headers(df, ["tmp"])
    return df.select(
        "event_id",
        F.element_at("headers", "source").alias("hdr_source"),
        F.element_at("headers", "uid").alias("hdr_uid"),
        F.size(F.map_keys("headers")).alias("n_headers"),
    )
