"""Unit tests for the SMT library (SURVEY.md §2.D) on tiny frames:
nulls, empty input, and the predicate helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from heroku_kafka_connect_spark.functions import smt


def test_cast_fields(records):
    out = smt.cast_fields(records, {"id": "long", "amount": "string"})
    assert dict(out.dtypes)["id"] == "bigint"
    assert dict(out.dtypes)["amount"] == "string"


def test_extract_field(spark):
    df = spark.createDataFrame([((1, "x"),)], "s struct<a:int,b:string>")
    out = smt.extract_field(df, "s", "b", alias="only_b")
    assert "only_b" in out.columns and out.first().only_b == "x"


def test_filter_and_tombstone_predicate(records):
    kept = smt.filter_records(records, smt.record_is_tombstone("value"), keep=False)
    assert kept.count() == 2  # the value=None row dropped
    routed = smt.filter_records(records, smt.topic_name_matches("^ord.*"))
    assert routed.count() == 2


def test_flatten(spark):
    df = spark.createDataFrame([((1, (2, "z")),)], "s struct<a:int,n:struct<b:int,c:string>>")
    out = smt.flatten(df, "s")
    assert set(out.columns) == {"s_a", "s_n_b", "s_n_c"}
    row = out.first()
    assert (row.s_a, row.s_n_b, row.s_n_c) == (1, 2, "z")


def test_hoist_and_value_to_key(records):
    hoisted = smt.hoist_field(records, ["id", "value"], "payload")
    assert "payload" in hoisted.columns
    assert hoisted.first().payload.id == 1
    keyed = smt.value_to_key(records, ["id", "topic"])
    assert keyed.first().key == (1, "orders")


def test_insert_and_mask(records):
    out = smt.insert_field(records, "src", F.lit("static"))
    assert out.first().src == "static"
    masked = smt.mask_field(records, "amount")
    assert all(r.amount is None for r in masked.collect())
    hashed = smt.mask_field(records, "value", hash_with_sha256=True)
    vals = [r.value for r in hashed.collect()]
    assert vals[0] != "a" and len(vals[0]) == 64


def test_replace_field(records):
    out = smt.replace_field(records, renames={"id": "record_id"}, exclude=["ts_str"])
    assert "record_id" in out.columns and "ts_str" not in out.columns


def test_regex_and_timestamp_router(records):
    routed = smt.regex_router(records, "topic", "^orders$", "orders-v2")
    assert {r.topic for r in routed.collect()} == {"orders-v2", "events"}
    df = records.withColumn("ts", F.to_timestamp("ts_str"))
    tr = smt.timestamp_router(df, "topic", "ts", "yyyyMMdd")
    assert tr.first().topic.endswith("-20240101")


def test_timestamp_converter_roundtrip(records):
    df = smt.timestamp_converter(records, "ts_str", target="timestamp")
    assert dict(df.dtypes)["ts_str"] == "timestamp"
    back = smt.timestamp_converter(df, "ts_str", target="string", fmt="yyyy-MM-dd HH:mm:ss")
    assert back.first().ts_str == "2024-01-01 00:00:00"
    unix = smt.timestamp_converter(df, "ts_str", target="unix")
    assert unix.first().ts_str == 1704067200


def test_headers(records):
    df = smt.ensure_headers(records)
    df = smt.insert_header(df, "origin", F.lit("test"))
    df = smt.header_from(df, "topic", "topic_header")
    row = df.first()
    assert row.headers["origin"] == "test" and row.headers["topic_header"] == "orders"
    dropped = smt.drop_headers(df, ["origin"])
    assert "origin" not in dropped.first().headers


def test_empty_input(spark):
    empty = spark.createDataFrame([], "id int, value string, topic string")
    assert smt.filter_records(empty, smt.topic_name_matches(".*")).count() == 0
    assert smt.mask_field(empty, "value").count() == 0


def test_set_schema_metadata_no_data_effect(spark):
    df = spark.createDataFrame([(1, "x")], "id int, v string")
    out = smt.set_schema_metadata(df, "renamed_schema")
    assert out.schema == df.schema
    assert out.collect() == df.collect()
