"""Confluent wire-format framing + JSON converter/DLQ tests
(SURVEY.md §2.C, §4.3.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heroku_kafka_connect_spark.serde import avro_wire, jsonserde


def test_frame_unframe_roundtrip(spark):
    df = spark.createDataFrame([(b"payload-bytes", 7), (b"", 123456)], "body binary, sid int")
    framed = df.select(avro_wire.frame(F.col("body"), F.col("sid")).alias("value"), "body", "sid")
    back = framed.select(
        avro_wire.unframe_schema_id(F.col("value")).alias("sid_out"),
        avro_wire.unframe_payload(F.col("value")).alias("body_out"),
        "body",
        "sid",
    )
    for r in back.collect():
        assert r.sid_out == r.sid
        assert bytes(r.body_out or b"") == bytes(r.body)


def test_wire_format_header_layout(spark):
    """First byte must be magic 0x00, schema id big-endian."""
    df = spark.createDataFrame([(b"x",)], "body binary")
    raw = df.select(avro_wire.frame(F.col("body"), 1).alias("v")).first().v
    assert bytes(raw) == b"\x00\x00\x00\x00\x01x"
    assert len(raw) == avro_wire.HEADER_LEN + 1


def test_is_wire_format(spark):
    df = spark.createDataFrame([(b"\x00\x00\x00\x00\x01abc",), (b"notframed",), (None,)], "v binary")
    flags = [r[0] for r in df.select(avro_wire.is_wire_format(F.col("v"))).collect()]
    assert flags == [True, False, None] or flags == [True, False, False]


def test_unframe_dataframe_helper(spark):
    df = spark.createDataFrame([(b"body",)], "value binary")
    framed = df.select(avro_wire.frame(F.col("value"), 42).alias("value"))
    out = avro_wire.unframe(framed)
    row = out.first()
    assert row.schema_id == 42 and bytes(row.payload) == b"body"


def test_json_parse_permissive(spark):
    """PERMISSIVE from_json: malformed → struct of nulls (not null);
    null input → null. dlq_split exists precisely because of this."""
    df = spark.createDataFrame([('{"a": 1}',), ("{broken",), (None,)], "payload string")
    parsed = df.select(jsonserde.parse_json("payload", "a int").alias("p"))
    vals = [r.p for r in parsed.collect()]
    assert vals[0].a == 1 and vals[1].a is None and vals[2] is None


def test_dlq_split(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, "{oops"), (3, '{"a": 3}'), (4, None)],
        "id int, payload string",
    )
    valid, dlq = jsonserde.dlq_split(df, "payload", "a int")
    ok = valid.collect()
    assert sorted(r.id for r in ok) == [1, 3]
    assert all(r["__parsed"].a == r.id for r in ok)  # parsed struct usable, no sidecar field
    assert "_corrupt_record" not in valid.select("__parsed.*").columns
    bad = dlq.collect()
    assert sorted(r.id for r in bad) == [2, 4]  # malformed + null payload
    assert all(r["__error"] == "json-parse-failed" for r in bad)


def test_to_json_value(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    assert df.select(jsonserde.to_json_value("a", "b").alias("j")).first().j == '{"a":1,"b":"x"}'
