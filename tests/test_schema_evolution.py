"""Schema evolution (SURVEY §1.2, §7.4.6): the registry-governed
dynamic-schema world maps onto Spark as per-plan schema pinning —
batch parquet evolves via mergeSchema; JSON payloads evolve by
recompiling with the new schema (old records surface NULL for added
fields, exactly like Avro optional-field defaults)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heroku_kafka_connect_spark.serde import jsonserde


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """v2 adds an optional column: mergeSchema reads both file
    generations; v1 rows surface NULL for the new field."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "id int, s string").write.parquet(path)
    spark.createDataFrame([(2, "b", 9.5)], "id int, s string, score double")\
        .write.mode("append").parquet(path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    got = {r.id: r.score for r in df.collect()}
    assert got == {1: None, 2: 9.5}
    assert set(df.columns) == {"id", "s", "score"}


def test_json_schema_evolution_recompile(spark):
    """The streaming analog of a registry subject gaining a version:
    recompile from_json with the v2 schema — v1 payloads parse with
    NULL for the added field, none are dropped (PERMISSIVE), and the
    DLQ split still catches genuinely corrupt payloads."""
    payloads = spark.createDataFrame(
        [(1, '{"k": 10}'), (2, '{"k": 20, "extra": "x"}'), (3, "{nope")],
        "id int, payload string",
    )
    v1, v2 = "k bigint", "k bigint, extra string"
    with_v1 = payloads.select("id", jsonserde.parse_json("payload", v1).alias("p"))
    assert [r.p.k for r in with_v1.collect()] == [10, 20, None]

    valid, dlq = jsonserde.dlq_split(payloads, "payload", v2)
    rows = {r.id: r["__parsed"] for r in valid.collect()}
    assert rows[1].k == 10 and rows[1].extra is None  # v1 record under v2 schema
    assert rows[2].extra == "x"
    assert [r.id for r in dlq.collect()] == [3]


def test_evolved_field_projection_is_null_safe(spark):
    """Downstream exprs over an added-optional field must null-propagate
    instead of failing — the engine contract that makes rolling schema
    upgrades safe."""
    df = spark.createDataFrame([('{"k": 1}',), ('{"k": 2, "w": 3}',)], "payload string")
    parsed = df.select(jsonserde.parse_json("payload", "k bigint, w bigint").alias("p"))
    out = parsed.select((F.col("p.k") + F.coalesce(F.col("p.w"), F.lit(0))).alias("total"))
    assert sorted(r.total for r in out.collect()) == [1, 5]
