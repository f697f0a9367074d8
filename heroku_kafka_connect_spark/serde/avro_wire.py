"""Confluent Schema Registry wire format — §2.C1, §4.3.1 (SURVEY.md).

The AvroConverter configured at reference main.sh:72-75 emits
`[magic 0x00][4-byte big-endian schema id][avro body]`. Spark's
`from_avro`/`to_avro` (spark-avro module) handle the body but not the
framing, so the framing is the one genuinely custom serde piece:
pure Column expressions (binary substring/concat — JVM-side, no UDF).

The avro body codec itself needs the external spark-avro jar, which
is not bundled with pip pyspark — `from_avro_body`/`to_avro_body`
gate on its availability and raise a clear error otherwise. The
framing (and the registry client protocol) is fully testable without
it, which is what the corpus exercises.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC_BYTE = 0x00
HEADER_LEN = 5


def frame(payload: Column, schema_id: Column | int) -> Column:
    """Wrap an avro/opaque body in the Confluent wire format."""
    sid = F.lit(schema_id) if isinstance(schema_id, int) else schema_id
    sid_hex = F.lpad(F.hex(sid.cast("int")), 8, "0")
    return F.concat(
        F.unhex(F.lit("00")),  # magic byte
        F.unhex(sid_hex),  # 4-byte big-endian schema id
        payload,
    )


def unframe_schema_id(framed: Column) -> Column:
    """Extract the 4-byte big-endian schema id as a long."""
    return F.conv(F.hex(F.substring(framed, 2, 4)), 16, 10).cast("long")


def unframe_payload(framed: Column) -> Column:
    """Extract the body after the 5-byte header."""
    return F.expr(f"substring({_sql(framed)}, {HEADER_LEN + 1}, length({_sql(framed)}) - {HEADER_LEN})")


def is_wire_format(framed: Column) -> Column:
    """Valid-frame check: magic byte 0x00 and enough length (an empty
    avro body is legal — exactly 5 header bytes)."""
    return (F.length(framed) >= HEADER_LEN) & (F.hex(F.substring(framed, 1, 1)) == "00")


def _sql(col: Column) -> str:
    # Column -> SQL text for use inside F.expr; relies on simple column refs
    return col._jc.toString()  # noqa: SLF001


def unframe(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Split a wire-format binary column into (schema_id, payload)."""
    v = F.col(value_col)
    return df.withColumn("schema_id", unframe_schema_id(v)).withColumn(
        "payload", F.expr(f"substring({value_col}, {HEADER_LEN + 1}, length({value_col}) - {HEADER_LEN})")
    )


def from_avro_body(payload: Column, json_schema: str) -> Column:
    """Decode an Avro body (requires the external spark-avro jar)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "spark-avro jar not available in this environment; "
            "ship org.apache.spark:spark-avro on a real cluster"
        ) from e
    return from_avro(payload, json_schema)


def to_avro_body(data: Column, json_schema: str | None = None) -> Column:
    """Encode to an Avro body (requires the external spark-avro jar)."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "spark-avro jar not available in this environment; "
            "ship org.apache.spark:spark-avro on a real cluster"
        ) from e
    return to_avro(data, json_schema) if json_schema else to_avro(data)
