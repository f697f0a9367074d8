"""Pure-Python Avro *binary* codec — §2.C1 body half (SURVEY.md).

The reference's default converter is AvroConverter (main.sh:72-75):
every record body on the wire is Avro binary. Spark's JVM codec for
that body lives in the external spark-avro module, which the pip
distribution does not bundle — so environments without the jar (this
sandbox) get this self-contained implementation of the public Avro
1.11 binary encoding spec (zigzag varints, length-prefixed bytes,
union index + value, record = fields in order). On a real cluster
ship ``org.apache.spark:spark-avro`` and prefer the JVM
``from_avro``/``to_avro`` (avro_wire.from_avro_body) — the Python
codec is the correctness-identical fallback, Arrow-batched so the
per-row work stays amortized per Arrow batch rather than per task
round-trip.

Supported schema subset (everything the Connect fixtures need):
null, boolean, int, long, float, double, bytes, string, record,
union, array, map. Schema resolution (reader != writer) implements
the spec's rules needed for registry-driven evolution: writer-only
fields are skipped, reader-only fields take their default, and
numeric promotions (int→long→float→double) apply.
"""

from __future__ import annotations

import json
import struct
from typing import Any

# ---------------------------------------------------------------- primitives


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _schema_type(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


# ---------------------------------------------------------------- encode


def encode(value: Any, schema: Any, out: bytearray) -> None:
    t = _schema_type(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t in ("bytes", "string"):
        b = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        out += _zigzag_encode(len(b))
        out += b
    elif t == "union":
        idx = _union_branch(schema, value)
        out += _zigzag_encode(idx)
        encode(value, schema[idx], out)
    elif t == "record":
        for f in schema["fields"]:
            encode(value.get(f["name"], f.get("default")), f["type"], out)
    elif t == "array":
        # None-check explicitly: numpy arrays (how Arrow delivers
        # array columns to pandas UDFs) raise on bare truth tests
        items = [] if value is None else list(value)
        if items:
            out += _zigzag_encode(len(items))
            for it in items:
                encode(it, schema["items"], out)
        out += _zigzag_encode(0)
    elif t == "map":
        entries = {} if value is None else dict(value)
        if entries:
            out += _zigzag_encode(len(entries))
            for k, v in entries.items():
                encode(k, "string", out)
                encode(v, schema["values"], out)
        out += _zigzag_encode(0)
    else:  # pragma: no cover
        raise NotImplementedError(f"avro type {t!r}")


def _branch_accepts(t: str, value: Any) -> bool:
    """Python-value ↔ Avro-type compatibility for union branch
    selection (bool checked before int: bool is an int subclass)."""
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t == "bytes":
        return isinstance(value, (bytes, bytearray))
    if t == "array":
        return isinstance(value, (list, tuple))
    if t in ("map", "record"):
        return isinstance(value, dict)
    return False


def _union_branch(union: list, value: Any) -> int:
    """Pick the union branch for a Python value: null for None, else
    the first TYPE-COMPATIBLE branch. Blind first-non-null selection
    would silently corrupt multi-branch unions (a long routed through
    the string branch encodes bytes(int) — NUL garbage, no error).

    Fallback: an INTEGRAL float may take an int/long branch — pandas
    coerces nullable int64 columns to float64, so a [null, long]
    field's 5 arrives as 5.0 (the magnitude guard upstream keeps this
    exact; see avro_wire._int_precision_guard)."""
    for i, s in enumerate(union):
        if value is None and _schema_type(s) == "null":
            return i
    if value is not None:
        for i, s in enumerate(union):
            if _branch_accepts(_schema_type(s), value):
                return i
        if isinstance(value, float) and value.is_integer():
            for i, s in enumerate(union):
                if _schema_type(s) in ("int", "long"):
                    return i
    raise ValueError(f"no union branch accepts {value!r} in {union!r}")


# ---------------------------------------------------------------- decode


def decode(buf: bytes, pos: int, writer: Any, reader: Any | None = None) -> tuple[Any, int]:
    """Decode per writer schema, resolving into the reader schema if
    given (spec 'Schema Resolution')."""
    t = _schema_type(writer)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        v, pos = _zigzag_decode(buf, pos)
        if reader is not None and _schema_type(reader) in ("float", "double"):
            return float(v), pos
        return v, pos
    if t == "float":
        (v,) = struct.unpack_from("<f", buf, pos)
        return v, pos + 4
    if t == "double":
        (v,) = struct.unpack_from("<d", buf, pos)
        return v, pos + 8
    if t in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "union":
        idx, pos = _zigzag_decode(buf, pos)
        branch = writer[idx]
        r = None
        if reader is not None and _schema_type(reader) == "union":
            bt = _schema_type(branch)
            r = next((s for s in reader if _schema_type(s) == bt), None)
        return decode(buf, pos, branch, r)
    if t == "record":
        reader_fields = (
            {f["name"]: f for f in reader["fields"]}
            if reader is not None and _schema_type(reader) == "record"
            else None
        )
        rec: dict[str, Any] = {}
        for f in writer["fields"]:
            rf = reader_fields.get(f["name"]) if reader_fields is not None else None
            v, pos = decode(buf, pos, f["type"], rf["type"] if rf else None)
            if reader_fields is None or rf is not None:
                rec[f["name"]] = v  # writer-only fields are skipped
        if reader_fields is not None:
            written = {f["name"] for f in writer["fields"]}
            for name, rf in reader_fields.items():
                if name not in written:
                    if "default" not in rf:
                        raise ValueError(f"reader field {name!r} missing and has no default")
                    rec[name] = rf["default"]
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            r_items = reader.get("items") if isinstance(reader, dict) else None
            for _ in range(n):
                v, pos = decode(buf, pos, writer["items"], r_items)
                items.append(v)
        return items, pos
    if t == "map":
        entries: dict[str, Any] = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            r_vals = reader.get("values") if isinstance(reader, dict) else None
            for _ in range(n):
                k, pos = decode(buf, pos, "string")
                entries[k], pos = decode(buf, pos, writer["values"], r_vals)
        return entries, pos
    raise NotImplementedError(f"avro type {t!r}")  # pragma: no cover


# ---------------------------------------------------------------- record API


def encode_record(value: dict, schema: dict | str) -> bytes:
    s = json.loads(schema) if isinstance(schema, str) else schema
    out = bytearray()
    encode(value, s, out)
    return bytes(out)


def decode_record(buf: bytes, writer: dict | str, reader: dict | str | None = None) -> dict:
    w = json.loads(writer) if isinstance(writer, str) else writer
    r = json.loads(reader) if isinstance(reader, str) else reader
    v, _pos = decode(buf, 0, w, r)
    return v


# ---------------------------------------------------------------- spark types


_DDL = {
    "null": "void",
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def avro_to_ddl(schema: dict | str) -> str:
    """Avro schema → Spark DDL type string (for pandas_udf return
    types). Unions must be [null, X] (nullable X); nested records map
    to structs."""
    s = (
        json.loads(schema)
        if isinstance(schema, str) and schema.lstrip()[:1] in ("{", "[")
        else schema
    )
    t = _schema_type(s)
    if t in _DDL:
        return _DDL[t]
    if t == "union":
        non_null = [b for b in s if _schema_type(b) != "null"]
        if len(non_null) != 1:
            raise NotImplementedError("only [null, X] unions map to Spark types")
        return avro_to_ddl(non_null[0])
    if t == "record":
        fields = ", ".join(f"{f['name']}: {avro_to_ddl(f['type'])}" for f in s["fields"])
        return f"struct<{fields}>"
    if t == "array":
        return f"array<{avro_to_ddl(s['items'])}>"
    if t == "map":
        return f"map<string, {avro_to_ddl(s['values'])}>"
    raise NotImplementedError(f"avro type {t!r}")
