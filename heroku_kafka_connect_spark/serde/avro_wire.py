"""Confluent Schema Registry wire format — §2.C1, §4.3.1 (SURVEY.md).

The AvroConverter configured at reference main.sh:72-75 emits
`[magic 0x00][4-byte big-endian schema id][avro body]`. Spark's
`from_avro`/`to_avro` (spark-avro module) handle the body but not the
framing, so the framing is the one genuinely custom serde piece:
pure Column expressions (binary substring/concat — JVM-side, no UDF).

The avro *body* codec has two routes:
  - the JVM route (`from_avro_body`/`to_avro_body`) needs the
    external spark-avro jar, not bundled with pip pyspark — gated;
  - the pure-Python route (`to_avro_body_py`/`from_avro_framed_py`,
    backed by serde/avro_codec.py) is Arrow-batched pandas UDFs and
    runs anywhere; it also does registry-driven decode (resolve the
    header's schema id → writer schema, project into the reader
    schema) which the JVM functions cannot do per-row.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import avro_codec

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


_JVM_AVRO_PROBE: dict[str, bool] = {}


def jvm_avro_available(spark) -> bool:
    """True iff the external spark-avro jar is actually loadable in
    this session — probed FUNCTIONALLY (decode an empty record) rather
    than by import: ``pyspark.sql.avro.functions`` always imports, the
    failure only surfaces when the JVM resolves the expression.
    Sessions built with SPARK_GRAFT_AVRO_PACKAGE set (session.
    get_spark) pass this probe on networked environments; the sandbox
    (no jar, no network) fails it and callers fall back to the
    pure-Python codec. Result cached per application."""
    key = spark.sparkContext.applicationId
    if key not in _JVM_AVRO_PROBE:
        try:
            from pyspark.sql.avro.functions import from_avro

            from ..operators.common import bounded_collect

            empty = '{"type":"record","name":"probe","fields":[]}'
            bounded_collect(
                spark.range(1).select(from_avro(F.lit(b"").cast("binary"), empty)),
                1,
                "avro JVM-path probe",
            )
            _JVM_AVRO_PROBE[key] = True
        except Exception:  # noqa: BLE001 — jar missing ⇒ any of several JVM errors
            _JVM_AVRO_PROBE[key] = False
    return _JVM_AVRO_PROBE[key]


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


# ------------------------------------------------------- pure-Python body codec


def to_avro_body_py(schema: dict | str):
    """Pandas-UDF Avro body encoder: struct column → binary column.
    Arrow-batched (the jar-free fallback for `to_avro_body`; same
    bytes on the wire)."""
    from pyspark.sql.functions import pandas_udf

    s = json.loads(schema) if isinstance(schema, str) else schema

    @pandas_udf("binary")
    def enc(batch: pd.DataFrame) -> pd.Series:
        _int_precision_guard(s, batch)
        recs = batch.to_dict("records")
        return pd.Series(
            [avro_codec.encode_record(_none_nans(r), s) for r in recs], dtype=object
        )

    return enc


def to_avro_body_multi_py(schemas_by_id: dict[int, Any]):
    """Per-record multi-schema encoder: (schema_id column, struct
    column) → Avro body encoded with THAT record's schema. This is
    the producer half of a mixed-version stream (a fleet mid-upgrade
    emits v1 and v2 side by side): one Arrow pass, no
    per-schema-branch UDF duplication — a `when(...)` over two
    encoder UDFs would evaluate BOTH for every batch."""
    from pyspark.sql.functions import pandas_udf

    writers = {
        sid: (json.loads(s) if isinstance(s, str) else s) for sid, s in schemas_by_id.items()
    }

    @pandas_udf("binary")
    def enc(sids: pd.Series, batch: pd.DataFrame) -> pd.Series:
        # guard only the schemas this batch actually writes with — a
        # registered-but-unused schema must not veto a valid batch
        for sid in {int(x) for x in sids.unique()}:
            _int_precision_guard(writers[sid], batch)
        recs = batch.to_dict("records")
        out = []
        for sid, rec in zip(sids, recs):
            schema = writers[int(sid)]
            fields = {f["name"] for f in schema["fields"]}
            out.append(
                avro_codec.encode_record(
                    {k: v for k, v in _none_nans(rec).items() if k in fields}, schema
                )
            )
        return pd.Series(out, dtype=object)

    return enc


def from_avro_body_py(writer_schema: dict | str, reader_schema: dict | str | None = None):
    """Pandas-UDF Avro body decoder: binary column → struct column
    (reader schema if given, else the writer's)."""
    from pyspark.sql.functions import pandas_udf

    w = json.loads(writer_schema) if isinstance(writer_schema, str) else writer_schema
    r = json.loads(reader_schema) if isinstance(reader_schema, str) else reader_schema
    out_schema = r if r is not None else w
    names = [f["name"] for f in out_schema["fields"]]

    @pandas_udf(avro_codec.avro_to_ddl(out_schema))
    def dec(vals: pd.Series) -> pd.DataFrame:
        # null body = Kafka tombstone → all-null row, mirroring
        # from_avro_framed_py (decode_record(None) would crash the task)
        none_row = {n: None for n in names}
        rows = [
            none_row if b is None else avro_codec.decode_record(b, w, r) for b in vals
        ]
        return pd.DataFrame(rows, columns=names)

    return dec


def from_avro_framed_py(
    schemas_by_id: dict[int, Any],
    reader_schema: dict | str,
    *,
    corrupt_col: str | None = None,
):
    """Registry-driven decode of FULL wire-format records: parse the
    5-byte header, resolve the writer schema by id from the (tiny,
    closure-captured — effectively broadcast) registry snapshot, and
    project into ``reader_schema`` per the Avro resolution rules. This
    is the consumer half of main.sh:72-75: one stream can carry many
    schema versions and every record decodes by ITS writer schema.

    With ``corrupt_col`` set, decode is PERMISSIVE (Connect's
    errors.tolerance=all applied at the converter): a record that
    fails — bad magic byte, unregistered schema id, truncated body —
    yields null fields plus the error in that sidecar column (the
    same convention ``from_json`` + columnNameOfCorruptRecord uses,
    so the dlq-split machinery applies unchanged). Without it, a bad
    record raises and fails the task — fail-fast, Connect's
    errors.tolerance=none default."""
    from pyspark.sql.functions import pandas_udf

    r = json.loads(reader_schema) if isinstance(reader_schema, str) else reader_schema
    writers = {
        sid: (json.loads(s) if isinstance(s, str) else s) for sid, s in schemas_by_id.items()
    }
    names = [f["name"] for f in r["fields"]]
    ddl = avro_codec.avro_to_ddl(r)
    if corrupt_col is not None:
        ddl = ddl[: -len(">")] + f", {corrupt_col}: string>"

    def decode_one(b: bytes):
        if len(b) < HEADER_LEN or b[0] != MAGIC_BYTE:
            raise ValueError("not confluent wire format")
        sid = int.from_bytes(b[1:5], "big")
        if sid not in writers:
            raise KeyError(f"schema id {sid} not registered")
        return avro_codec.decode_record(bytes(b[HEADER_LEN:]), writers[sid], r)

    @pandas_udf(ddl)
    def dec(vals: pd.Series) -> pd.DataFrame:
        rows = []
        nulls = [None] * len(names)
        for b in vals:
            if b is None:
                # Kafka tombstone (null value on a compacted topic) —
                # a routine record, NOT corruption: null fields pass
                # through in both modes, as Connect's AvroConverter
                # does even with errors.tolerance=none.
                rows.append(nulls if corrupt_col is None else [*nulls, None])
            elif corrupt_col is None:
                rec = decode_one(b)
                rows.append([rec[n] for n in names])
            else:
                try:
                    rec = decode_one(b)
                    rows.append([rec[n] for n in names] + [None])
                except Exception as e:  # noqa: BLE001 — any decode failure routes to DLQ
                    rows.append([*nulls, f"avro-decode-failed: {e}"])
        cols = names if corrupt_col is None else [*names, corrupt_col]
        return pd.DataFrame(rows, columns=cols)

    return dec


def _none_nans(rec: dict) -> dict:
    """Normalize one pandas record for the pure-Python encoder:
    scalar NaN/NaT → None, numpy arrays (how Arrow delivers array
    columns) → lists, numpy scalars → Python scalars. A bare
    ``pd.isna`` on an ndarray raises ('truth value of an array is
    ambiguous'), so containers are branch-checked first."""
    import numpy as np

    out = {}
    for k, v in rec.items():
        if isinstance(v, np.ndarray):
            out[k] = v.tolist()
        elif isinstance(v, (list, tuple, dict, bytes, bytearray)):
            out[k] = v
        elif v is None or pd.isna(v):
            out[k] = None
        elif isinstance(v, np.generic):
            out[k] = v.item()
        else:
            out[k] = v
    return out


def _int_branches(t: Any) -> list:
    """Non-null branches of a (possibly union) avro type, with the
    verbose primitive form (``{"type": "long"}`` — valid Avro anywhere
    a type is allowed) unwrapped to its bare string so the precision
    guards recognize it."""
    branches = t if isinstance(t, list) else [t]
    out = []
    for b in branches:
        while (
            isinstance(b, dict)
            and isinstance(b.get("type"), str)
            and b["type"] not in ("array", "record", "map", "enum", "fixed", "error")
        ):
            b = b["type"]
        if b != "null":
            out.append(b)
    return out


def _nests_int(t: Any) -> bool:
    """True if an avro type contains int/long anywhere BELOW the top
    level (inside arrays / sub-records / nested unions)."""
    for b in _int_branches(t):
        if isinstance(b, dict):
            if b.get("type") == "array":
                it = b["items"]
                if any(
                    k in ("int", "long") for k in _int_branches(it) if isinstance(k, str)
                ) or any(_nests_int(k) for k in _int_branches(it) if isinstance(k, dict)):
                    return True
            elif b.get("type") == "record":
                for f in b["fields"]:
                    ft = f["type"]
                    if any(
                        k in ("int", "long")
                        for k in _int_branches(ft)
                        if isinstance(k, str)
                    ) or _nests_int(ft):
                        return True
            elif b.get("type") == "map":
                vt = b["values"]
                if any(
                    k in ("int", "long") for k in _int_branches(vt) if isinstance(k, str)
                ) or _nests_int(vt):
                    return True
    return False


def _guard_nested(t: Any, v: Any, path: str) -> None:
    """Recursive arm of the precision guard: Arrow delivers a nullable
    list<long> as a float64 ndarray (NaN for nulls) and can surface
    nested numerics as Python floats — flag any int-typed position
    whose float64 carrier is at/beyond 2^53."""
    import numpy as np

    if v is None or (not isinstance(v, (np.ndarray, list, tuple, dict)) and pd.isna(v)):
        return
    for b in _int_branches(t):
        if isinstance(b, str) and b in ("int", "long"):
            if isinstance(v, (float, np.floating)) and abs(v) >= 2**53:
                raise ValueError(
                    f"field {path}: int value beyond 2^53 arrived as float64 "
                    "(nullable nested position) — precision lost; make the value "
                    "non-null or use the JVM avro path"
                )
        elif isinstance(b, dict):
            bt = b.get("type")
            if bt == "array" and isinstance(v, (np.ndarray, list, tuple)):
                if isinstance(v, np.ndarray) and str(v.dtype) == "float64":
                    it = b["items"]
                    if any(
                        k in ("int", "long")
                        for k in _int_branches(it)
                        if isinstance(k, str)
                    ):
                        vals = v[~np.isnan(v)]
                        if (np.abs(vals) >= 2**53).any():
                            raise ValueError(
                                f"field {path}[]: int values beyond 2^53 arrived as "
                                "float64 (nullable array items) — precision lost"
                            )
                        continue
                for x in v:
                    _guard_nested(b["items"], x, f"{path}[]")
            elif bt == "record" and isinstance(v, dict):
                for f in b["fields"]:
                    _guard_nested(f["type"], v.get(f["name"]), f"{path}.{f['name']}")
            elif bt == "map" and isinstance(v, dict):
                for mk, mv in v.items():
                    _guard_nested(b["values"], mv, f"{path}[{mk!r}]")


def _int_precision_guard(schema: dict, batch: pd.DataFrame) -> None:
    """Refuse silent corruption of big ids: a nullable int/long column
    that contains any null reaches pandas as float64, which is exact
    only to 2^53 — beyond that, int(value) would round-trip the WRONG
    id with no error. Raise loudly instead; the fixes are a non-null
    column, the JVM spark-avro path, or a string carrier. Recurses
    into array/record/map positions (a nullable list<long> arrives as
    a float64 ndarray), paying the per-value walk only for fields
    whose schema nests int/long."""
    for f in schema["fields"]:
        t = f["type"]
        kinds = _int_branches(t)
        if any(k in ("int", "long") for k in kinds if isinstance(k, str)):
            name = f["name"]
            if name in batch.columns and str(batch[name].dtype) == "float64":
                # >= not >: 2^53+1 coerces to exactly 2^53.0, so the
                # boundary value itself is already untrustworthy
                bad = batch[name].dropna().abs() >= 2**53
                if bad.any():
                    raise ValueError(
                        f"field {name!r}: int values beyond 2^53 arrived as float64 "
                        "(nullable column) — precision lost; make the column non-null "
                        "or use the JVM avro path"
                    )
        if _nests_int(t) and f["name"] in batch.columns:
            for v in batch[f["name"]]:
                _guard_nested(t, v, f["name"])
