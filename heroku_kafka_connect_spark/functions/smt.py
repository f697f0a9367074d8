"""Single-message-transform (SMT) library — §2.D of SURVEY.md.

Kafka Connect ships a fixed set of per-record transforms
(org.apache.kafka.connect.transforms.*, installed with the base image
at reference Dockerfile:4 and configured per-connector via the JSON in
CONNECTOR_${name} env vars, reference main.sh:148-159). Each is a pure
record→record function, so the Spark-native expression is a narrow
(shuffle-free) projection: every transform here compiles into Column
expressions that stay inside whole-stage codegen. A chain of any
number of SMTs is still one narrow stage — embarrassingly parallel at
any scale, exactly like Connect's task model but columnar.

All functions take and return DataFrames so they compose:
    df |> cast_fields |> mask_field |> regex_router ...
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cast_fields(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """D1 `Cast`: cast named fields to target Spark SQL types."""
    return df.withColumns({name: F.col(name).cast(t) for name, t in casts.items()})


def extract_field(df: DataFrame, struct_col: str, field: str, alias: str | None = None) -> DataFrame:
    """D2 `ExtractField`: pull one field out of a struct column."""
    return df.withColumn(alias or field, F.col(f"{struct_col}.{field}"))


def filter_records(df: DataFrame, predicate: Column, *, keep: bool = True) -> DataFrame:
    """D3 `Filter` (+ predicates): keep or drop matching records."""
    return df.filter(predicate if keep else ~predicate)


def record_is_tombstone(value_col: str = "value") -> Column:
    """D3 predicate `RecordIsTombstone`: null value payload."""
    return F.col(value_col).isNull()


def topic_name_matches(pattern: str, topic_col: str = "topic") -> Column:
    """D3 predicate `TopicNameMatches`."""
    return F.col(topic_col).rlike(pattern)


def flatten(df: DataFrame, struct_col: str, delimiter: str = "_") -> DataFrame:
    """D4 `Flatten`: explode a (possibly nested) struct column into
    top-level `a_b` columns; drops the struct column."""
    schema = df.schema[struct_col].dataType

    def leaves(prefix: list[str], dtype) -> list[tuple[str, str]]:
        out = []
        for f in dtype.fields:
            path = prefix + [f.name]
            if hasattr(f.dataType, "fields"):
                out.extend(leaves(path, f.dataType))
            else:
                out.append((".".join([struct_col] + path), delimiter.join(path)))
        return out

    cols = [c for c in df.columns if c != struct_col]
    flat = [F.col(src).alias(f"{struct_col}{delimiter}{name}") for src, name in leaves([], schema)]
    return df.select(*cols, *flat)


def hoist_field(df: DataFrame, cols: Sequence[str], hoisted_name: str) -> DataFrame:
    """D5 `HoistField`: wrap column(s) into a single struct column."""
    keep = [c for c in df.columns if c not in set(cols)]
    return df.select(*keep, F.struct(*cols).alias(hoisted_name))


def insert_field(df: DataFrame, name: str, value: Column) -> DataFrame:
    """D6 `InsertField`: add a static field or record metadata
    (topic/partition/offset/timestamp come in as Column exprs)."""
    return df.withColumn(name, value)


def mask_field(
    df: DataFrame, col: str, replacement=None, *, hash_with_sha256: bool = False
) -> DataFrame:
    """D7 `MaskField`: null/zero/replacement masking, or a SHA-256
    pseudonymization variant (masked-but-joinable)."""
    if hash_with_sha256:
        return df.withColumn(col, F.sha2(F.col(col).cast("string"), 256))
    return df.withColumn(col, F.lit(replacement).cast(df.schema[col].dataType))


def regex_router(df: DataFrame, route_col: str, pattern: str, replacement: str) -> DataFrame:
    """D8 `RegexRouter`: rewrite the routing column by regex."""
    return df.withColumn(route_col, F.regexp_replace(F.col(route_col), pattern, replacement))


def replace_field(
    df: DataFrame,
    renames: Mapping[str, str] | None = None,
    include: Sequence[str] | None = None,
    exclude: Sequence[str] | None = None,
) -> DataFrame:
    """D9 `ReplaceField`: rename / include / exclude fields."""
    cols = list(df.columns)
    if include is not None:
        cols = [c for c in cols if c in set(include)]
    if exclude is not None:
        cols = [c for c in cols if c not in set(exclude)]
    renames = renames or {}
    return df.select(*[F.col(c).alias(renames.get(c, c)) for c in cols])


def timestamp_converter(
    df: DataFrame, col: str, target: str, fmt: str = "yyyy-MM-dd HH:mm:ss", alias: str | None = None
) -> DataFrame:
    """D11 `TimestampConverter`: convert between unix epoch, formatted
    string, Timestamp and Date representations."""
    src = F.col(col)
    out = alias or col
    if target == "unix":
        conv = F.unix_timestamp(src)
    elif target == "unix_micros":
        conv = F.unix_micros(src)
    elif target == "string":
        conv = F.date_format(src, fmt)
    elif target == "date":
        conv = F.to_date(src)
    elif target == "timestamp":
        conv = F.to_timestamp(src, fmt) if dict(df.dtypes)[col] == "string" else src.cast("timestamp")
    else:
        raise ValueError(f"unknown TimestampConverter target: {target}")
    return df.withColumn(out, conv)


def timestamp_router(
    df: DataFrame, route_col: str, ts_col: str, fmt: str = "yyyyMMdd", sep: str = "-"
) -> DataFrame:
    """D12 `TimestampRouter`: suffix the route with the record
    timestamp — the batch analog of time-bucketed file rollover
    (Camel SFTP sink behavior, reference Dockerfile:46-59)."""
    return df.withColumn(route_col, F.concat(F.col(route_col), F.lit(sep), F.date_format(F.col(ts_col), fmt)))


def value_to_key(df: DataFrame, fields: Sequence[str], key_col: str = "key") -> DataFrame:
    """D13 `ValueToKey`: build the record key from value fields."""
    return df.withColumn(key_col, F.struct(*fields))


# ---- D14 header ops (headers modeled as map<string,string>) ----


def ensure_headers(df: DataFrame, headers_col: str = "headers") -> DataFrame:
    if headers_col not in df.columns:
        df = df.withColumn(headers_col, F.create_map().cast("map<string,string>"))
    return df


def insert_header(df: DataFrame, key: str, value: Column, headers_col: str = "headers") -> DataFrame:
    """D14 `InsertHeader`: add/overwrite one header."""
    df = ensure_headers(df, headers_col)
    return df.withColumn(
        headers_col,
        F.map_concat(
            F.map_filter(F.col(headers_col), lambda k, _: k != F.lit(key)),
            F.create_map(F.lit(key), value.cast("string")),
        ),
    )


def header_from(df: DataFrame, field: str, header_key: str, headers_col: str = "headers") -> DataFrame:
    """D14 `HeaderFrom` (copy mode): copy a record field into a header."""
    return insert_header(df, header_key, F.col(field), headers_col)


def drop_headers(df: DataFrame, keys: Sequence[str], headers_col: str = "headers") -> DataFrame:
    """D14 `DropHeaders`: remove named headers."""
    df = ensure_headers(df, headers_col)
    dropped = set(keys)
    return df.withColumn(
        headers_col,
        F.map_filter(F.col(headers_col), lambda k, _: ~k.isin(*dropped)),
    )


def set_schema_metadata(df: DataFrame, name: str) -> DataFrame:
    """D10 `SetSchemaMetadata`: rename the record schema. Spark plans
    carry no user-facing schema name; the analog is a subquery alias —
    zero data effect (asserted in tests), visible to SQL as the
    relation name."""
    return df.alias(name)
