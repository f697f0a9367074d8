"""JSON converter — §2.C2 (SURVEY.md).

The schemaless JsonConverter (reference main.sh:78-81) maps to
`from_json`/`to_json`/`get_json_object`. PERMISSIVE parsing gives the
DLQ split (§2.F3): records whose payload fails to parse are routed to
an error sink instead of poisoning the pipeline — the Spark analog of
`errors.tolerance=all` + dead-letter topic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType


def parse_json(col: Column | str, schema: str) -> Column:
    """PERMISSIVE parse — never throws. NB: malformed input yields a
    struct of nulls (NOT a null struct); use ``dlq_split`` when you
    need to distinguish corrupt payloads from legitimately-null
    fields."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def to_json_value(*cols: str) -> Column:
    return F.to_json(F.struct(*cols))


def dlq_split(df: DataFrame, json_col: str, schema: str) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, dead-letter). Valid rows carry the parsed
    struct; DLQ rows carry the raw payload + an error tag, mirroring
    Connect's DLQ headers.

    PERMISSIVE ``from_json`` returns a struct of nulls for malformed
    input, so ``IS NOT NULL`` on the struct cannot detect corruption —
    we append a corrupt-record sidecar field, which Spark populates
    with the raw payload iff parsing failed. Null payloads (Connect
    tombstones) also route to the DLQ side here."""
    full = StructType.fromDDL(schema).add("_corrupt_record", StringType())
    parsed = df.withColumn(
        "__parsed",
        F.from_json(F.col(json_col), full, {"columnNameOfCorruptRecord": "_corrupt_record"}),
    )
    ok = F.col("__parsed._corrupt_record").isNull() & F.col(json_col).isNotNull()
    valid = parsed.filter(ok).withColumn(
        "__parsed", F.col("__parsed").dropFields("_corrupt_record")
    )
    dlq = parsed.filter(~ok).drop("__parsed").withColumn("__error", F.lit("json-parse-failed"))
    return valid, dlq
