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


def parse_json(col: Column | str, schema: str) -> Column:
    """PERMISSIVE parse: null on malformed input (never throws)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def to_json_value(*cols: str) -> Column:
    return F.to_json(F.struct(*cols))


def dlq_split(df: DataFrame, json_col: str, schema: str) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, dead-letter). Valid rows carry the parsed
    struct; DLQ rows carry the raw payload + an error tag, mirroring
    Connect's DLQ headers."""
    parsed = df.withColumn("__parsed", parse_json(json_col, schema))
    valid = parsed.filter(F.col("__parsed").isNotNull())
    dlq = (
        parsed.filter(F.col("__parsed").isNull())
        .drop("__parsed")
        .withColumn("__error", F.lit("json-parse-failed"))
    )
    return valid, dlq
