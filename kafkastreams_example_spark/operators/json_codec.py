"""JSON codec — S2/E1 of the reference surface, as expressions.

The reference does serde-level JSON (JsonSerializer.java:22-31,
JsonDeserializer.java:26-38, Jackson). Spark-first, the codec is an
expression pair (from_json / to_json) that participates in Catalyst:
decode prunes to only referenced struct fields, encode fuses into the
projection feeding the sink — both stay inside whole-stage codegen, no
Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def json_decode(
    df: DataFrame,
    col: str,
    schema: StructType | str,
    out: str = "decoded",
) -> DataFrame:
    """bytes/str JSON column → typed struct column.

    PERMISSIVE: malformed rows decode to null (vs Jackson's throw —
    JsonDeserializer.java:33-34); callers dead-letter on null.
    """
    return df.withColumn(out, F.from_json(F.col(col).cast("string"), schema))


def json_encode(df: DataFrame, cols: list[str | Column], out: str = "value") -> DataFrame:
    """typed columns → compact JSON string column (Jackson-compatible)."""
    struct_cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.withColumn(out, F.to_json(F.struct(*struct_cols)))
