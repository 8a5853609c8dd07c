"""File sources beyond parquet: schema-enforced CSV and JSON-lines
loaders with dead-letter capture.

Both run PERMISSIVE with a `_corrupt_record` column so malformed rows
are routed, not thrown — the same dead-letter discipline as the Kafka
codec path (sources/kafka.py). Schemas are explicit: schema inference
is a full extra pass over the data and non-deterministic under
evolution, both unacceptable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType | str, spark: SparkSession) -> StructType:
    if isinstance(schema, str):
        schema = spark.createDataFrame([], schema).schema
    from pyspark.sql.types import StringType, StructField

    if CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    return schema


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> tuple[DataFrame, DataFrame]:
    """(good, dead) split over a JSON-lines dataset."""
    df = spark.read.schema(_with_corrupt(schema, spark)).option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    ).json(path)
    df = df.cache()  # corrupt-record split reads the source twice otherwise
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, dead


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """(good, dead) split over a CSV dataset."""
    df = (
        spark.read.schema(_with_corrupt(schema, spark))
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, dead
