"""Schemas: the reference LogEvent record and the driver testdata tables.

LOG_SCHEMA mirrors the reference POJO
(/root/reference/src/main/java/com/lokesh/streams/KafkaStreamsApplication.java:26-42):
a flat record with one nullable nested ``exception`` struct whose
``exception_class`` is the dedup key (KStreamDistinct.java:148). The wire
format is JSON (JsonSerializer.java / JsonDeserializer.java), which maps
to from_json/to_json here.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

EXCEPTION_SCHEMA = StructType(
    [
        StructField("exception_class", StringType()),
        StructField("exception_message", StringType()),
        StructField("stacktrace", StringType()),
    ]
)

LOG_SCHEMA = StructType(
    [
        StructField("version", IntegerType()),
        StructField("source_host", StringType()),
        StructField("message", StringType()),
        StructField("thread_name", StringType()),
        # A string in the wire format, NOT a typed timestamp
        # (KafkaStreamsApplicationTest.java:64); event time comes from the
        # Kafka record timestamp, not this field (KStreamDistinct.java:87).
        StructField("timestamp", StringType()),
        StructField("level", StringType()),
        StructField("logger_name", StringType()),
        StructField("exception", EXCEPTION_SCHEMA),
    ]
)

# DDL form, convenient for from_json in SQL strings.
LOG_SCHEMA_DDL = LOG_SCHEMA.simpleString()[len("struct<") : -1]

# events.props payload schema (TESTDATA events table).
PROPS_SCHEMA_DDL = "k INT"

# Driver-generated testdata tables (TESTDATA.md / FIXTURES.md §3-4).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as TIMESTAMP(NANOS) in the driver parquet; Spark reads
# them as long (see session.py nanosAsLong) and sources.tables converts
# to TimestampType by truncating ns → µs (identical to DuckDB's
# CAST(ts_ns AS TIMESTAMP)).
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}
