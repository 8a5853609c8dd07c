"""Batch parquet sources for the driver testdata tables.

At 100 TB these reads stay efficient because everything downstream is
declarative: Catalyst pushes filters and prunes columns into the parquet
scan (verify with .explain → PushedFilters / ReadSchema), and
spark.sql.files.maxPartitionBytes controls split sizing. The only
engine-specific wrinkle is the ns-timestamp conversion below, which is a
cheap per-row projection fused into the scan stage by whole-stage
codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import NANO_TS_COLUMNS, TABLE_NAMES


def ensure_session_confs(spark: SparkSession) -> None:
    """Defensively apply the runtime-settable confs correctness depends
    on, for sessions we did not build (e.g. an external driver's):
    ns-parquet reads fail outright without nanosAsLong, µs/ms NTZ
    parquet (isAdjustedToUTC=false) would otherwise surface as
    TIMESTAMP_NTZ which half the engine's epoch arithmetic rejects,
    and a non-UTC session timezone shifts every date_format output."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing timestamp columns to
    TIMESTAMP (LTZ, µs) regardless of physical encoding.

    At 100 TB the engine meets parquet written by many writers, so the
    loader normalizes by *inspecting the dtype that arrived*, never by
    assuming one historical format:

    - ``bigint``        → TIMESTAMP(NANOS) read via nanosAsLong; integer
                          `div` 1000 to µs (matches DuckDB's CAST exactly)
    - ``timestamp_ntz`` → plain µs/ms parquet with isAdjustedToUTC=false
                          (belt-and-braces: inferTimestampNTZ=false above
                          already prevents this for reads through our
                          session confs); NTZ→LTZ cast is exact under the
                          UTC session timezone
    - ``timestamp``     → passthrough
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in NANO_TS_COLUMNS.get(name, ()):
        if col not in df.columns:
            continue
        dtype = dict(df.dtypes)[col]
        if dtype == "bigint":
            # integer `div`, NOT floor(x/1000): the double division loses
            # exactness at ns magnitudes (≥2^52) and can round a
            # timestamp up by 1 µs before the floor
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
