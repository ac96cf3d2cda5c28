"""Readers for the driver's deterministic synthetic tables (TESTDATA.md).

Parquet scans: schema comes from the footer, filters and column pruning are
pushed down by Catalyst (check .explain for PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _fix_nanos(df: DataFrame) -> DataFrame:
    """Normalize events.ts to one session-TZ TIMESTAMP no matter how the
    driver wrote the parquet. Seen in the wild across driver versions:

    - TIMESTAMP(NANOS): with spark.sql.legacy.parquet.nanosAsLong it reads as
      long ns-since-epoch — convert with integer division (ns magnitudes
      overflow double precision, so no float math here).
    - timestamp[us] without isAdjustedToUTC: reads as TIMESTAMP_NTZ, which
      time-zone-aware functions (unix_micros, ...) reject — cast to TIMESTAMP.
      The session TZ is pinned UTC (session.py), so the cast is identity on
      the wall-clock values and matches the DuckDB oracle's naive reading.
    - plain TIMESTAMP: pass through.
    """
    if "ts" in df.columns:
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:  # runtime-settable SQL conf; the caller's session may not have it
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — conf locked down: proceed, non-ns tables still read
        pass


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_nanos_conf(spark)
    return _fix_nanos(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming read of a testdata table (file source). Schema comes from a
    batch footer read (streams can't infer), and the same ts normalization
    as the batch path applies — stream and batch consumers see one type.
    The nanosAsLong conf is set here too: a fresh session that never called
    read_table would otherwise fail the schema read outright on a
    TIMESTAMP(NANOS) file."""
    _ensure_nanos_conf(spark)
    raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # the file stream source requires a DIRECTORY base path; select just this
    # table's file(s) out of the shared dir with a glob filter
    stream = (
        spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    return _fix_nanos(stream)


def load_testdata(
    spark: SparkSession, sf_dir: str | None = None, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return {t: read_table(spark, sf_dir, t) for t in tables}


def register_testdata_views(
    spark: SparkSession, sf_dir: str | None = None, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so spark.sql() queries run on it."""
    dfs = load_testdata(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
