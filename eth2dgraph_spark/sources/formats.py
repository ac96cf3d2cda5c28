"""Batch file-format coverage: write/read roundtrips for the formats a
Spark data platform actually exchanges — ORC (builtin columnar
alternative to parquet), CSV (schema-on-read interchange), and
line-delimited JSON (the reference's own export family —
`sources/eth.py` handles its gzip-JSON contract; this module covers the
plain Spark datasource form).

The roundtrip IS the operator under test: a format that silently
mangles types, quoting, or nullability shows up as a value mismatch
when the re-read frame is aggregated against the parquet-derived
oracle. CSV pitfalls are handled explicitly: an explicit schema (CSV
has none), quoting/escaping on (documents' text is free-form), and
header=true so column order survives.

Scale note: these are plain Spark datasources — partitioned writes,
predicate pushdown (ORC), and parallel reads come for free; the helper
adds nothing on top, which is the point (no bespoke IO path to audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_read(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
) -> DataFrame:
    """Write `df` as `fmt` under `path`, read it back with the ORIGINAL
    schema enforced (CSV/JSON would otherwise re-infer types on read —
    silent long->int or string->date drift is exactly the class of bug
    the roundtrip gate exists to catch)."""
    spark: SparkSession = df.sparkSession
    writer = df.write.mode(mode)
    if fmt == "csv":
        # the four classic CSV roundtrip traps, each measured to corrupt
        # data with the defaults (tests/test_formats.py pins them all):
        # embedded newlines need multiLine on read; NULL and '' are
        # indistinguishable unless NULL gets an explicit sentinel (\\N,
        # the Hive/MySQL convention) with emptyValue keeping '' as a
        # quoted empty field; and the WRITER trims leading/trailing
        # whitespace unless told not to.
        #
        # KNOWN LIMITATION (sentinel collision, unfixable in CSV): a
        # non-null text value literally equal to '\\N' reads back as NULL.
        # Measured: Spark's reader applies nullValue AFTER unquoting, so
        # quoteAll=true does not help — a quoted "\\N" still comes back
        # NULL (tests/test_formats.py pins this too). Any sentinel scheme
        # has this collision by construction; callers whose data may
        # contain the literal sentinel should roundtrip via ORC/JSON,
        # which encode NULL structurally.
        writer = (
            writer.option("header", "true")
            .option("quote", '"')
            .option("escape", '"')
            .option("nullValue", "\\N")
            .option("emptyValue", '""')
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
        )
        writer.csv(path)
        return (
            spark.read.schema(df.schema)
            .option("header", "true")
            .option("quote", '"')
            .option("escape", '"')
            .option("multiLine", "true")
            .option("nullValue", "\\N")
            .option("emptyValue", "")
            .csv(path)
        )
    if fmt == "json":
        writer.json(path)
        return spark.read.schema(df.schema).json(path)
    if fmt == "orc":
        writer.orc(path)
        return spark.read.schema(df.schema).orc(path)
    if fmt == "parquet":
        writer.parquet(path)
        return spark.read.schema(df.schema).parquet(path)
    raise ValueError(f"unsupported format: {fmt}")
