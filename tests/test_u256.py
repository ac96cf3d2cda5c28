"""Exact U256 arithmetic tests (SURVEY.md hard part (a))."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth2dgraph_spark.functions.u256 import sum_u256, to_decimal38, wei_to_eth

BIG = 2**200  # far beyond Decimal(38)


def test_to_decimal38_overflow_flag(spark):
    df = spark.createDataFrame([("123",), (str(BIG),), (str(10**38 - 1),)], "v string")
    dec, ovf = to_decimal38(F.col("v"))
    rows = df.select(dec.alias("d"), ovf.alias("o")).collect()
    assert rows[0]["d"] == 123 and rows[0]["o"] is False
    assert rows[1]["d"] is None and rows[1]["o"] is True
    assert rows[2]["o"] is False


def test_sum_u256_global_exact(spark):
    vals = [str(BIG), str(BIG + 1), "5", str(2**255)]
    df = spark.createDataFrame([(v,) for v in vals], "value string").repartition(3)
    got = sum_u256(df, "value").collect()[0]["sum"]
    assert int(got) == 2 * BIG + 6 + 2**255  # exact, beyond any native type


def test_sum_u256_grouped_exact(spark):
    rows = [("a", str(BIG)), ("a", "7"), ("b", str(2**130)), ("b", None)]
    df = spark.createDataFrame(rows, "g string, value string")
    got = {r["g"]: int(r["sum"]) for r in sum_u256(df, "value", ["g"]).collect()}
    assert got["a"] == BIG + 7
    assert got["b"] == 2**130


def test_wei_to_eth(spark):
    df = spark.createDataFrame([(str(10**18),)], "v string")
    assert df.select(wei_to_eth(F.col("v")).alias("e")).collect()[0]["e"] == 1.0
