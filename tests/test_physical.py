"""Physical-layout levers: bucketed joins drop the exchange; salted joins
and aggs preserve results while spreading hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.plans.physical import (
    read_bucketed,
    salted_agg_count,
    salted_join,
    write_bucketed,
)

from .test_plans import plan_of


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_txs_b", "t_logs_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)  # orphaned location
    txs = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("block_number"), F.col("id").alias("tx_id")
    )
    logs = spark.range(0, 20_000).select(
        (F.col("id") % 500).alias("block_number"), F.col("id").alias("log_id")
    )
    write_bucketed(txs, "t_txs_b", ["block_number"], num_buckets=8)
    write_bucketed(logs, "t_logs_b", ["block_number"], num_buckets=8)
    yield "t_txs_b", "t_logs_b"


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # force the shuffle-join path (tiny test tables would broadcast, which
    # sidesteps bucketing; at real fact-fact sizes broadcast is off the table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, b = read_bucketed(spark, ta), read_bucketed(spark, tb)
        joined = a.join(b, "block_number")
        p = plan_of(joined, "simple")
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert "Exchange" not in p  # co-bucketed: shuffle paid at write time
        assert "Bucketed: true" in p
        assert joined.count() == 400_000  # 500 keys * 20 * 40
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for i in range(50) for k in ("hot", f"k{i}")], "key string, lv long"
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k3", 2), ("k7", 3)], "key string, rv long"
    )
    plain = left.join(right, "key").select("key", "lv", "rv")
    salted = salted_join(left, right, "key", salt=4).select("key", "lv", "rv")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], "key string, lv long")
    right = spark.createDataFrame([("a", 10)], "key string, rv long")
    got = {r["key"]: r["rv"] for r in salted_join(left, right, "key", salt=3, how="left").collect()}
    assert got == {"a": 10, "b": None}


def test_salted_agg_count_matches_plain(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["hot"] * 1000 + ["a", "b", "a"]], "key string"
    )
    plain = {r["key"]: r["count"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("count")).collect()}
    salted = {r["key"]: r["count"] for r in salted_agg_count(df, ["key"], salt=8).collect()}
    assert salted == plain == {"hot": 1000, "a": 2, "b": 1}
