"""Contract-lifetime analytics RQ1-RQ4 (SURVEY.md §2.5 A8-A11, §2.4 J8).

Reference semantics (src/analysys/lifetimes.rs):
  - RQ1 (:65-82): how many contracts were destroyed at least once vs never.
  - RQ2 (:84-104): of destroyed contracts, destroyed exactly once vs multiple.
  - RQ3 (:106-157): deploy+destroy pairs in the same block / same tx — pair
    count and distinct-contract count.
  - RQ4 (:159-294): lifetime = max(destruction block) - min(deploy block)
    (and the same in seconds from datetimes); mean + population stddev.

Spark-first: everything is groupBy/join on `contract` — one shuffle key reused
across all four questions. The reference streams the whole graph to one
machine and folds with rayon; here each RQ is a distributed agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_contract_lifecycle(deployments: DataFrame, destructions: DataFrame) -> DataFrame:
    """One row per contract: deploy/destroy counts and block extrema (W3)."""
    dep = deployments.groupBy("contract").agg(
        F.count(F.lit(1)).alias("deploy_count"),
        F.min("block_number").alias("first_deploy_block"),
        F.max("block_number").alias("last_deploy_block"),
    )
    des = destructions.groupBy("contract").agg(
        F.count(F.lit(1)).alias("destroy_count"),
        F.min("block_number").alias("first_destroy_block"),
        F.max("block_number").alias("last_destroy_block"),
    )
    return dep.join(des, "contract", "left").fillna(0, ["destroy_count"])


def rq1_destroyed_vs_not(lifecycle: DataFrame) -> DataFrame:
    return lifecycle.agg(
        F.count(F.when(F.col("destroy_count") > 0, 1)).alias("destroyed"),
        F.count(F.when(F.col("destroy_count") == 0, 1)).alias("never_destroyed"),
    )


def rq2_destroyed_once_vs_multiple(lifecycle: DataFrame) -> DataFrame:
    return lifecycle.filter(F.col("destroy_count") > 0).agg(
        F.count(F.when(F.col("destroy_count") == 1, 1)).alias("destroyed_once"),
        F.count(F.when(F.col("destroy_count") > 1, 1)).alias("destroyed_multiple"),
    )


def rq3_same_block_tx(deployments: DataFrame, destructions: DataFrame) -> DataFrame:
    """J8/A10: deploy x destroy pairs per contract, same-block and same-tx."""
    dep = deployments.select("contract", F.col("block_number").alias("dep_block"), F.col("tx_hash").alias("dep_tx"))
    des = destructions.select("contract", F.col("block_number").alias("des_block"), F.col("tx_hash").alias("des_tx"))
    pairs = dep.join(des, "contract")
    same_block = pairs.filter(F.col("dep_block") == F.col("des_block"))
    same_tx = pairs.filter(F.col("dep_tx") == F.col("des_tx"))
    return same_block.agg(
        F.count(F.lit(1)).alias("same_block_pairs"),
        F.countDistinct("contract").alias("same_block_contracts"),
    ).crossJoin(
        same_tx.agg(
            F.count(F.lit(1)).alias("same_tx_pairs"),
            F.countDistinct("contract").alias("same_tx_contracts"),
        )
    )


def rq4_lifetime_stats(lifecycle: DataFrame, blocks: DataFrame | None = None) -> DataFrame:
    """A11: avg + stddev_pop of (max destroy block - min deploy block) over
    destroyed contracts; if `blocks` given, also in seconds via timestamps."""
    destroyed = lifecycle.filter(F.col("destroy_count") > 0).withColumn(
        "lifetime_blocks", F.col("last_destroy_block") - F.col("first_deploy_block")
    )
    out = destroyed.agg(
        F.avg("lifetime_blocks").alias("avg_lifetime_blocks"),
        F.stddev_pop("lifetime_blocks").alias("stddev_lifetime_blocks"),
    )
    if blocks is not None:
        ts = blocks.select(F.col("number").alias("_bn"), F.col("timestamp").alias("_ts"))
        with_ts = (
            destroyed.join(ts.withColumnRenamed("_ts", "_dep_ts"), destroyed["first_deploy_block"] == ts["_bn"])
            .drop("_bn")
            .join(
                ts.withColumnRenamed("_ts", "_des_ts"),
                F.col("last_destroy_block") == ts["_bn"],
            )
            .withColumn("lifetime_secs", F.col("_des_ts") - F.col("_dep_ts"))
        )
        secs = with_ts.agg(
            F.avg("lifetime_secs").alias("avg_lifetime_secs"),
            F.stddev_pop("lifetime_secs").alias("stddev_lifetime_secs"),
        )
        out = out.crossJoin(secs)
    return out
