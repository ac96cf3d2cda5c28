"""Query surface: SQL views mirroring the Dgraph/GraphQL schema's graph
shape (SURVEY.md §7 step 8; dgraph/schema.graphql:1-151).

The reference exposes a property graph with @reverse edges so traversals run
both directions (dgraph/contracts.schema:96-212). Here:
  - every at-rest table becomes a named view;
  - "reverse edges" become pre-joined convenience views (the common DQL
    expansions from src/analysys/*: contract -> its deployments/destructions,
    block -> its transactions/logs, skeleton -> its functions);
  - a generic (src, dst, type) edge DataFrame feeds any graph engine
    (GraphFrames motif queries when available, plain joins otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_views(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Expose each table and the reverse-edge expansions as temp views."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)

    have = set(tables)
    if {"deployments", "destructions"} <= have:
        spark.sql(
            """
            CREATE OR REPLACE TEMP VIEW contract_lifecycle AS
            SELECT d.contract,
                   count(DISTINCT d.tx_hash)          AS deploy_count,
                   min(d.block_number)                AS first_deploy_block,
                   count(DISTINCT s.tx_hash)          AS destroy_count,
                   max(s.block_number)                AS last_destroy_block
            FROM deployments d LEFT JOIN destructions s USING (contract)
            GROUP BY d.contract
            """
        )
    if {"blocks", "transactions"} <= have:
        spark.sql(
            """
            CREATE OR REPLACE TEMP VIEW block_transactions AS
            SELECT t.*, b.timestamp AS block_timestamp, b.miner AS block_miner
            FROM blocks b JOIN transactions t ON t.block_number = b.number
            """
        )
    if {"skeletons", "abi_membership", "abi"} <= have:
        spark.sql(
            """
            CREATE OR REPLACE TEMP VIEW skeleton_functions AS
            SELECT m.skeleton_hash, a.*
            FROM abi_membership m JOIN abi a USING (signature)
            """
        )


def graph_edges(tables: dict[str, DataFrame]) -> DataFrame:
    """The uid-predicate edges of dgraph/contracts.schema as one
    (src, dst, type) DataFrame — the GraphFrames/GraphX edge input for
    multi-hop traversals (J4)."""
    parts: list[DataFrame] = []

    def edge(df: DataFrame, src, dst, kind: str):
        parts.append(
            df.select(
                F.col(src).cast("string").alias("src"),
                F.col(dst).cast("string").alias("dst"),
                F.lit(kind).alias("type"),
            ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        )

    t = tables
    if "transactions" in t:
        edge(t["transactions"], "from", "hash", "account_sent_tx")
        edge(t["transactions"], "hash", "to", "tx_to_account")
        edge(t["transactions"], "hash", "block_number", "tx_in_block")
    if "token_transfers" in t:
        edge(t["token_transfers"], "from", "to", "token_transfer")
        edge(t["token_transfers"], "contract", "tx_hash", "transfer_in_tx")
    if "deployments" in t:
        edge(t["deployments"], "creator", "contract", "deployed")
        edge(t["deployments"], "contract", "skeleton_hash", "has_skeleton")
    if "destructions" in t:
        edge(t["destructions"], "contract", "refund_address", "refunded_to")
    if "abi_membership" in t:
        edge(t["abi_membership"], "skeleton_hash", "signature", "has_abi_entry")
    if "logs" in t:
        edge(t["logs"], "address", "tx_hash", "emitted_log_in_tx")

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def two_hop(edges: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Motif (a)-[type_a]->(b)-[type_b]->(c) as a plain join — the
    GraphFrames-free traversal primitive."""
    a = edges.filter(F.col("type") == type_a).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    b = edges.filter(F.col("type") == type_b).select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    return a.join(b, "b").select("a", "b", "c")
