"""Query-surface tests: SQL views + graph edge layer (SURVEY.md §7 step 8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.operators.extract import extract_all
from eth2dgraph_spark.plans.views import graph_edges, register_views, two_hop

from .fixtures import make_chain


@pytest.fixture(scope="module")
def warehouse(spark):
    blocks, txs, logs, traces = make_chain(spark, n_blocks=8, txs_per_block=6)
    return extract_all(blocks, txs, logs, traces).as_dict()


def test_register_views_sql_queryable(spark, warehouse):
    register_views(spark, warehouse)
    n = spark.sql("SELECT count(*) AS n FROM transactions").collect()[0]["n"]
    assert n == warehouse["transactions"].count()
    lc = spark.sql("SELECT * FROM contract_lifecycle")
    assert {"contract", "deploy_count", "destroy_count"} <= set(lc.columns)
    bt = spark.sql(
        "SELECT block_number, count(*) AS c FROM block_transactions GROUP BY 1"
    )
    assert bt.count() == warehouse["blocks"].count()
    sf = spark.sql("SELECT * FROM skeleton_functions WHERE type='function'")
    assert sf.count() == warehouse["abi_membership"].count()


def test_graph_edges_and_two_hop(spark, warehouse):
    edges = graph_edges(warehouse)
    kinds = {r["type"] for r in edges.select("type").distinct().collect()}
    assert {"deployed", "has_skeleton", "has_abi_entry", "account_sent_tx"} <= kinds
    # creator -[deployed]-> contract -[has_skeleton]-> skeleton
    hops = two_hop(edges, "deployed", "has_skeleton")
    assert hops.count() == warehouse["deployments"].filter(
        F.col("skeleton_hash").isNotNull() & F.col("creator").isNotNull()
    ).count()
