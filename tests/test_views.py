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


def test_motif_equals_two_hop(spark):
    from eth2dgraph_spark.plans.views import motif

    rows = [
        ("u1", "c1", "deployed"),
        ("u1", "c2", "deployed"),
        ("c1", "k1", "has_skeleton"),
        ("c2", "k1", "has_skeleton"),
        ("c1", "u9", "refunded_to"),  # different type: must not match
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, type string")
    via_motif = motif(
        edges, "(a)-[deployed]->(b); (b)-[has_skeleton]->(c)", use_graphframes=False
    )
    via_two_hop = two_hop(edges, "deployed", "has_skeleton")
    assert via_motif.columns == ["a", "b", "c"]
    assert sorted(map(tuple, via_motif.collect())) == sorted(
        map(tuple, via_two_hop.collect())
    )


def test_motif_untyped_repeated_vars_and_errors(spark):
    from eth2dgraph_spark.plans.views import motif

    rows = [
        ("a", "b", "t1"),
        ("b", "a", "t2"),  # closes the 2-cycle
        ("b", "c", "t1"),
        ("x", "x", "t1"),  # self loop
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, type string")
    # untyped edges + repeated variable: directed 2-cycles (v)-[]->(w)-[]->(v)
    cyc = motif(edges, "(v)-[]->(w); (w)-[]->(v)", use_graphframes=False).collect()
    got = sorted((r["v"], r["w"]) for r in cyc)
    assert got == [("a", "b"), ("b", "a"), ("x", "x")]
    # self-loop term
    loops = motif(edges, "(v)-[t1]->(v)", use_graphframes=False).collect()
    assert [r["v"] for r in loops] == ["x"]
    with pytest.raises(ValueError, match="disconnected"):
        motif(edges, "(a)-[]->(b); (c)-[]->(d)", use_graphframes=False)
    with pytest.raises(ValueError, match="unparseable"):
        motif(edges, "a->b", use_graphframes=False)


def test_motif_graphframes_delegation_with_fake(spark, monkeypatch):
    # the container has no GraphFrames; exercise the delegation path
    # (pattern translation, per-edge relationship filters, vertex
    # projection) against a faithful mini-implementation of find()
    import re
    import sys
    import types

    from eth2dgraph_spark.plans.views import motif

    class FakeGraphFrame:
        def __init__(self, v, e):
            self.v, self.e = v, e

        def find(self, pattern):
            out = None
            for term in pattern.split(";"):
                sv, en, dv = re.fullmatch(
                    r"\((\w+)\)-\[(\w+)\]->\((\w+)\)", term.strip()
                ).groups()
                t = self.e.select(
                    F.struct(F.col("src").alias("id")).alias(sv),
                    F.struct("src", "dst", "relationship").alias(en),
                    F.struct(F.col("dst").alias("id")).alias(dv),
                )
                if out is None:
                    out = t
                else:
                    shared = [c for c in t.columns if c in out.columns]
                    out = out.join(t, shared)
            return out

    monkeypatch.setitem(
        sys.modules, "graphframes", types.SimpleNamespace(GraphFrame=FakeGraphFrame)
    )
    rows = [
        ("u1", "c1", "deployed"),
        ("c1", "k1", "has_skeleton"),
        ("c1", "u9", "refunded_to"),
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, type string")
    pat = "(a)-[deployed]->(b); (b)-[has_skeleton]->(c)"
    via_gf = motif(edges, pat, use_graphframes=True)
    via_join = motif(edges, pat, use_graphframes=False)
    assert via_gf.columns == via_join.columns == ["a", "b", "c"]
    assert sorted(map(tuple, via_gf.collect())) == sorted(map(tuple, via_join.collect()))
