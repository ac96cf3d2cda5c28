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

    if not parts:
        known = (
            "transactions, token_transfers, deployments, destructions, "
            "abi_membership, logs"
        )
        raise ValueError(
            f"graph_edges: none of the edge-producing tables present in "
            f"{sorted(tables)} (expected at least one of: {known})"
        )
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


_MOTIF_TERM = r"\(\s*(\w+)\s*\)\s*-\s*\[\s*(\w*)\s*\]\s*->\s*\(\s*(\w+)\s*\)"


def motif(
    edges: DataFrame, pattern: str, use_graphframes: bool | None = None
) -> DataFrame:
    """General motif finder over a (src, dst, type) edge frame — the
    Dgraph-traversal parity seam (dgraph/schema.graphql reverse edges; the
    reference's DQL expansions are fixed 1-2 hop motifs).

    `pattern` is GraphFrames-flavored, with the edge slot naming the edge
    TYPE instead of an output alias: terms `(a)-[deployed]->(b)` separated
    by `;`, empty type (`(a)-[]->(b)`) matching any edge, repeated vertex
    variables expressing equality constraints. Result columns are the
    vertex variables in first-appearance order; row multiplicity follows
    edge multiplicity (no implicit distinct), matching `two_hop`.

    Implementation is plain joins — one filtered edge scan per term, joined
    on shared variables (Catalyst reorders; AQE broadcasts the small
    sides). When GraphFrames is importable (or `use_graphframes=True`), the
    same pattern is delegated to `GraphFrame.find` with type post-filters,
    so clusters that ship GraphFrames get its motif planner for free.
    Disconnected patterns are an error, not a silent cross join."""
    import re

    terms: list[tuple[str, str, str]] = []
    for part in pattern.split(";"):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(_MOTIF_TERM, part)
        if not m:
            raise ValueError(f"unparseable motif term: {part!r}")
        terms.append((m.group(1), m.group(2), m.group(3)))
    if not terms:
        raise ValueError("empty motif pattern")

    var_order: list[str] = []
    for sv, _, dv in terms:
        for v in (sv, dv):
            if v not in var_order:
                var_order.append(v)

    if use_graphframes is None:
        try:
            import graphframes  # noqa: F401

            use_graphframes = True
        except ImportError:
            use_graphframes = False
    if use_graphframes:
        return _motif_graphframes(edges, terms, var_order)

    result: DataFrame | None = None
    for sv, etype, dv in terms:
        t = edges
        if etype:
            t = t.filter(F.col("type") == etype)
        if sv == dv:  # self-loop term: one output column
            t = t.filter(F.col("src") == F.col("dst")).select(F.col("src").alias(sv))
        else:
            t = t.select(F.col("src").alias(sv), F.col("dst").alias(dv))
        if result is None:
            result = t
        else:
            shared = [c for c in t.columns if c in result.columns]
            if not shared:
                raise ValueError(
                    f"motif term ({sv})-[{etype}]->({dv}) shares no variable "
                    "with the preceding terms — disconnected patterns are not "
                    "supported (that would be a cross join)"
                )
            result = result.join(t, shared)
    return result.select(*var_order)


def _motif_graphframes(edges: DataFrame, terms, var_order) -> DataFrame:
    """GraphFrames delegation: translate typed terms to named-edge terms,
    post-filter each edge's relationship, project vertex ids."""
    from graphframes import GraphFrame

    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    e = edges.select("src", "dst", F.col("type").alias("relationship"))
    g = GraphFrame(verts, e)
    # edge aliases must not collide with the user's vertex variables (a
    # pattern like '(e0)-[deployed]->(b)' would otherwise bind e0 as both
    # vertex and edge): extend the prefix until it is free
    prefix = "e"
    while any(v.startswith(prefix) and v[len(prefix):].isdigit() for v in var_order):
        prefix = "_" + prefix
    pat = "; ".join(f"({sv})-[{prefix}{i}]->({dv})" for i, (sv, _, dv) in enumerate(terms))
    r = g.find(pat)
    for i, (_, etype, _dv) in enumerate(terms):
        if etype:
            r = r.filter(F.col(f"{prefix}{i}.relationship") == etype)
    return r.select(*[F.col(f"{v}.id").alias(v) for v in var_order])
