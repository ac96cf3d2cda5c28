"""RPC enrichment seam (S9/U3): resolve `name()` for deployed contracts.

Reference behavior (src/models/contract_deployment.rs:118-156): for every
deployment whose bytecode exposes the `name()` selector (0x06fdde03), issue
an `eth_call`, ABI-decode the returned string, and store it on the
deployment row.

Spark-first shape: a `mapInPandas` stage over DISTINCT contract addresses
(dedup-before-UDF, same pattern as the decompiler seam), with a pluggable
batched resolver `list[str] -> list[str | None]` so the RPC client (with
its retry/backoff, SURVEY §4) stays outside the engine. The default
resolver raises: a live JSON-RPC endpoint is an ingestion-time dependency,
exactly like the heimdall binary (functions/decompile.py). Tests inject a
deterministic fake.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NAME_SELECTOR = "06fdde03"  # keccak("name()")[0:4]

Resolver = Callable[[list[str]], list["str | None"]]


def _default_resolver(addresses: list[str]) -> list["str | None"]:
    raise NotImplementedError(
        "name() resolution needs a live JSON-RPC endpoint; inject a batched "
        "resolver(addresses) -> names (see src/models/contract_deployment.rs:118-156)"
    )


def resolve_names(
    deployments: DataFrame,
    resolver: Resolver = _default_resolver,
    batch_size: int = 128,
    bytecode_col: str = "deployed_bytecode",
) -> DataFrame:
    """Left-join a (contract, name) frame resolved via batched RPC onto the
    deployments. Only contracts whose bytecode contains the name() selector
    are called (the reference's same pre-filter), and each DISTINCT address
    is called once — the RPC fan-out is bounded by distinct contracts, not
    rows."""
    candidates = deployments
    if bytecode_col in deployments.columns:
        candidates = candidates.filter(F.col(bytecode_col).contains(NAME_SELECTOR))
    addrs = candidates.select(F.col("contract")).distinct()

    out_schema = "contract string, name string"

    def call_batches(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            names: list[str | None] = []
            a = pdf["contract"].tolist()
            for i in range(0, len(a), batch_size):
                names.extend(resolver(a[i : i + batch_size]))
            yield pd.DataFrame({"contract": a, "name": names})

    # eagerly lineage-cut the RPC results BEFORE the join: the mapInPandas
    # stage is side-effecting (live network calls) but Spark treats it as a
    # deterministic recomputable stage. persist() is NOT enough — it is lazy
    # and non-guaranteed (evicted cached partitions recompute, re-calling the
    # resolver, and a resolver whose answers vary between calls could mix
    # rows from different executions). localCheckpoint(eager=True) runs the
    # fan-out exactly once and severs the lineage, so downstream retries
    # read checkpointed blocks; its blocks are released by the ContextCleaner
    # when the frame goes out of scope (no manual unpersist to leak).
    resolved = (
        addrs.mapInPandas(call_batches, out_schema)
        .filter(F.col("name").isNotNull())
        .localCheckpoint(eager=True)
    )
    joined = deployments.join(resolved.withColumnRenamed("name", "_rpc_name"), "contract", "left")
    name_col = (
        F.coalesce(F.col("_rpc_name"), F.col("name"))
        if "name" in deployments.columns
        else F.col("_rpc_name")
    )
    return joined.withColumn("name", name_col).drop("_rpc_name")
