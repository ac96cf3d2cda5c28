"""The full batch-extract pipeline (SURVEY.md §3.1): raw chain tables ->
the at-rest table set, as one declarative DataFrame job.

Replaces the reference's hand-scheduled async pipeline
(src/extraction/extract.rs:84-400): per-block Tokio tasks, semaphore,
writer channel and buffer management all disappear into Catalyst stages;
the two *semantic* optimizations Catalyst cannot infer are kept explicit —
dedup-before-decompile (A3) and global ABI dedup (A4).

Scale notes: every derivation is a narrow projection or a single shuffle on
a natural key (block_number / skeleton_hash / signature). The expensive
Python kernels (metadata CBOR, skeletonize, decompile, keccak) run only on
dropDuplicates(md5(deployed_bytecode)) rows — at mainnet scale ~100x fewer
rows than deployments.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.decompile import decompile_udf, selector_lifter
from ..functions.keccak import keccak256_udf
from ..functions.metadata import metadata_udf
from ..functions.skeleton import skeleton_udf
from . import abi as abi_ops
from . import blocks as block_ops
from . import traces as trace_ops
from . import transfers as transfer_ops


@dataclass
class ExtractResult:
    """The 10-directory output contract of src/extraction/extract.rs:300-316,
    as named DataFrames.

    The shared hubs of the DAG (propagated traces, enriched deployments,
    decompiled skeletons) are persisted inside extract_all: the 10 tables
    are written as separate actions, and without pinning, every action
    would re-run the expensive UDF stages (metadata CBOR, skeletonize,
    keccak, decompile) the dedup-before-UDF design exists to minimize.
    Call `release()` after the tables are written (or consumed) to free
    the pinned executor storage."""

    blocks: DataFrame
    transactions: DataFrame
    logs: DataFrame
    token_transfers: DataFrame
    deployments: DataFrame
    destructions: DataFrame
    skeletons: DataFrame
    abi: DataFrame
    abi_membership: DataFrame
    accounts: DataFrame
    _pinned: "list[DataFrame]" = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the internally pinned hub frames. Safe to call twice;
        the table DataFrames stay valid (they recompute from source after)."""
        for df in self._pinned:
            df.unpersist()
        self._pinned.clear()

    def as_dict(self) -> dict[str, DataFrame]:
        return {
            "blocks": self.blocks,
            "transactions": self.transactions,
            "logs": self.logs,
            "token_transfers": self.token_transfers,
            "deployments": self.deployments,
            "destructions": self.destructions,
            "skeletons": self.skeletons,
            "abi": self.abi,
            "abi_membership": self.abi_membership,
            "accounts": self.accounts,
        }


def enrich_deployments(raw_deployments: DataFrame) -> DataFrame:
    """P6/P7/P8 + skeleton hash on the DISTINCT deployed bytecodes, joined
    back — dedup-before-UDF (src/extraction/extract.rs:170-246).

    The dedup and the join-back key on md5(deployed_bytecode), not the
    bytecode itself: contract code is up to 24 KB of hex, and a shuffle
    that sorts/compares 24 KB string keys pays that on every row on both
    sides; the 128-bit digest is a 16-byte key with no realistic collision
    risk (~1e-24 at 1e7 distinct codes — and a collision would only merge
    two enrichment rows, it cannot invent data)."""
    raw = raw_deployments.withColumn("_code_md5", F.md5(F.col("deployed_bytecode")))
    distinct_codes = (
        raw.select("_code_md5", "deployed_bytecode")
        .filter(F.col("deployed_bytecode").isNotNull())
        .dropDuplicates(["_code_md5"])
    )
    enriched_codes = (
        distinct_codes.withColumn("_meta", metadata_udf(F.col("deployed_bytecode")))
        .withColumn("_skeleton", skeleton_udf(F.col("deployed_bytecode")))
        .select(
            "_code_md5",
            F.col("_meta.storage_protocol").alias("storage_protocol"),
            F.col("_meta.storage_address").alias("storage_address"),
            F.col("_meta.solc_version").alias("solc_version"),
            F.col("_meta.experimental").alias("experimental"),
            F.col("_skeleton").alias("skeleton_bytecode"),
            keccak256_udf(F.col("_skeleton")).alias("skeleton_hash"),
        )
    )
    return raw.join(enriched_codes, "_code_md5", "left").drop("_code_md5")


def derive_skeleton_tables(
    deployments: DataFrame, decompiler=selector_lifter, _pin: "list[DataFrame] | None" = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """A3 skeleton dedup -> U1 decompile (once per distinct skeleton) ->
    P13 signatures -> A4 ABI dedup -> J3 membership -> P14 compliancy.
    Returns (skeletons, abi, abi_membership).

    Input needs: skeleton_hash, skeleton_bytecode, deployed_bytecode,
    block_number, tx_hash. The Skeleton row stores the *skeleton* bytes
    (dgraph/contracts.schema:158-168), but the decompiler consumes the
    ORIGINAL deployed bytecode of the first deployment — skeletons have
    their PUSH arguments zeroed, which would erase the dispatch selectors
    (src/extraction/extract.rs:159-246 decompiles the deployed code)."""
    # the A3 first-writer-wins rule lives in ONE place (abi_ops.distinct_skeletons)
    sk = abi_ops.distinct_skeletons(
        deployments, bytecode_col="skeleton_bytecode", extra_cols=("deployed_bytecode",)
    )
    decompiled = sk.withColumn(
        "_abi", decompile_udf(decompiler)(F.col("deployed_bytecode"))
    ).drop("deployed_bytecode")
    decompiled = decompiled.withColumn("failed_decompilation", F.col("_abi").isNull())
    if _pin is not None:
        # three output tables (skeletons, abi, membership) branch off this
        # frame; without pinning, each write action re-runs the decompiler
        # over every distinct skeleton — the exact cost A3 dedup minimizes
        from pyspark.storagelevel import StorageLevel

        decompiled = decompiled.persist(StorageLevel.MEMORY_AND_DISK)
        _pin.append(decompiled)

    raw_entries = decompiled.select(
        "skeleton_hash", F.explode_outer("_abi").alias("e")
    ).select(
        "skeleton_hash",
        F.col("e.type").alias("type"),
        F.col("e.name").alias("name"),
        F.col("e.inputs").alias("inputs"),
        F.col("e.outputs").alias("outputs"),
    ).filter(F.col("type").isNotNull())

    with_sigs = abi_ops.with_signatures(raw_entries)
    membership = with_sigs.select("skeleton_hash", "signature", "type").distinct()
    abi_table = abi_ops.dedup_abi(
        with_sigs.select("signature", "type", "name", "inputs", "outputs", "bytes4")
    )
    scores = abi_ops.compliancy_scores(membership)
    skeletons = (
        decompiled.drop("_abi")
        .join(scores, "skeleton_hash", "left")
        .fillna(0, ["erc20_compliancy", "erc721_compliancy"])
        .select(
            "skeleton_hash",
            "bytecode",
            "failed_decompilation",
            "erc20_compliancy",
            "erc721_compliancy",
            "first_block",
        )
    )
    return skeletons, abi_table, membership


def derive_accounts(
    transactions: DataFrame, deployments: DataFrame, destructions: DataFrame
) -> DataFrame:
    """Accounts are implicit in the reference (created by every address
    edge, e.g. src/models/transaction.rs:347-375): union all address-bearing
    columns; is_contract = appears as a deployed contract."""
    addr_cols = [
        transactions.select(F.col("from").alias("address")),
        transactions.select(F.col("to").alias("address")),
        deployments.select(F.col("creator").alias("address")),
        destructions.select(F.col("refund_address").alias("address")),
    ]
    plain = addr_cols[0]
    for c in addr_cols[1:]:
        plain = plain.unionByName(c)
    plain = plain.filter(F.col("address").isNotNull()).distinct().withColumn(
        "is_contract", F.lit(False)
    )
    contracts = (
        deployments.select(F.col("contract").alias("address"))
        .filter(F.col("address").isNotNull())
        .distinct()
        .withColumn("is_contract", F.lit(True))
    )
    # contract flag wins on conflict
    return (
        plain.join(contracts.select("address"), "address", "left_anti")
        .unionByName(contracts)
    )


def extract_all(
    blocks: DataFrame,
    transactions: DataFrame,
    logs: DataFrame,
    traces: DataFrame,
    decompiler=selector_lifter,
    hub_storage=None,
) -> ExtractResult:
    """End-to-end: the Spark equivalent of `eth2dgraph extract`
    (src/main.rs:18-21, src/extraction/extract.rs:291-400).

    `hub_storage` sets the StorageLevel for the two STRING-HEAVY pinned
    hubs (propagated traces, enriched deployments — each row carries up
    to ~50 KB of bytecode hex). Default MEMORY_AND_DISK is right when the
    hubs fit the executor storage pool; pass StorageLevel.DISK_ONLY when
    they don't — the hubs together hold the full corpus's bytecode, and
    on a memory-bounded executor the columnar cache's decompressed
    working set OOMs before eviction saves it (measured: 300k contracts
    = ~25 GB of hot hub strings on a 24g single-JVM heap dies with
    MEMORY_AND_DISK, completes with DISK_ONLY — see BASELINE.md round-11
    notes). At cluster scale this is the per-executor
    memory-vs-spindle sizing decision, exposed as a knob."""
    from pyspark.storagelevel import StorageLevel

    if hub_storage is None:
        hub_storage = StorageLevel.MEMORY_AND_DISK
    pinned: list[DataFrame] = []
    txs = block_ops.tx_bytes4(block_ops.normalize_tx_to(transactions))
    enriched_blocks = block_ops.enrich_blocks(blocks, transactions)
    # propagate trace errors once per MATERIALIZATION of this frame: the
    # definition is shared, but deployments and destructions are written
    # as separate actions, so the filter+groupBy(tx_hash)+join over the
    # entire traces table — a shuffle of the largest input at scale —
    # is persisted and released via ExtractResult.release()
    t = trace_ops.propagate_trace_errors(traces).persist(hub_storage)
    pinned.append(t)
    raw_deps = trace_ops.extract_deployments(t, propagate_errors=False)
    # deps feeds four separate downstream actions (deployments write,
    # skeletons/abi/membership, accounts) — pin it so the metadata/
    # skeletonize/keccak UDF pass over distinct bytecodes runs once
    deps = enrich_deployments(raw_deps).persist(hub_storage)
    pinned.append(deps)
    dess = trace_ops.extract_destructions(t, propagate_errors=False)
    transfers = transfer_ops.decode_token_transfers(logs)
    logs_exploded = transfer_ops.explode_topics(logs)
    skeletons, abi_table, membership = derive_skeleton_tables(
        deps.select(
            "skeleton_hash", "skeleton_bytecode", "deployed_bytecode", "block_number", "tx_hash"
        ),
        decompiler,
        _pin=pinned,
    )
    deployments = deps.select(
        "contract", "creator", "block_number", "tx_hash", "failed_deploy",
        "creation_bytecode", "deployed_bytecode", "skeleton_hash",
        "storage_protocol", "storage_address", "solc_version", "experimental",
    )
    accounts = derive_accounts(txs, deployments, dess)
    return ExtractResult(
        blocks=enriched_blocks,
        transactions=txs,
        logs=logs_exploded,
        token_transfers=transfers,
        deployments=deployments,
        destructions=dess,
        skeletons=skeletons,
        abi=abi_table,
        abi_membership=membership,
        accounts=accounts,
        _pinned=pinned,
    )
