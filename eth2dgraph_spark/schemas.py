"""Explicit StructType per table — the at-rest data model of SURVEY.md §1.

Mapping from the reference's Dgraph property graph (dgraph/contracts.schema:96-212,
entity serializers under src/models/) to columnar Parquet tables. Edges (uid
predicates) become foreign-key columns resolved by joins; U256 values stay
canonical as decimal strings with best-effort numeric companions added by
operators when arithmetic is needed (src/models/transaction.rs:382).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Zero address used when tx.to is null (src/models/transaction.rs:38-43).
ZERO_ADDRESS = "0x0000000000000000000000000000000000000000"

# keccak256("Transfer(address,address,uint256)") — the server-side pushed
# topic0 filter of src/extraction/logs.rs:12-30.
TRANSFER_TOPIC = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"

# src/models/block.rs:286-342, dgraph/contracts.schema:101-116
BLOCKS = StructType(
    [
        StructField("number", LongType(), False),
        StructField("timestamp", LongType(), True),  # unix secs; datetime derived
        StructField("miner", StringType(), True),
        StructField("difficulty", StringType(), True),  # U256 decimal string
        StructField("gas_limit", LongType(), True),
        StructField("gas_used", LongType(), True),
        StructField("base_fee_per_gas", LongType(), True),  # null pre-EIP-1559
        StructField("size", LongType(), True),
    ]
)

# src/models/transaction.rs:321-411, dgraph/contracts.schema:178-194
TRANSACTIONS = StructType(
    [
        StructField("hash", StringType(), False),
        StructField("block_number", LongType(), False),
        StructField("from", StringType(), True),
        StructField("to", StringType(), True),  # null -> ZERO_ADDRESS at derive time
        StructField("value", StringType(), True),  # U256 decimal string
        StructField("gas", LongType(), True),
        StructField("gas_price", LongType(), True),  # wei; null for some types
        StructField("max_fee_per_gas", LongType(), True),
        StructField("max_priority_fee_per_gas", LongType(), True),
        StructField("input", StringType(), True),  # 0x-hex
        StructField("nonce", LongType(), True),
        StructField("r", StringType(), True),
        StructField("s", StringType(), True),
        StructField("v", LongType(), True),
        StructField("tx_index", LongType(), True),
    ]
)

# src/models/log.rs:142-207 (topics kept as array; exploded by operator P10)
LOGS = StructType(
    [
        StructField("block_number", LongType(), False),
        StructField("tx_hash", StringType(), True),
        StructField("tx_index", LongType(), True),
        StructField("log_index", LongType(), True),
        StructField("address", StringType(), True),  # emitting contract
        StructField("topics", ArrayType(StringType()), True),
        StructField("data", StringType(), True),  # 0x-hex, 32-byte words
        StructField("removed", BooleanType(), True),  # reorg flag (T4)
    ]
)

# ethers Trace shape consumed at src/models/trace.rs:18-47
TRACES = StructType(
    [
        StructField("block_number", LongType(), False),
        StructField("tx_hash", StringType(), True),
        StructField("trace_address", ArrayType(IntegerType()), True),
        StructField("type", StringType(), True),  # call|create|suicide|reward
        StructField("error", StringType(), True),
        StructField("action_from", StringType(), True),
        StructField("action_init", StringType(), True),  # create: init code hex
        StructField("action_address", StringType(), True),  # suicide: contract
        StructField("action_balance", StringType(), True),  # suicide: U256 str
        StructField("action_refund_address", StringType(), True),
        StructField("result_address", StringType(), True),  # create: new contract
        StructField("result_code", StringType(), True),  # create: deployed code
    ]
)

# src/models/transfer.rs:184-191, decode at src/extraction/logs.rs:45-113
TOKEN_TRANSFERS = StructType(
    [
        StructField("contract", StringType(), False),
        StructField("from", StringType(), True),
        StructField("to", StringType(), True),
        StructField("value", StringType(), True),  # ERC-20: U256 decimal string,
        # or the raw 0x-hex word when >= 10^38 (see value_overflow)
        StructField("token_id", StringType(), True),  # ERC-721 (same contract)
        StructField("token_type", StringType(), True),  # erc20|erc721
        StructField("value_overflow", BooleanType(), True),  # value/token_id is raw hex
        StructField("block_number", LongType(), True),
        StructField("tx_hash", StringType(), True),
        StructField("log_index", LongType(), True),
    ]
)

# src/models/contract_deployment.rs:22-35, dgraph/contracts.schema:117-133
DEPLOYMENTS = StructType(
    [
        StructField("contract", StringType(), False),
        StructField("creator", StringType(), True),
        StructField("block_number", LongType(), True),
        StructField("tx_hash", StringType(), True),
        StructField("failed_deploy", BooleanType(), True),
        StructField("creation_bytecode", StringType(), True),
        StructField("deployed_bytecode", StringType(), True),
        StructField("skeleton_hash", StringType(), True),  # FK -> skeletons (J2)
        StructField("storage_protocol", StringType(), True),  # bzzr0|bzzr1|ipfs
        StructField("storage_address", StringType(), True),
        StructField("solc_version", StringType(), True),
        StructField("experimental", BooleanType(), True),
        StructField("verified_source", BooleanType(), True),
        StructField("verified_source_code", StringType(), True),
        StructField("name", StringType(), True),
    ]
)

# src/models/contract_destruction.rs:12-19
DESTRUCTIONS = StructType(
    [
        StructField("contract", StringType(), False),
        StructField("block_number", LongType(), True),
        StructField("tx_hash", StringType(), True),
        StructField("failed", BooleanType(), True),
        StructField("balance_left", StringType(), True),  # U256 decimal string
        StructField("refund_address", StringType(), True),
    ]
)

# src/models/skeleton.rs:7-12, dgraph/contracts.schema:158-168
SKELETONS = StructType(
    [
        StructField("skeleton_hash", StringType(), False),  # keccak(skeleton)
        StructField("bytecode", StringType(), True),  # skeleton bytes, 0x-hex
        StructField("failed_decompilation", BooleanType(), True),
        StructField("erc20_compliancy", IntegerType(), True),  # 0-6
        StructField("erc721_compliancy", IntegerType(), True),  # 0-9
        StructField("first_block", LongType(), True),  # first-writer-wins (A3)
    ]
)

# One abi table with a type discriminator (src/models/abi.rs:11-20); the
# skeleton<->signature membership bridge of J3 is (skeleton_hash, signature).
ABI = StructType(
    [
        StructField("signature", StringType(), False),  # keccak256(name(types))
        StructField("type", StringType(), False),  # function|event|error
        StructField("name", StringType(), True),
        StructField("inputs", StringType(), True),  # comma-joined type list
        StructField("outputs", StringType(), True),  # functions only
        StructField("bytes4", StringType(), True),  # functions only
    ]
)

ABI_MEMBERSHIP = StructType(
    [
        StructField("skeleton_hash", StringType(), False),
        StructField("signature", StringType(), False),
        StructField("type", StringType(), False),
    ]
)

# src/models/block.rs:323-339, dgraph/contracts.schema:207-212
WITHDRAWALS = StructType(
    [
        StructField("block_number", LongType(), False),
        StructField("index", LongType(), True),
        StructField("validator_index", LongType(), True),
        StructField("address", StringType(), True),
        StructField("amount", LongType(), True),
    ]
)

# dgraph/contracts.schema:96-100 — accounts are implicit in the reference,
# derived by unioning every address-bearing column.
ACCOUNTS = StructType(
    [
        StructField("address", StringType(), False),
        StructField("is_contract", BooleanType(), True),
    ]
)

# Derived per-block gas stats (A1) — src/models/block.rs:34-64.
BLOCK_GAS_STATS = StructType(
    [
        StructField("block_number", LongType(), False),
        StructField("tx_count", LongType(), True),
        StructField("gas_price_min", DoubleType(), True),  # Gwei
        StructField("gas_price_max", DoubleType(), True),
        StructField("gas_price_avg", DoubleType(), True),
        StructField("gas_price_std_dev", DoubleType(), True),  # population
    ]
)

ETH_TABLES: dict[str, StructType] = {
    "blocks": BLOCKS,
    "transactions": TRANSACTIONS,
    "logs": LOGS,
    "traces": TRACES,
    "token_transfers": TOKEN_TRANSFERS,
    "deployments": DEPLOYMENTS,
    "destructions": DESTRUCTIONS,
    "skeletons": SKELETONS,
    "abi": ABI,
    "abi_membership": ABI_MEMBERSHIP,
    "withdrawals": WITHDRAWALS,
    "accounts": ACCOUNTS,
}

# Driver testdata tables (TESTDATA.md) — names only; schemas are read from
# parquet footers, never inferred from data.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Timestamp column used by streaming-ish demos over the events table.
EVENTS_TS_COL = "ts"

__all__ = [name.upper() for name in ETH_TABLES] + [
    "ETH_TABLES",
    "TESTDATA_TABLES",
    "ZERO_ADDRESS",
    "TRANSFER_TOPIC",
    "BLOCK_GAS_STATS",
    "TimestampType",
]
