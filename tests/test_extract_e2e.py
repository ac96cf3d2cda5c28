"""End-to-end extract pipeline test (SURVEY.md §3.1): raw chain tables ->
all 10 derived tables, with cross-table invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.functions.decompile import lift_selectors, selector_lifter
from eth2dgraph_spark.functions.keccak import keccak256_hex
from eth2dgraph_spark.functions.skeleton import skeletonize
from eth2dgraph_spark.operators.extract import extract_all
from eth2dgraph_spark.schemas import ZERO_ADDRESS

from .fixtures import golden_bytecodes, make_chain


@pytest.fixture(scope="module")
def chain(spark):
    return make_chain(spark, n_blocks=10, txs_per_block=8)


@pytest.fixture(scope="module")
def result(chain):
    blocks, txs, logs, traces = chain
    return extract_all(blocks, txs, logs, traces)


def test_all_tables_produced(result):
    d = result.as_dict()
    assert set(d) == {
        "blocks", "transactions", "logs", "token_transfers", "deployments",
        "destructions", "skeletons", "abi", "abi_membership", "accounts",
    }
    for name, df in d.items():
        assert df.count() >= 0, name


def test_blocks_enriched(result, chain):
    blocks, txs, _, _ = chain
    out = result.blocks
    assert "gas_price_avg" in out.columns and "datetime" in out.columns
    assert out.count() == blocks.count()
    # tx_count totals must equal the tx table size
    total = out.agg(F.sum("tx_count")).collect()[0][0]
    assert total == txs.count()


def test_transactions_normalized(result):
    txs = result.transactions
    assert txs.filter(F.col("to").isNull()).count() == 0  # P12
    withsel = txs.filter(F.col("input") != "0x")
    assert withsel.filter(F.col("bytes4") == "0xa9059cbb").count() == withsel.count()


def test_skeleton_hash_matches_kernel(result):
    """deployments.skeleton_hash == keccak(skeletonize(deployed_bytecode))"""
    row = result.deployments.filter(F.col("deployed_bytecode").isNotNull()).first()
    code = bytes.fromhex(row["deployed_bytecode"][2:])
    expected = "0x" + keccak256_hex(skeletonize(code))
    assert row["skeleton_hash"] == expected


def test_skeletons_distinct_and_bounded(result):
    sk = result.skeletons
    n = sk.count()
    assert n == sk.select("skeleton_hash").distinct().count()  # A3
    assert n <= len(golden_bytecodes())  # corpus collision -> dedup happened
    assert sk.filter(F.col("failed_decompilation")).count() == 0


def test_abi_globally_deduped(result):
    abi = result.abi
    assert abi.count() == abi.select("signature").distinct().count()  # A4
    # selector lifter names: Unresolved_<8hex> with matching bytes4
    row = abi.first()
    assert row["name"].startswith("Unresolved_")
    assert row["bytes4"] == "0x" + row["name"].removeprefix("Unresolved_")


def test_membership_joins_back(result):
    j = result.abi_membership.join(result.skeletons, "skeleton_hash").count()
    assert j == result.abi_membership.count()


def test_transfers_decoded_only_valid_arity(result, chain):
    _, _, logs, _ = chain
    from eth2dgraph_spark.schemas import TRANSFER_TOPIC

    valid = logs.filter(
        (F.get("topics", 0) == TRANSFER_TOPIC) & F.size("topics").isin(3, 4)
    ).count()
    assert result.token_transfers.count() == valid
    types = {r["token_type"] for r in result.token_transfers.select("token_type").distinct().collect()}
    assert types <= {"erc20", "erc721"} and "erc20" in types


def test_failed_deploys_propagate(result):
    deps = result.deployments
    assert deps.filter(F.col("failed_deploy")).count() > 0


def test_accounts_contract_flag(result):
    acc = result.accounts
    assert acc.count() == acc.select("address").distinct().count()
    contracts = result.deployments.select("contract").distinct().count()
    assert acc.filter(F.col("is_contract")).count() == contracts
    assert acc.filter(F.col("address") == ZERO_ADDRESS).count() == 1  # from P12


def test_selector_lifter_finds_seaport_selectors():
    # golden corpus row 1 is Seaport; its dispatcher has known selectors,
    # e.g. fulfillBasicOrder 0xfb0f3ee1 (visible in the bytecode dispatch)
    code = bytes.fromhex(golden_bytecodes()[0][2:])
    sels = lift_selectors(code)
    assert "fb0f3ee1" in sels
    assert "06fdde03" in sels  # name()
    assert len(sels) == len(set(sels))


def test_write_read_roundtrip(result, spark, tmp_path):
    from eth2dgraph_spark.sources.eth import read_eth_table, write_eth_table

    base = str(tmp_path / "warehouse")
    write_eth_table(result.token_transfers, "token_transfers", base)
    back = read_eth_table(spark, "token_transfers", base)
    assert back.count() == result.token_transfers.count()
    assert set(back.columns) == set(result.token_transfers.columns)


def test_write_read_roundtrip_gzip_json(result, spark, tmp_path):
    """K1 byte-compat option: extract-mode gzip-JSON output (the reference's
    bulk-loader file contract, src/extraction/writer.rs:26-48) must
    roundtrip frame-equal to the parquet path, types included."""
    import glob

    from eth2dgraph_spark.sources.eth import read_eth_table, write_eth_table

    base = str(tmp_path / "wh")
    df = result.token_transfers
    write_eth_table(df, "token_transfers", base)
    write_eth_table(df, "token_transfers", str(tmp_path / "whj"), format="json")
    files = glob.glob(f"{tmp_path}/whj/token_transfers/*/*.json.gz")
    assert files, "expected gzip JSON part files"
    pq = read_eth_table(spark, "token_transfers", base)
    js = read_eth_table(spark, "token_transfers", str(tmp_path / "whj"), format="json")
    assert [f.dataType for f in js.schema.fields] == [
        f.dataType for f in pq.select(*js.columns).schema.fields
    ]
    key = lambda rows: sorted(map(repr, rows))  # noqa: E731
    assert key(js.collect()) == key(pq.select(*js.columns).collect())


def test_size_bounded_output_files(spark, tmp_path):
    """K1: maxRecordsPerFile caps file size like the reference's 8 MB output
    buffers (src/extraction/writer.rs:88-104)."""
    import glob

    from eth2dgraph_spark.sources.eth import write_eth_table

    base = str(tmp_path / "wh")
    df = spark.range(0, 1000).select(
        F.col("id").alias("signature"), F.lit("function").alias("type")
    ).coalesce(1)
    write_eth_table(df, "abi", base, max_records_per_file=100)
    files = glob.glob(f"{base}/abi/*.parquet")
    assert len(files) == 10  # 1000 rows / 100 per file


def test_release_frees_pinned_hub_frames(chain):
    """extract_all pins its shared hubs (propagated traces, enriched
    deployments, decompiled skeletons) so the 10 per-table write actions
    don't re-run the UDF stages; release() must free every pin and leave
    the table frames usable (they recompute from source afterward)."""
    blocks, txs, logs, traces = chain
    res = extract_all(blocks, txs, logs, traces)
    res.skeletons.count()  # materialize through all three hubs
    pins = list(res._pinned)
    assert len(pins) == 3
    assert all(p.storageLevel.useMemory or p.storageLevel.useDisk for p in pins)
    res.release()
    assert res._pinned == []
    assert all(not (p.storageLevel.useMemory or p.storageLevel.useDisk) for p in pins)
    res.release()  # idempotent
    assert res.deployments.count() > 0  # tables stay valid post-release


def test_hub_storage_disk_only_identical(spark, chain):
    """The hub_storage knob (memory-bounded executors pin the string
    hubs DISK_ONLY — see BASELINE.md round-11 soak findings) must not
    change any output table."""
    from pyspark.storagelevel import StorageLevel

    blocks, txs, logs, traces = chain
    a = extract_all(blocks, txs, logs, traces)
    b = extract_all(blocks, txs, logs, traces, hub_storage=StorageLevel.DISK_ONLY)
    for name in ("deployments", "destructions", "skeletons", "abi",
                 "abi_membership", "accounts"):
        da = {tuple(r) for r in a.as_dict()[name].collect()}
        db = {tuple(r) for r in b.as_dict()[name].collect()}
        assert da == db, name
    a.release()
    b.release()
