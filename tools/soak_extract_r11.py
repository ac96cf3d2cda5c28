"""Round-11 eth extract-DAG scale soak: extract_all (traces ->
deployments/destructions -> metadata/skeleton/keccak -> decompile ->
ABI dedup -> compliancy -> accounts, the reference's core path,
/root/reference/src/extraction/extract.rs:84-289) over a synthetic chain
at two scale points (default 10k / 100k deployed contracts). The LLM ops
have three measured decades; this puts the same receipts behind the eth
path (round-10 VERDICT item 4).

Corpus shape (deterministic from the tx index, synthesized INSIDE Spark
via mapInPandas over a range — the soak_r10_scale discipline: no
driver-side generation loop):
  - 4 txs per contract (i%4==0 creates, i%12==2 self-destructs, rest
    plain calls), 8 txs per block;
  - every 20th tx's create REVERTS and carries a nested create under it
    (exercises P3 error propagation at scale);
  - deployed bytecode = a code_id PREFIX of plain opcodes (ADD/MUL per
    bit — not PUSH arguments, which skeletonize zeroes; not a suffix,
    which the metadata strip removes) + one of the 5 golden mainnet
    codes (7-49 KB hex), so distinct skeletons scale as contracts/10
    and the dedup-before-UDF design is actually exercised:
    the metadata/skeleton/keccak/decompile kernels run on the distinct
    pool, the join-back fans results out to all deployments;
  - ~25% of logs ERC-20-transfer-shaped, ~10% ERC-721, ~5% wrong-arity
    (dropped by P5), rest noise.

Each of the 10 output tables is forced with a count() action (the same
action structure as the production 10-directory write). Prints ONE JSON
line; results recorded in BASELINE.md round-11 notes.

Usage: python tools/soak_extract_r11.py       SOAK_SIZES=10000,100000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from eth2dgraph_spark.schemas import TRANSFER_TOPIC  # noqa: E402
from eth2dgraph_spark.session import get_spark  # noqa: E402
from tests.fixtures import golden_bytecodes  # noqa: E402

SIZES = [int(x) for x in os.environ.get("SOAK_SIZES", "10000,100000").split(",")]

BLOCK_SCHEMA = (
    "number long, timestamp long, miner string, difficulty string, "
    "gas_limit long, gas_used long, base_fee_per_gas long, size long"
)
TX_SCHEMA = (
    "hash string, block_number long, `from` string, to string, value string, "
    "gas long, gas_price long, max_fee_per_gas long, max_priority_fee_per_gas long, "
    "input string, nonce long, r string, s string, v long, tx_index long"
)
LOG_SCHEMA = (
    "block_number long, tx_hash string, tx_index long, log_index long, "
    "address string, topics array<string>, data string, removed boolean"
)
TRACE_SCHEMA = (
    "block_number long, tx_hash string, trace_address array<int>, type string, "
    "error string, action_from string, action_init string, action_address string, "
    "action_balance string, action_refund_address string, result_address string, "
    "result_code string"
)


def _addr(j: int) -> str:
    return "0x" + format(j % 1000, "040x")


def _hash(i: int) -> str:
    return "0x" + format(i, "064x")


def _code(golden: "list[str]", code_id: int) -> str:
    # plain-opcode PREFIX: 24 bits of code_id as ADD/MUL bytes — survives
    # skeletonization (PUSH-argument variants would all collapse to one
    # skeleton, and a suffix lands after the trailing CBOR metadata the
    # skeletonizer strips — measured: appended bytes left only 5 distinct
    # skeletons), so distinct skeletons genuinely scale as contracts/10
    # and the per-distinct-skeleton kernels see the full pool
    prefix = "".join(
        "01" if (code_id >> b) & 1 else "02" for b in range(24)
    )
    base = golden[code_id % len(golden)]
    return "0x" + prefix + base[2:]


def _parts_for(n_contracts: int) -> int:
    """Partition count sized so string-heavy partitions stay ~128 MB —
    each contract contributes ~2 x 25 KB of bytecode hex to the traces
    table. A real 100 TB run gets this for free from
    spark.sql.files.maxPartitionBytes on the parquet scan; a synthetic
    mapInPandas generator (and the shuffles downstream of it) must size
    it explicitly. 32-partition traces at 300k contracts put ~1 GB of
    strings per partition and 32 concurrently-built columnar cache
    batches OOM'd the 24g heap (measured); 128 MB partitions stream
    through the same heap with room to spare — the exact
    shuffle-partition sizing knob a real cluster deploy tunes."""
    return max(32, n_contracts * 50_000 // (128 << 20) + 1)


def synth_chain(spark, n_contracts: int):
    n_txs = n_contracts * 4
    n_blocks = n_txs // 8 + 1
    n_distinct = max(n_contracts // 10, 1)
    golden = golden_bytecodes()

    def blocks_kernel(batches):
        for pdf in batches:
            b = pdf["id"] + 1_000_000
            yield pd.DataFrame(
                {
                    "number": b,
                    "timestamp": b * 12 + 1_600_000_000,
                    "miner": [_addr(int(x)) for x in b],
                    "difficulty": [str(int(x) * 7) for x in b],
                    "gas_limit": 30_000_000,
                    "gas_used": b % 30_000_000,
                    "base_fee_per_gas": (b % 10) * 10**9,
                    "size": b % 5000 + 500,
                }
            )

    def txs_kernel(batches):
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                creates = i % 4 == 0
                rows.append(
                    (
                        _hash(i), 1_000_000 + i // 8, _addr(i * 31),
                        None if creates else _addr(i * 17),
                        str(i * 10**9), 21000 + i % 10**6,
                        (i % 90 + 10) * 10**9 if i % 20 else None,
                        None, None,
                        "0xa9059cbb" + "00" * 32 if i % 10 < 7 else "0x",
                        i, _hash(i + 1), _hash(i + 2), 27, i % 8,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "hash", "block_number", "from", "to", "value", "gas",
                    "gas_price", "max_fee_per_gas", "max_priority_fee_per_gas",
                    "input", "nonce", "r", "s", "v", "tx_index",
                ],
            )

    def traces_kernel(batches):
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                b, h = 1_000_000 + i // 8, _hash(i)
                if i % 4 == 0:
                    code = _code(golden, (i // 4) % n_distinct)
                    failed = i % 20 == 0
                    rows.append(
                        (b, h, [], "create", "Reverted" if failed else None,
                         _addr(i), "0x6080" + code[2:10], None, None, None,
                         _addr(i * 7 + 1), code)
                    )
                    if failed:  # nested create under the reverted parent
                        rows.append(
                            (b, h, [0], "create", None, _addr(i + 1), "0x6080",
                             None, None, None, _addr(i * 7 + 3),
                             _code(golden, (i // 4 + 1) % n_distinct))
                        )
                elif i % 12 == 2:
                    rows.append(
                        (b, h, [], "suicide", None, None, None, _addr(i * 7 + 1),
                         str(i * 10**6), _addr(i * 13), None, None)
                    )
                else:
                    rows.append(
                        (b, h, [], "call", None, _addr(i * 31), None, None,
                         None, None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "block_number", "tx_hash", "trace_address", "type", "error",
                    "action_from", "action_init", "action_address",
                    "action_balance", "action_refund_address",
                    "result_address", "result_code",
                ],
            )

    def logs_kernel(batches):
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                b, h, r = 1_000_000 + i // 8, _hash(i), i % 100
                w = lambda j: "0x" + "00" * 12 + _addr(j)[2:]  # noqa: E731
                if r < 25:  # ERC-20
                    topics = [TRANSFER_TOPIC, w(i), w(i + 1)]
                    data = "0x" + format(i * 10**15, "064x")
                elif r < 35:  # ERC-721
                    topics = [TRANSFER_TOPIC, w(i), w(i + 1),
                              "0x" + format(i % 10**6, "064x")]
                    data = "0x"
                elif r < 40:  # transfer topic, wrong arity -> dropped by P5
                    topics = [TRANSFER_TOPIC, w(i)]
                    data = "0x"
                else:
                    topics = [_hash(i * 3)] if r < 90 else []
                    data = "0x" + "00" * 32
                rows.append((b, h, i % 8, i % 8, _addr(i * 11), topics, data,
                             r == 99))
            yield pd.DataFrame(
                rows,
                columns=[
                    "block_number", "tx_hash", "tx_index", "log_index",
                    "address", "topics", "data", "removed",
                ],
            )

    p = _parts_for(n_contracts)
    mk = lambda n, k, s: spark.range(n).repartition(p).mapInPandas(k, s)  # noqa: E731
    return (
        mk(n_blocks, blocks_kernel, BLOCK_SCHEMA),
        mk(n_txs, txs_kernel, TX_SCHEMA),
        mk(n_txs, logs_kernel, LOG_SCHEMA),
        mk(n_txs, traces_kernel, TRACE_SCHEMA),
    )


def main() -> None:
    from eth2dgraph_spark.operators.extract import extract_all

    out = {"sizes": {}}
    for n in SIZES:
        # fresh JVM per scale point: the first measured 10k+100k run OOM'd
        # the 100k phase at 24g heap even though 100k alone completes with
        # ~10g to spare — the 10k phase's unpersisted cache/broadcast
        # blocks are freed ASYNCHRONOUSLY by the ContextCleaner (GC-driven)
        # and were still resident when the string-heavy 100k enrichment
        # allocated. Sessions per scale also keep the walls comparable
        # (no cross-scale cache warmth). Shuffle partitions scale with the
        # corpus (see _parts_for) — the propagate_trace_errors groupBy
        # re-buckets the full 25KB-string traces table, and 32 output
        # partitions at 300k contracts are ~1 GB each.
        spark = get_spark(
            "soak-extract-r11", shuffle_partitions=_parts_for(n)
        )
        spark.sparkContext.setLogLevel("ERROR")
        blocks, txs, logs, traces = synth_chain(spark, n)
        t0 = time.time()
        hub = None
        if os.environ.get("SOAK_DISK_HUBS"):
            from pyspark.storagelevel import StorageLevel

            hub = StorageLevel.DISK_ONLY
        res = extract_all(blocks, txs, logs, traces, hub_storage=hub)
        counts = {name: df.count() for name, df in res.as_dict().items()}
        wall = time.time() - t0
        res.release()
        out["sizes"][str(n)] = {"wall_s": round(wall, 2), "counts": counts}
        print(f"# n_contracts={n}: {wall:.1f}s {counts}", file=sys.stderr)
        spark.stop()
    sizes = sorted(out["sizes"])
    if len(sizes) >= 2:
        w0, w1 = (out["sizes"][s]["wall_s"] for s in (sizes[0], sizes[-1]))
        out["scale_ratio"] = round(w1 / w0, 2)
        out["size_ratio"] = round(int(sizes[-1]) / int(sizes[0]), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
