"""Deterministic eth-shaped fixture tables (FIXTURES.md §1) for end-to-end
extract/stream tests. Seeded — no randomness at import time."""

from __future__ import annotations

import csv
import os
import random

from eth2dgraph_spark.functions.keccak import keccak256_hex
from eth2dgraph_spark.schemas import BLOCKS, LOGS, TRACES, TRANSACTIONS, TRANSFER_TOPIC

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _addr(rng: random.Random) -> str:
    return "0x" + "".join(rng.choice("0123456789abcdef") for _ in range(40))


def _hash32(rng: random.Random) -> str:
    return "0x" + "".join(rng.choice("0123456789abcdef") for _ in range(64))


def golden_bytecodes() -> list[str]:
    out = []
    with open(os.path.join(DATA, "bytecodes.csv")) as f:
        for row in csv.DictReader(f, delimiter=";"):
            code = row["code"].removeprefix("0x")
            out.append("0x" + code)
    return out


def make_chain(spark, n_blocks: int = 10, txs_per_block: int = 8, seed: int = 42):
    """Returns (blocks, transactions, logs, traces) DataFrames."""
    rng = random.Random(seed)
    codes = golden_bytecodes()
    addrs = [_addr(rng) for _ in range(20)]

    blocks, txs, logs, traces = [], [], [], []
    for b in range(1_000_000, 1_000_000 + n_blocks):
        blocks.append(
            (b, b * 12 + 1_600_000_000, rng.choice(addrs), str(rng.randint(0, 2**200)),
             30_000_000, rng.randint(0, 30_000_000), rng.randint(10**9, 10**11) if rng.random() > 0.1 else None,
             rng.randint(500, 5000))
        )
        for i in range(txs_per_block):
            h = _hash32(rng)
            creates = rng.random() < 0.25
            txs.append(
                (h, b, rng.choice(addrs), None if creates else rng.choice(addrs),
                 str(rng.randint(0, 2**130)), 21000 + rng.randint(0, 10**6),
                 rng.randint(10**9, 10**11) if rng.random() > 0.05 else None,
                 None, None, "0xa9059cbb" + "00" * 32 if rng.random() > 0.3 else "0x",
                 i, _hash32(rng), _hash32(rng), 27, i)
            )
            if creates:
                code = rng.choice(codes)
                failed = rng.random() < 0.2
                traces.append(
                    (b, h, [], "create", "Reverted" if failed else None, addrs[0],
                     "0x6080" + code[2:10], None, None, None, _addr(rng), code)
                )
                if failed:  # nested create under the failed parent
                    traces.append(
                        (b, h, [0], "create", None, addrs[1], "0x6080", None, None,
                         None, _addr(rng), rng.choice(codes))
                    )
            elif rng.random() < 0.08:
                traces.append(
                    (b, h, [], "suicide", None, None, None, rng.choice(addrs),
                     str(rng.randint(0, 10**20)), rng.choice(addrs), None, None)
                )
            else:
                traces.append(
                    (b, h, [], "call", None, rng.choice(addrs), None, None, None, None, None, None)
                )
            # logs: ~40% transfer-shaped
            r = rng.random()
            if r < 0.25:  # ERC-20
                topics = [TRANSFER_TOPIC, "0x" + "00" * 12 + rng.choice(addrs)[2:],
                          "0x" + "00" * 12 + rng.choice(addrs)[2:]]
                data = "0x" + hex(rng.randint(0, 2**120))[2:].zfill(64)
            elif r < 0.35:  # ERC-721
                topics = [TRANSFER_TOPIC, "0x" + "00" * 12 + rng.choice(addrs)[2:],
                          "0x" + "00" * 12 + rng.choice(addrs)[2:],
                          "0x" + hex(rng.randint(0, 10**6))[2:].zfill(64)]
                data = "0x"
            elif r < 0.4:  # transfer topic but wrong arity -> dropped by P5
                topics = [TRANSFER_TOPIC, "0x" + "00" * 12 + rng.choice(addrs)[2:]]
                data = "0x"
            else:
                topics = [_hash32(rng)] if rng.random() > 0.2 else []
                data = "0x" + "00" * 32
            logs.append((b, h, i, i, rng.choice(addrs), topics, data, rng.random() < 0.001))

    return (
        spark.createDataFrame(blocks, BLOCKS),
        spark.createDataFrame(txs, TRANSACTIONS),
        spark.createDataFrame(logs, LOGS),
        spark.createDataFrame(traces, TRACES),
    )
