"""Skeleton extraction (P8): zero out the N argument bytes after every
PUSH1..PUSH32 opcode (0x60..0x7f), keeping the PUSH opcodes themselves.

Reference: src/utils/skeleton.rs:8-23 — golden-tested byte-for-byte against
test-data/bytecodes{,_skeleton}.csv (src/utils/skeleton.rs:36-91).

The scan is inherently sequential per bytecode (the skip length depends on
the opcode just read), so this is a genuine Python kernel — exposed as an
Arrow-batched pandas_udf and, critically, run only AFTER dropDuplicates on
the deployed bytecode (the dedup-before-UDF pattern, SURVEY §4): at chain
scale there are ~100x fewer distinct bytecodes than deployments.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def extract_skeleton(code: bytes) -> bytes:
    """Zero the push-data bytes of EVM bytecode (src/utils/skeleton.rs:8-23)."""
    out = bytearray(code)
    i = 0
    n = len(out)
    while i < n:
        op = out[i]
        i += 1
        if 0x60 <= op <= 0x7F:  # PUSH1..PUSH32
            width = op - 0x5F
            end = min(i + width, n)
            out[i:end] = bytes(end - i)
            i = end
    return bytes(out)


def skeletonize(code: bytes) -> bytes:
    """The full reference pipeline: strip the CBOR metadata tail first, then
    zero PUSH args — this is what the golden CSV asserts
    (src/utils/skeleton.rs:77-89: separate_metadata then extract_skeleton)."""
    from .metadata import split_metadata

    runtime, _ = split_metadata(code)
    return extract_skeleton(runtime)


def extract_skeleton_hex(code_hex: str | None, strip_metadata: bool = True) -> str | None:
    """0x-hex in, 0x-hex skeleton out."""
    if code_hex is None:
        return None
    h = code_hex[2:] if code_hex.startswith("0x") else code_hex
    if len(h) % 2:  # defensive: odd-length hex can't decode
        h = h[:-1]
    raw = bytes.fromhex(h)
    return "0x" + (skeletonize(raw) if strip_metadata else extract_skeleton(raw)).hex()


@pandas_udf(StringType())
def skeleton_udf(code_hex: pd.Series) -> pd.Series:
    return code_hex.map(extract_skeleton_hex)
