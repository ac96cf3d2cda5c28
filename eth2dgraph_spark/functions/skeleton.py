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

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType
from .hexparse import parse_bytecode_hex

# Below this many bytes the interpreted scan beats numpy's setup cost
# (measured crossover ~3 KB end-to-end; numpy is 2.2x on the raw mask at
# the 24 KB contract-size cap).
_NP_MIN_BYTES = 3072


def _extract_skeleton_scalar(code: bytes) -> bytes:
    """Zero the push-data bytes of EVM bytecode (src/utils/skeleton.rs:8-23).
    Interpreted reference scan — kept as the golden cross-check and the
    small-input fast path."""
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


def instruction_mask(arr: np.ndarray) -> np.ndarray:
    """Boolean mask of instruction-start positions of EVM bytecode — every
    byte is either an instruction start or a PUSH argument, so this one mask
    drives BOTH the skeleton kernel (zero non-starts, P8) and the opcode
    tokenizer (keep starts, P15).

    The scan is a pointer chase (the skip depends on the opcode just read),
    which an interpreted loop does in O(n) Python steps. Here: successor
    function f(i) = i + 1 + push_width(code[i]) built vectorized, then the
    orbit of 0 marked by pointer doubling — after round k the mask holds the
    first 2^k instruction starts and f has been squared to f^(2^k). O(log n)
    rounds of O(n) numpy work replace n interpreter steps."""
    n = arr.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    width = np.where((arr >= 0x60) & (arr <= 0x7F), arr.astype(np.int64) - 0x5F, 0)
    f = np.arange(1, n + 1, dtype=np.int64) + width
    np.minimum(f, n, out=f)
    f = np.append(f, n)  # fixpoint absorber past the end
    # f is strictly increasing along the orbit of 0, so the marked set can be
    # kept as a plain index array (no dedup, no per-round mask rescan):
    # after round k `marked` holds the first 2^k instruction starts and f has
    # been squared to f^(2^k); applying it to the whole marked set yields
    # exactly the next 2^k starts.
    marked = np.zeros(1, dtype=np.int64)  # {0}
    frontier_parts = [marked]
    while True:
        new = f[marked]
        new = new[new < n]
        if new.size == 0:
            break
        frontier_parts.append(new)
        marked = np.concatenate(frontier_parts)
        frontier_parts = [marked]
        if new.size < marked.size - new.size:
            break  # orbit exhausted mid-round: last application came up short
        f = f[f]  # f <- f o f
    mask = np.zeros(n, dtype=bool)
    mask[marked] = True
    return mask


def extract_skeleton(code: bytes) -> bytes:
    """Zero the push-data bytes of EVM bytecode (src/utils/skeleton.rs:8-23)."""
    if len(code) < _NP_MIN_BYTES:
        return _extract_skeleton_scalar(code)
    arr = np.frombuffer(code, dtype=np.uint8)
    out = arr.copy()
    out[~instruction_mask(arr)] = 0
    return out.tobytes()


def skeletonize(code: bytes) -> bytes:
    """The full reference pipeline: strip the CBOR metadata tail first, then
    zero PUSH args — this is what the golden CSV asserts
    (src/utils/skeleton.rs:77-89: separate_metadata then extract_skeleton)."""
    from .metadata import split_metadata

    runtime, _ = split_metadata(code)
    return extract_skeleton(runtime)


def extract_skeleton_hex(code_hex: str | None, strip_metadata: bool = True) -> str | None:
    """0x-hex in, 0x-hex skeleton out. Malformed hex (odd length, non-hex
    chars — truncated/corrupt ingest) returns None rather than a
    plausible-but-wrong skeleton: silently dropping the odd nibble would
    hash the corrupt contract under a fabricated skeleton_hash and poison
    every downstream join/compliancy score with no flag."""
    if code_hex is None:
        return None
    raw = parse_bytecode_hex(code_hex)
    if raw is None:
        return None
    return "0x" + (skeletonize(raw) if strip_metadata else extract_skeleton(raw)).hex()


@pandas_udf(StringType())
def skeleton_udf(code_hex: pd.Series) -> pd.Series:
    return code_hex.map(extract_skeleton_hex)
