"""Decompiler seam (U1, src/utils/decompile.rs:14-65).

The reference shells out to the external `heimdall` decompiler per distinct
skeleton, with timeout + retry bookkeeping. That binary is not part of this
engine; the seam is pluggable:

  - `selector_lifter` (default): a pure-Python fallback that lifts the
    4-byte selectors from the contract's dispatch table — EVM dispatchers
    compare CALLDATALOAD(0)>>224 against PUSH4 <selector> constants, so
    scanning decoded opcodes for PUSH4 arguments recovers the function
    surface. Names follow the reference's unresolved convention
    `Unresolved_<8-hex>` (src/utils/decompile.rs + function.rs:18-28).
  - swap in a real decompiler by passing any `bytecode_hex -> list[dict]`
    callable to `decompile_udf` (e.g. a subprocess heimdall wrapper) — the
    Spark plumbing (dedup-before-UDF, Arrow batching, retry cap) is shared.

Run it ONLY on dropDuplicates(skeleton_hash) rows — the dedup-before-UDF
pattern (SURVEY.md §4; src/extraction/extract.rs:170-246).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

ABI_ENTRY = StructType(
    [
        StructField("type", StringType()),
        StructField("name", StringType()),
        StructField("inputs", StringType()),
        StructField("outputs", StringType()),
    ]
)
DECOMPILED_SCHEMA = ArrayType(ABI_ENTRY)


def lift_selectors(code: bytes) -> list[str]:
    """4-byte selectors from PUSH4 arguments in the dispatch region.

    Heuristic: dispatchers live before the first JUMPDEST-heavy body; we
    simply take every distinct PUSH4 argument that is compared (the common
    compiler patterns place them anywhere in the prelude) — a superset
    lifter, deterministic and dependency-free."""
    out: list[str] = []
    seen: set[str] = set()
    i = 0
    n = len(code)
    while i < n:
        op = code[i]
        i += 1
        if 0x60 <= op <= 0x7F:
            width = op - 0x5F
            if op == 0x63 and i + 4 <= n:  # PUSH4
                sel = code[i : i + 4].hex()
                if sel not in seen and sel != "ffffffff":
                    seen.add(sel)
                    out.append(sel)
            i += width
    return out


def selector_lifter(bytecode_hex: str | None) -> list[dict]:
    """Default decompiler: unresolved function entry per lifted selector."""
    if not bytecode_hex:
        return []
    h = bytecode_hex[2:] if bytecode_hex.startswith("0x") else bytecode_hex
    try:
        code = bytes.fromhex(h)
    except ValueError:
        return []
    return [
        {"type": "function", "name": f"Unresolved_{sel}", "inputs": None, "outputs": None}
        for sel in lift_selectors(code)
    ]


def decompile_udf(impl: Callable[[str | None], list[dict]] = selector_lifter):
    """Arrow-batched UDF wrapping any decompiler implementation. A failed
    row yields None (-> failed_decompilation=true downstream), mirroring the
    reference's bounded-retry give-up (src/extraction/extract.rs:184-245)."""

    @pandas_udf(DECOMPILED_SCHEMA)
    def udf(code_hex: pd.Series) -> pd.Series:
        def one(v):
            try:
                return impl(v)
            except Exception:  # noqa: BLE001 — decompiler failure is data, not a crash
                return None

        return code_hex.map(one)

    return udf
