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

import json
import os
import shutil
import subprocess
import tempfile
from typing import Callable

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType
from .hexparse import parse_bytecode_hex

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
    code = parse_bytecode_hex(bytecode_hex)
    if code is None:  # malformed hex: no selectors liftable
        return []
    return [
        {"type": "function", "name": f"Unresolved_{sel}", "inputs": None, "outputs": None}
        for sel in lift_selectors(code)
    ]


class DecompilerEnvironmentError(RuntimeError):
    """The decompiler could not even be SPAWNED (missing binary, not
    executable): an environment misconfiguration, not per-contract data —
    decompile_udf re-raises it to fail the task instead of nulling rows."""


class DecompilationError(Exception):
    """Raised when every attempt failed; `kind` mirrors the reference's enum
    Timeout | FailedToReadABI | FailedToParseABI (src/utils/decompile.rs:8-12)."""

    def __init__(self, kind: str, detail: str = ""):
        super().__init__(f"{kind}{': ' + detail if detail else ''}")
        self.kind = kind


def parse_abi_json(text: str) -> list[dict]:
    """Standard ABI JSON array -> rows matching ABI_ENTRY: inputs/outputs as
    comma-joined type strings, the reference's Function/Event/Error model
    (src/models/function.rs:30-36, src/models/abi.rs:62-70)."""
    nodes = json.loads(text)
    if not isinstance(nodes, list):
        raise ValueError("ABI json must be an array")
    out = []
    for node in nodes:
        kind = node.get("type")
        if kind not in ("function", "event", "error"):
            continue  # constructor/fallback/receive carry no signature
        out.append(
            {
                "type": kind,
                "name": node.get("name"),
                "inputs": ",".join(p.get("type", "") for p in node.get("inputs", []) or []),
                "outputs": ",".join(p.get("type", "") for p in node.get("outputs", []) or [])
                if kind == "function"
                else None,
            }
        )
    return out


def subprocess_decompiler(
    cmd: list[str] | None = None,
    timeout_ms: int = 5000,
    max_retries: int = 10,
) -> Callable[[str | None], list[dict]]:
    """External-decompiler runner with the reference's process semantics
    (src/utils/decompile.rs:14-65): spawn the command with stdout/stderr
    discarded, KILL it after `timeout_ms`, read `<output_dir>/abi.json`,
    parse it, and always clean the work dir. `cmd` is an argv template;
    `{bytecode}` and `{output_dir}` are substituted per call (the default
    mirrors `heimdall decompile <code> --default --output <dir>`, with a
    unique temp dir standing in for the reference's .tmp/<address>/).

    Retry cap: the reference tracks <=10 attempts per distinct skeleton in a
    DashMap and retries on later encounters (src/extraction/extract.rs:
    184-245); here the distinct-skeleton frame visits each skeleton once, so
    the cap becomes an in-call bounded loop with the same give-up semantics
    for RETRYABLE failures (timeout, missing output file). FailedToParseABI
    is terminal — the tool ran and wrote garbage; that is deterministic, so
    it gives up on the first parse failure. Giving up raises
    DecompilationError, which decompile_udf turns into a null row ->
    failed_decompilation=true downstream.

    The returned callable exposes `impl.stats` (attempts/timeouts/failures)
    for bookkeeping; stats are per-process (executor-local under Spark)."""
    cmd = cmd or [
        "heimdall",
        "decompile",
        "{bytecode}",
        "--default",
        "--output",
        "{output_dir}",
    ]

    def impl(bytecode_hex: str | None) -> list[dict]:
        if not bytecode_hex:
            return []
        last: DecompilationError | None = None
        for _ in range(max_retries):
            impl.stats["attempts"] += 1
            out_dir = tempfile.mkdtemp(prefix="eth2dgraph-decompile-")
            try:
                argv = [
                    a.format(bytecode=bytecode_hex, output_dir=out_dir) for a in cmd
                ]
                try:
                    subprocess.run(
                        argv,
                        stdout=subprocess.DEVNULL,
                        stderr=subprocess.DEVNULL,
                        timeout=timeout_ms / 1000.0,
                    )
                except subprocess.TimeoutExpired:  # run() kills the child
                    impl.stats["timeouts"] += 1
                    last = DecompilationError("Timeout")
                    continue
                except OSError as exc:
                    # binary missing / not executable: an ENVIRONMENT error,
                    # not per-contract data. Fail the task loudly —
                    # swallowed into the per-row None path it would mark
                    # EVERY skeleton failed_decompilation=true and the run
                    # would 'succeed' with an empty ABI table
                    raise DecompilerEnvironmentError(
                        f"decompiler spawn failed ({argv[0]!r}): {exc} — "
                        "install the binary on every executor or pass a "
                        "different decompiler"
                    ) from exc
                try:
                    with open(os.path.join(out_dir, "abi.json")) as fh:
                        text = fh.read()
                except OSError:
                    impl.stats["failures"] += 1
                    last = DecompilationError("FailedToReadABI")
                    continue
                try:
                    return parse_abi_json(text)
                except Exception as exc:  # noqa: BLE001 — malformed ABI is data
                    impl.stats["failures"] += 1
                    last = DecompilationError("FailedToParseABI", str(exc))
                    # TERMINAL: the decompiler ran and produced output; a
                    # parse failure is deterministic, so re-running would
                    # spend the whole retry budget (up to max_retries x
                    # timeout of blocked executor core) to fail identically.
                    # Timeouts/missing-output above stay retryable — those
                    # are environmental.
                    break
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
        raise last if last is not None else DecompilationError("FailedToReadABI")

    impl.stats = {"attempts": 0, "timeouts": 0, "failures": 0}
    return impl


def decompile_udf(impl: Callable[[str | None], list[dict]] = selector_lifter):
    """Arrow-batched UDF wrapping any decompiler implementation. A failed
    row yields None (-> failed_decompilation=true downstream), mirroring the
    reference's bounded-retry give-up (src/extraction/extract.rs:184-245)."""

    @pandas_udf(DECOMPILED_SCHEMA)
    def udf(code_hex: pd.Series) -> pd.Series:
        def one(v):
            try:
                return impl(v)
            except DecompilerEnvironmentError:
                # environment errors (missing binary, env mismatch) must
                # fail the task, not become silent per-row nulls
                raise
            except Exception:  # noqa: BLE001 — decompiler failure is data, not a crash
                return None

        return code_hex.map(one)

    return udf
