"""THE single malformed-hex policy for the byte kernels.

Every kernel that turns a 0x-hex bytecode column into bytes must treat
malformed hex (odd length, non-hex chars — truncated/corrupt ingest) the
same way: as CORRUPT input, signalled by None, which each kernel maps to
its own null representation (None skeleton, all-None metadata struct,
empty n-gram list). Before this helper the strip-prefix + fromhex +
error-handling boilerplate lived in five kernels with three divergent
policies (skeleton nulled, metadata fabricated an empty contract, ngrams
returned []), and a policy fix in one silently missed the others.

keccak._to_raw and u256 are deliberately NOT routed through this: their
inputs are signatures/values where a 0x-prefixed non-hex string is still
meaningful data (hash the utf-8 / parse as int), not bytecode.
"""

from __future__ import annotations


def parse_bytecode_hex(code_hex: str | None) -> bytes | None:
    """0x-hex (prefix optional) -> bytes; None for null input or malformed
    hex. Callers map None to their kernel's null representation."""
    if code_hex is None:
        return None
    h = code_hex[2:] if code_hex.startswith("0x") else code_hex
    try:
        return bytes.fromhex(h)
    except ValueError:
        return None
