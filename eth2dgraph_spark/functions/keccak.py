"""Keccak-256 (the pre-NIST Keccak used by Ethereum; NOT SHA3-256 — the
padding domain byte differs: 0x01 here vs 0x06 in FIPS-202).

Used for ABI signature hashing (P13, src/models/function.rs:18-28) and
skeleton hashing (src/models/contract_deployment.rs:110-112).

Implementation: pycryptodome's C keccak when importable (the fast path on a
real cluster); otherwise a pure-Python Keccak-f[1600] sponge implemented from
the public Keccak reference (keccak.team). Exposed to DataFrames as an
Arrow-batched pandas_udf — signature hashing runs only on globally deduped
ABI rows (A4), so the Python cost is bounded by distinct signatures, not
table size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # fast path
    from Crypto.Hash import keccak as _pyc_keccak  # type: ignore

    def keccak256(data: bytes) -> bytes:
        return _pyc_keccak.new(digest_bits=256, data=data).digest()

except ImportError:  # pure-Python fallback
    _MASK = (1 << 64) - 1
    _RC = [
        0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
        0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
        0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
        0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
        0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
        0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
    ]
    # rotation offsets r[x][y]
    _R = [
        [0, 36, 3, 41, 18],
        [1, 44, 10, 45, 2],
        [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56],
        [27, 20, 39, 8, 14],
    ]

    def _rotl(v: int, n: int) -> int:
        return ((v << n) | (v >> (64 - n))) & _MASK if n else v

    def _keccak_f(s: list[int]) -> list[int]:
        for rc in _RC:
            # theta
            c = [s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20] for x in range(5)]
            d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
            for x in range(5):
                for y in range(5):
                    s[x + 5 * y] ^= d[x]
            # rho + pi
            b = [0] * 25
            for x in range(5):
                for y in range(5):
                    b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl(s[x + 5 * y], _R[x][y])
            # chi
            for x in range(5):
                for y in range(5):
                    s[x + 5 * y] = b[x + 5 * y] ^ ((b[(x + 1) % 5 + 5 * y] ^ _MASK) & b[(x + 2) % 5 + 5 * y])
            # iota
            s[0] ^= rc
        return s

    def keccak256(data: bytes) -> bytes:
        rate = 136  # 1600 - 2*256 bits
        s = [0] * 25
        padded = bytearray(data)
        pad_len = rate - (len(data) % rate)
        padded += b"\x01" + b"\x00" * (pad_len - 1)
        padded[-1] |= 0x80
        for off in range(0, len(padded), rate):
            for i in range(rate // 8):
                s[i] ^= int.from_bytes(padded[off + 8 * i : off + 8 * i + 8], "little")
            s = _keccak_f(s)
        return b"".join(s[i].to_bytes(8, "little") for i in range(4))


def keccak256_hex(data: bytes) -> str:
    return keccak256(data).hex()


@pandas_udf(StringType())
def keccak256_udf(col: pd.Series) -> pd.Series:
    """keccak256 over a string column (utf-8) or a 0x-hex column when the
    value starts with 0x — returns 0x-prefixed hex digest."""

    def one(v):
        if v is None:
            return None
        if isinstance(v, bytes):
            raw = v
        elif isinstance(v, str) and v.startswith("0x"):
            raw = bytes.fromhex(v[2:])
        else:
            raw = str(v).encode("utf-8")
        return "0x" + keccak256_hex(raw)

    return col.map(one)
