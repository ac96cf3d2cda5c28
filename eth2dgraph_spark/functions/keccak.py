"""Keccak-256 (the pre-NIST Keccak used by Ethereum; NOT SHA3-256 — the
padding domain byte differs: 0x01 here vs 0x06 in FIPS-202).

Used for ABI signature hashing (P13, src/models/function.rs:18-28) and
skeleton hashing (src/models/contract_deployment.rs:110-112).

Implementation: pycryptodome's C keccak when importable (the fast path on a
real cluster); otherwise a pure-Python Keccak-f[1600] sponge implemented from
the public Keccak reference (keccak.team). Exposed to DataFrames as an
Arrow-batched pandas_udf.

Cost note: unlike the decompiler (which is gated behind skeleton dedup —
the dedup-before-UDF rule), signature hashing runs inline per ABI-entry row
DELIBERATELY: the vectorized keccak batch is ~µs/row, cheaper than the
distinct+join shuffle a dedup-then-join would add, and the entries frame is
already per-distinct-skeleton (not per-deployment), which bounds the
duplication factor to signatures shared across skeletons.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # fast path
    from Crypto.Hash import keccak as _pyc_keccak  # type: ignore

    def keccak256(data: bytes) -> bytes:
        return _pyc_keccak.new(digest_bits=256, data=data).digest()

    def keccak256_batch(datas: list[bytes]) -> list[bytes]:
        return [keccak256(d) for d in datas]  # C per call — already fast

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

    # ---- batched sponge: SIMD across messages --------------------------
    # The scalar fallback costs ~0.5 ms per 136-byte block (24 rounds of
    # interpreted lane ops). The batch form keeps one (M, 25) uint64 state
    # matrix and runs each Keccak-f round as whole-array numpy ops, so the
    # interpreter cost is per ROUND, not per row*round: ~100x on wide
    # Arrow batches. Rows with different lengths are handled block-by-block
    # with an active-row mask (rows absorb only while they still have
    # blocks), which keeps the state gather/scatter bounded.

    import numpy as _np

    _RC_V = _np.array(_RC, dtype=_np.uint64)

    def _rotl_v(v, n: int):
        if n == 0:
            # copy, not the input: rho stores these into b[], and chi then
            # writes s in place — returning a view of an s column here would
            # let chi corrupt b mid-round (_R[0][0] == 0 hits this)
            return v.copy()
        return (v << _np.uint64(n)) | (v >> _np.uint64(64 - n))

    def _keccak_f_batch(s):
        """One Keccak-f[1600] permutation over an (M, 25) uint64 state."""
        for rc in _RC_V:
            c = [s[:, x] ^ s[:, x + 5] ^ s[:, x + 10] ^ s[:, x + 15] ^ s[:, x + 20] for x in range(5)]
            d = [c[(x - 1) % 5] ^ _rotl_v(c[(x + 1) % 5], 1) for x in range(5)]
            for x in range(5):
                for y in range(5):
                    s[:, x + 5 * y] ^= d[x]
            b = [None] * 25
            for x in range(5):
                for y in range(5):
                    b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl_v(s[:, x + 5 * y], _R[x][y])
            for x in range(5):
                for y in range(5):
                    s[:, x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y])
            s[:, 0] ^= rc
        return s

    def keccak256_batch(datas: list[bytes]) -> list[bytes]:
        rate = 136
        n = len(datas)
        if n == 0:
            return []
        padded = []
        nblocks = _np.empty(n, dtype=_np.int64)
        for i, data in enumerate(datas):
            pad_len = rate - (len(data) % rate)
            p = bytearray(data)
            p += b"\x01" + b"\x00" * (pad_len - 1)
            p[-1] |= 0x80
            padded.append(bytes(p))
            nblocks[i] = len(p) // rate
        states = _np.zeros((n, 25), dtype=_np.uint64)
        for blk in range(int(nblocks.max())):
            idx = _np.flatnonzero(nblocks > blk)
            chunk = _np.frombuffer(
                b"".join(padded[i][blk * rate : (blk + 1) * rate] for i in idx),
                dtype="<u8",
            ).reshape(len(idx), rate // 8)
            sub = states[idx]
            sub[:, : rate // 8] ^= chunk
            states[idx] = _keccak_f_batch(sub)
        dig = _np.ascontiguousarray(states[:, :4]).astype("<u8").tobytes()
        return [dig[32 * i : 32 * (i + 1)] for i in range(n)]


def keccak256_hex(data: bytes) -> str:
    return keccak256(data).hex()


def _to_raw(v):
    if isinstance(v, bytes):
        return v
    if isinstance(v, str) and v.startswith("0x"):
        # malformed hex after a 0x prefix (odd length, non-hex chars — e.g.
        # a pluggable decompiler emitting a name like '0xTransfer') is per-
        # row data, not a task killer: hash the raw utf-8 instead of letting
        # fromhex's ValueError fail the whole Arrow batch
        try:
            return bytes.fromhex(v[2:])
        except ValueError:
            return v.encode("utf-8")
    return str(v).encode("utf-8")


@pandas_udf(StringType())
def keccak256_udf(col: pd.Series) -> pd.Series:
    """keccak256 over a string column (utf-8) or a 0x-hex column when the
    value starts with 0x — returns 0x-prefixed hex digest. The whole Arrow
    batch is hashed in one keccak256_batch call (SIMD across rows on the
    no-pycryptodome path)."""
    vals = col.tolist()
    live = [(i, _to_raw(v)) for i, v in enumerate(vals) if v is not None]
    digests = keccak256_batch([raw for _, raw in live])
    out = [None] * len(vals)
    for (i, _), d in zip(live, digests):
        out[i] = "0x" + d.hex()
    return pd.Series(out, dtype=object)
