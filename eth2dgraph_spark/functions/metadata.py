"""Compiler-metadata split + CBOR decode (P6/P7).

Reference: src/utils/metadata.rs —
  - split (:20-34): the *last* occurrence of one of the CBOR map markers
    (\xa1\x65bzzr0 | \xa2\x65bzzr0 | \xa2\x65bzzr1 | \xa2\x64ipfs) splits the
    deployed bytecode into runtime code and metadata tail.
  - decode (:36-102): the metadata tail is a small CBOR map with keys
    bzzr0/bzzr1/ipfs (storage hash), solc (3-byte version), experimental.

cbor2 is not assumed; the decoder below handles exactly the subset solc
emits (tiny maps, byte/text strings, bools) — implemented from the public
CBOR spec (RFC 8949). Exposed as one pandas_udf returning a struct.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType, StructField, StructType
from .hexparse import parse_bytecode_hex

_MARKERS = re.compile(
    b"(\xa1\x65bzzr0)|(\xa2\x65bzzr0)|(\xa2\x65bzzr1)|(\xa2\x64ipfs)", re.DOTALL
)

METADATA_SCHEMA = StructType(
    [
        StructField("runtime_code", StringType()),  # 0x-hex, metadata stripped
        StructField("storage_protocol", StringType()),  # bzzr0|bzzr1|ipfs
        StructField("storage_address", StringType()),  # hex hash
        StructField("solc_version", StringType()),  # e.g. 0.8.19
        StructField("experimental", BooleanType()),
    ]
)


def split_metadata(code: bytes) -> tuple[bytes, bytes | None]:
    """Split deployed bytecode at the LAST CBOR marker match
    (src/utils/metadata.rs:20-34). Returns (runtime, metadata|None)."""
    last = None
    for m in _MARKERS.finditer(code):
        last = m
    if last is None:
        return code, None
    return code[: last.start()], code[last.start() :]


def _read_cbor_item(buf: bytes, i: int):
    """Minimal CBOR (RFC 8949) for the solc metadata subset."""
    if i >= len(buf):
        raise ValueError("truncated")
    b = buf[i]
    major, info = b >> 5, b & 0x1F
    i += 1
    if info < 24:
        arg = info
    elif info == 24:
        arg = buf[i]
        i += 1
    elif info == 25:
        arg = int.from_bytes(buf[i : i + 2], "big")
        i += 2
    elif info == 26:
        arg = int.from_bytes(buf[i : i + 4], "big")
        i += 4
    else:
        raise ValueError(f"unsupported CBOR info {info}")
    if major == 0:  # uint
        return arg, i
    if major in (2, 3) and i + arg > len(buf):
        # a declared length past the buffer end is TRUNCATED metadata
        # (corrupt ingest): slicing would silently return fewer bytes and
        # fabricate a short-but-plausible storage hash — reject like a
        # real CBOR parser (decode_metadata maps the error to all-None)
        raise ValueError("truncated")
    if major == 2:  # bytes
        return buf[i : i + arg], i + arg
    if major == 3:  # text
        return buf[i : i + arg].decode("utf-8", "replace"), i + arg
    if major == 5:  # map
        out = {}
        for _ in range(arg):
            k, i = _read_cbor_item(buf, i)
            v, i = _read_cbor_item(buf, i)
            out[k] = v
        return out, i
    if major == 7:  # simple: false/true
        if arg == 20:
            return False, i
        if arg == 21:
            return True, i
    raise ValueError(f"unsupported CBOR major {major}")


_EMPTY = {
    "storage_protocol": None,
    "storage_address": None,
    "solc_version": None,
    "experimental": None,
}


def decode_metadata(meta: bytes) -> dict:
    """CBOR map -> {storage_protocol, storage_address, solc_version,
    experimental} (src/utils/metadata.rs:36-102).

    Matches the reference exactly: any unknown key invalidates the whole map
    (metadata.rs:98), solc may be a 3-byte version or a text string (:55-66),
    experimental defaults to false and ignores non-bool values (:92-97)."""
    out: dict = dict(_EMPTY)
    try:
        m, _ = _read_cbor_item(meta, 0)
    except Exception:
        return out
    if not isinstance(m, dict) or not m:
        return out
    parsed: dict = {
        "storage_protocol": None,
        "storage_address": None,
        "solc_version": None,
        "experimental": False,
    }
    for key, value in m.items():
        if key == "solc":
            if isinstance(value, str):
                parsed["solc_version"] = value
            elif isinstance(value, (bytes, bytearray)):
                parsed["solc_version"] = ".".join(str(b) for b in value)
        elif key in ("bzzr0", "bzzr1", "ipfs"):
            if not isinstance(value, (bytes, bytearray)):
                return out
            parsed["storage_protocol"] = key
            parsed["storage_address"] = bytes(value).hex()
        elif key == "experimental":
            if isinstance(value, bool):
                parsed["experimental"] = value
        else:  # unknown key -> whole metadata rejected (metadata.rs:98)
            return out
    return parsed


def split_and_decode_hex(code_hex: str | None) -> dict:
    if code_hex is None:
        return {"runtime_code": None, "storage_protocol": None, "storage_address": None,
                "solc_version": None, "experimental": None}
    code = parse_bytecode_hex(code_hex)
    if code is None:
        # malformed hex (odd length, non-hex chars) is CORRUPT input, not
        # an empty contract: runtime_code=None matches the skeleton
        # kernel's policy so the same corrupt row is null in BOTH derived
        # columns instead of null in one and '0x' in the other
        return {"runtime_code": None, "storage_protocol": None, "storage_address": None,
                "solc_version": None, "experimental": None}
    runtime, meta = split_metadata(code)
    out = decode_metadata(meta) if meta else {
        "storage_protocol": None, "storage_address": None,
        "solc_version": None, "experimental": None,
    }
    out["runtime_code"] = "0x" + runtime.hex()
    return out


@pandas_udf(METADATA_SCHEMA)
def metadata_udf(code_hex: pd.Series) -> pd.DataFrame:
    rows = code_hex.map(split_and_decode_hex)
    return pd.DataFrame(list(rows))
