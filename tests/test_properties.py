"""Property-based tests (hypothesis) over the pure byte kernels — a layer
the reference has none of (SURVEY §5: inline example tests only). No Spark
session here: these pin the Python/numpy kernels the Arrow UDFs wrap, on
randomized inputs, against their interpreted reference implementations.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from eth2dgraph_spark.functions.keccak import keccak256, keccak256_batch
from eth2dgraph_spark.functions.metadata import split_metadata
from eth2dgraph_spark.functions.ngrams import _opcode_tokens_scalar, opcode_ngrams, opcode_tokens
from eth2dgraph_spark.functions.skeleton import (
    _extract_skeleton_scalar,
    extract_skeleton,
    instruction_mask,
)

bytecode = st.binary(min_size=0, max_size=4096)


@settings(max_examples=200, deadline=None)
@given(bytecode)
def test_skeleton_numpy_equals_scalar(code):
    assert extract_skeleton(code) == _extract_skeleton_scalar(code)


@settings(max_examples=200, deadline=None)
@given(bytecode)
def test_instruction_mask_partitions_bytecode(code):
    # every byte is either an instruction start or a PUSH argument of the
    # nearest preceding start — the mask must reproduce the interpreted walk
    arr = np.frombuffer(code, dtype=np.uint8)
    mask = instruction_mask(arr)
    starts = []
    i = 0
    while i < len(code):
        starts.append(i)
        op = code[i]
        i += 1
        if 0x60 <= op <= 0x7F:
            i += op - 0x5F
    assert list(np.flatnonzero(mask)) == starts


@settings(max_examples=200, deadline=None)
@given(bytecode)
def test_opcode_tokens_matches_scalar_and_mask(code):
    toks = opcode_tokens(code)
    assert list(toks) == _opcode_tokens_scalar(code)
    # tokens are exactly the masked bytes, in order
    arr = np.frombuffer(code, dtype=np.uint8)
    assert toks == arr[instruction_mask(arr)].tobytes()


@settings(max_examples=100, deadline=None)
@given(bytecode, st.integers(min_value=2, max_value=8))
def test_opcode_ngrams_window_properties(code, n):
    grams = opcode_ngrams(code, n)
    toks = opcode_tokens(code)
    assert len(grams) == max(len(toks) - n + 1, 0)
    for i, g in enumerate(grams):
        assert bytes.fromhex(g) == toks[i : i + n]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=600), min_size=0, max_size=20))
def test_keccak_batch_equals_scalar(datas):
    assert keccak256_batch(datas) == [keccak256(d) for d in datas]


KNOWN_KECCAK_EMPTY = bytes.fromhex(
    "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
)


def test_keccak_known_vector():
    assert keccak256(b"") == KNOWN_KECCAK_EMPTY


@settings(max_examples=200, deadline=None)
@given(bytecode)
def test_split_metadata_rejoins_losslessly(code):
    runtime, meta = split_metadata(code)
    if meta is None:
        assert runtime == code
    else:
        # the CBOR tail is length-suffixed: runtime + meta + 2-byte length
        assert runtime + meta + len(meta).to_bytes(2, "big") == code


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh ", min_size=0, max_size=40), min_size=0, max_size=50))
def test_misra_gries_undercount_bound(tokens):
    # MG counts are lower bounds with error <= total/cap
    import pandas as pd

    from eth2dgraph_spark.pipeline.sketch import _mg_update

    cap = 8
    mg: dict[str, int] = {}
    true: dict[str, int] = {}
    for t in tokens:
        true[t] = true.get(t, 0) + 1
    for i in range(0, len(tokens), 10):
        batch = tokens[i : i + 10]
        if batch:
            _mg_update(mg, pd.Series(batch).value_counts(), cap)
    total = len(tokens)
    for t, c in mg.items():
        assert c <= true[t]  # never overcounts
    for t, c in true.items():
        est = mg.get(t, 0)
        assert c - est <= total / cap + 1e-9  # undercount bounded


@settings(max_examples=200, deadline=None)
@given(bytecode)
def test_decode_metadata_never_crashes(raw):
    # at corpus scale malformed CBOR tails are data: the decoder must
    # return a dict (possibly with an 'error' marker), never raise
    from eth2dgraph_spark.functions.metadata import decode_metadata

    out = decode_metadata(raw)
    assert isinstance(out, dict)


@settings(max_examples=200, deadline=None)
@given(bytecode)
def test_split_and_decode_hex_never_crashes(raw):
    from eth2dgraph_spark.functions.metadata import split_and_decode_hex

    out = split_and_decode_hex("0x" + raw.hex())
    assert isinstance(out, dict)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_parse_abi_json_raises_cleanly_or_parses(s):
    # any non-ABI input must surface as ValueError/json error, never a
    # different crash class (TypeError/KeyError/AttributeError)
    import json

    from eth2dgraph_spark.functions.decompile import parse_abi_json

    try:
        out = parse_abi_json(s)
        assert isinstance(out, list)
    except (ValueError, json.JSONDecodeError):
        pass


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**256 - 1), min_size=0, max_size=30))
def test_u256_python_sum_identity(vals):
    # the kernel's per-batch partial is a plain python-int sum — pin the
    # arithmetic identity the Spark paths rely on (no float, no overflow)
    total = sum(vals)
    assert sum(int(str(v)) for v in vals) == total
    assert total < 2**261  # 30 values of < 2^256 stay exact in python int
