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


# ---- WordPiece pure-Python kernels (pipeline/wordpiece.py) ----

from eth2dgraph_spark.pipeline.wordpiece import (  # noqa: E402
    CONT,
    UNK,
    _encode_word,
    _merge_word_local,
    _seg_local,
    _train_local,
)

words_strategy = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=8), min_size=1, max_size=20
)


@settings(max_examples=100, deadline=None)
@given(words_strategy)
def test_wordpiece_training_words_never_unk(ws):
    """The seed alphabet stays in the vocabulary, so every TRAINING word
    must encode without [UNK], and its pieces must concatenate back to the
    word with the '##' shape invariant (first raw, rest continuations)."""
    counts: dict[str, int] = {}
    for w in ws:
        counts[w] = counts.get(w, 0) + 1
    merges = _train_local(list(counts.items()), num_merges=6, min_pair_freq=1)
    pieces = frozenset(
        {s for w in counts for s in _seg_local(w)} | {m[3] for m in merges}
    )
    max_raw = max(len(p) - len(CONT) if p.startswith(CONT) else len(p) for p in pieces)
    for w in counts:
        toks = _encode_word(w, pieces, max_raw)
        assert toks != [UNK], (w, sorted(pieces))
        assert not toks[0].startswith(CONT)
        assert all(t.startswith(CONT) for t in toks[1:])
        rebuilt = toks[0] + "".join(t[len(CONT):] for t in toks[1:])
        assert rebuilt == w


@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from(["a", "##a", "##b", "c"]), min_size=0, max_size=12))
def test_wordpiece_merge_fold_nonoverlap_and_lossless(syms):
    """_merge_word_local merges left-to-right without overlap: un-merging
    the output reproduces the input, and no adjacent (left, right) pair
    survives unmerged unless its left was itself consumed by the previous
    merge (the 'aaa' -> [aa, a] rule)."""
    left, right = "##a", "##b"
    merged = left + right[len(CONT):]
    out = _merge_word_local(tuple(syms), left, right)
    # lossless: splitting every merged symbol back gives the input
    unfolded: list[str] = []
    for s in out:
        if s == merged:
            unfolded.extend([left, right])
        else:
            unfolded.append(s)
    assert unfolded == list(syms)
    # non-overlap + completeness on an isolated scan
    i, expect = 0, []
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            expect.append(merged)
            i += 2
        else:
            expect.append(syms[i])
            i += 1
    assert list(out) == expect


# ---- HLL register math (pipeline/hll.py) ----

import hashlib  # noqa: E402
import math  # noqa: E402


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="xyz019", min_size=1, max_size=12),
                min_size=1, max_size=300), st.sampled_from([4, 6, 8]))
def test_hll_reference_estimate_error_bound(vals, p):
    """The pure-Python mirror of the Spark/SQL HLL construction stays
    within 6 sigma (sigma = 1.04/sqrt(m)) of the true distinct count on
    arbitrary inputs — a sanity envelope for the shared math (the exact
    cross-engine equality is the hll_distinct gate's job)."""
    m = 1 << p
    wbits = 60 - p
    regs: dict[int, int] = {}
    for v in set(vals):
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        w = h >> p
        rho = (wbits + 1) - w.bit_length() if w > 0 else wbits + 1
        j = h % m
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(2 ** (61 - r) for r in regs.values()) + (m - len(regs)) * 2**61
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m * float(2**61) / float(s)
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    true_n = len(set(vals))
    sigma = 1.04 / math.sqrt(m)
    assert abs(est - true_n) <= max(6 * sigma * true_n, 3.0), (true_n, est, p)


@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([None, 3, 4]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_arbitrary_arrays(h, w, ch, seed):
    """encode -> decode is the identity for every supported shape."""
    import numpy as np

    from eth2dgraph_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    b = decode_png(encode_png(a))
    assert b.shape == a.shape and (b == a).all()


@given(st.binary(max_size=300))
@settings(max_examples=80, deadline=None)
def test_png_decode_never_crashes_on_garbage(raw):
    """Arbitrary bytes either raise ValueError or decode to a valid uint8
    array — never an unhandled exception (bad bytes are data at corpus
    scale; the decode_features seam depends on this contract)."""
    import numpy as np

    from eth2dgraph_spark.functions.png import decode_png

    try:
        out = decode_png(raw)
    except ValueError:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8


@given(st.integers(0, 2**32 - 1), st.integers(0, 400), st.integers(0, 255))
@settings(max_examples=60, deadline=None)
def test_png_single_flip_rejected_or_valid(seed, pos, newbyte):
    """Flipping any one byte of a valid PNG either trips a CRC/structure
    ValueError or still decodes (flips inside compressed IDAT payload can
    only survive if the CRC was ALSO hit — so surviving decodes must still
    produce a well-formed array)."""
    import numpy as np

    from eth2dgraph_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    enc = bytearray(encode_png(a))
    pos = pos % len(enc)
    if enc[pos] == newbyte:
        newbyte = (newbyte + 1) % 256
    enc[pos] = newbyte
    try:
        out = decode_png(bytes(enc))
    except ValueError:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8


@given(
    st.integers(0, 500),
    st.sampled_from([1, 2, 3, 8]),
    st.sampled_from([8, 16]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_arbitrary_pcm(n, ch, bits, seed):
    """encode -> decode is the identity (up to the documented integer
    normalization) for every supported frame count / channel / depth."""
    import numpy as np

    from eth2dgraph_spark.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    if bits == 16:
        a = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    else:
        a = rng.integers(0, 256, size=(n, ch), dtype=np.uint8)
    out, rate = decode_wav(encode_wav(a, 22050, bits=bits))
    assert rate == 22050 and out.shape == (n, ch)
    back = (
        np.round(out * 32768.0).astype(np.int16)
        if bits == 16
        else np.round(out * 128.0 + 128.0).astype(np.uint8)
    )
    assert (back == a).all()


@given(st.binary(max_size=300))
@settings(max_examples=80, deadline=None)
def test_wav_decode_never_crashes_on_garbage(raw):
    """Arbitrary bytes either raise ValueError or decode to a valid float32
    array — never an unhandled exception (the decode_audio_features seam
    depends on this contract, exactly as the PNG path does)."""
    import numpy as np

    from eth2dgraph_spark.functions.wav import decode_wav

    try:
        out, rate = decode_wav(raw)
    except ValueError:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.float32 and rate > 0


@given(st.integers(0, 2**32 - 1), st.integers(0, 400), st.integers(0, 255))
@settings(max_examples=60, deadline=None)
def test_wav_single_flip_rejected_or_decodes(seed, pos, newbyte):
    """Flipping any one byte of a valid WAV either trips a strict
    cross-field ValueError or still decodes (flips inside the pcm payload
    are sample changes, not corruption — WAV has no CRC); survivors must
    still produce a well-formed, in-range array."""
    import numpy as np

    from eth2dgraph_spark.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    a = rng.integers(-32768, 32768, size=(rng.integers(1, 60), 2), dtype=np.int16)
    enc = bytearray(encode_wav(a, 8000))
    pos = pos % len(enc)
    if enc[pos] == newbyte:
        newbyte = (newbyte + 1) % 256
    enc[pos] = newbyte
    try:
        out, _ = decode_wav(bytes(enc))
    except ValueError:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.float32
    assert np.abs(out).max() <= 1.0


@given(
    st.integers(1, 4),
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(1, 60),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_arbitrary_clips(n, h, w, fps, seed):
    """encode -> decode is the identity for every supported clip shape,
    including widths that force DIB stride padding."""
    import numpy as np

    from eth2dgraph_spark.functions.avi import decode_avi, encode_avi

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    out, got_fps = decode_avi(encode_avi(a, fps=fps))
    assert got_fps == float(fps)
    assert out.shape == a.shape and (out == a).all()


@given(st.binary(max_size=400))
@settings(max_examples=80, deadline=None)
def test_avi_decode_never_crashes_on_garbage(raw):
    """Arbitrary bytes either raise ValueError or decode to a valid uint8
    frame array — never an unhandled exception (the decode_video_frames
    seam depends on this contract, exactly as the PNG/WAV paths do)."""
    import numpy as np

    from eth2dgraph_spark.functions.avi import decode_avi

    try:
        out, fps = decode_avi(raw)
    except ValueError:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8 and fps > 0


@given(st.integers(0, 2**32 - 1), st.integers(0, 800), st.integers(0, 255))
@settings(max_examples=60, deadline=None)
def test_avi_single_flip_rejected_or_decodes(seed, pos, newbyte):
    """Flipping any one byte of a valid AVI either trips a strict
    cross-field ValueError or still decodes (flips inside the frame pixel
    payload are pixel changes, not corruption — AVI has no CRC);
    survivors must still produce a well-formed frame array of the
    original geometry."""
    import numpy as np

    from eth2dgraph_spark.functions.avi import decode_avi, encode_avi

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(2, 6, 5, 3), dtype=np.uint8)
    enc = bytearray(encode_avi(a, fps=10))
    pos = pos % len(enc)
    if enc[pos] == newbyte:
        newbyte = (newbyte + 1) % 256
    enc[pos] = newbyte
    try:
        out, _ = decode_avi(bytes(enc))
    except ValueError:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8
    assert out.shape == a.shape


# ---------------------------------------------------------------- jpeg

from eth2dgraph_spark.functions.jpeg import decode_jpeg, encode_jpeg  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.sampled_from([50, 75, 95, 100]),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_roundtrip_any_geometry_bounded_error(h, w, quality, seed):
    """encode->decode never crashes and never drifts unboundedly for ANY
    geometry (including 1x1 and non-multiple-of-8 edges): output shape is
    exact; per-pixel error is bounded by the quantization step budget
    (empirically < 128 even at quality 50 on white-noise input — the
    worst case for a DCT codec; the property is no-crash + geometry +
    sane-range, not a tight bound)."""
    rs = np.random.RandomState(seed)
    img = rs.randint(0, 256, size=(h, w), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == (h, w) and dec.dtype == np.uint8
    err = np.max(np.abs(dec.astype(int) - img.astype(int)))
    assert err <= (1 if quality == 100 else 200)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_jpeg_garbage_raises_valueerror_only(blob):
    """Arbitrary bytes (with or without an SOI prefix) either decode or
    raise ValueError — never IndexError/KeyError/struct.error leaking out
    of the parser (the 'error'-row contract of the multimodal kernels)."""
    for payload in (blob, b"\xff\xd8" + blob):
        try:
            out = decode_jpeg(payload)
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 560))
def test_jpeg_truncation_raises_valueerror_only(seed, cut):
    """Every prefix of a valid JPEG either decodes (a cut exactly at EOI
    cannot happen — EOI is checked) or raises ValueError."""
    rs = np.random.RandomState(seed)
    img = rs.randint(0, 256, size=(16, 16), dtype=np.uint8)
    enc = encode_jpeg(img, quality=75)
    cut = min(cut, len(enc) - 1)
    try:
        decode_jpeg(enc[:cut])
    except ValueError:
        pass
