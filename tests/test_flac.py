"""Pure-stdlib FLAC codec (functions/flac.py): exact lossless roundtrips,
HAND-BUILT spec bitstreams (the conformance pin — FLAC's losslessness
makes encoder->decoder roundtrips self-healing against symmetric
prediction bugs, so every subframe type / stereo decorrelation / residual
variant is also decoded from bits written out by hand from RFC 9639; no
FLAC asset ships with CPython's test suite, checked — its audio fixtures
are WAV/AIFF/AU), corruption properties (CRC-8/16 + MD5 catch flips),
cross-container fingerprint parity with the WAV codec, and the multimodal
magic-byte dispatch seam."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from eth2dgraph_spark.functions.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8ish_encode,
    decode_flac,
    encode_flac,
)

# ---------------------------------------------------------------- roundtrip


def test_mono_roundtrip_exact_across_frame_boundary():
    rs = np.random.RandomState(7)
    for n in (1, 15, 600, 4096, 9000):  # 9000 spans three 4096 frames
        x = rs.randint(-32768, 32768, size=n).astype(np.int16)
        dec, rate = decode_flac(encode_flac(x, 8000))
        assert rate == 8000
        assert dec.shape == (n, 1)
        assert np.array_equal(dec[:, 0], x.astype(np.float32) / 32768.0), n


def test_smooth_signal_compresses_and_roundtrips():
    t = np.arange(20000)
    sm = (1000 * np.sin(t / 50.0)).astype(np.int16)
    enc = encode_flac(sm, 44100)
    assert len(enc) < 0.3 * 2 * len(sm)  # fixed predictors actually engage
    dec, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], sm.astype(np.float32) / 32768.0)


def test_multichannel_and_8bit_roundtrips():
    rs = np.random.RandomState(3)
    st = rs.randint(-2000, 2000, size=(5000, 3)).astype(np.int16)
    dec, _ = decode_flac(encode_flac(st, 22050))
    assert np.array_equal(dec, st.astype(np.float32) / 32768.0)
    x8 = rs.randint(-128, 128, size=500).astype(np.int8)
    d8, _ = decode_flac(encode_flac(x8, 8000, bits=8))
    assert np.array_equal(d8[:, 0], x8.astype(np.float32) / 128.0)


def test_constant_subframe_tiny_output():
    c = np.full(3000, -12345, dtype=np.int16)
    enc = encode_flac(c, 1000)
    assert len(enc) < 80  # CONSTANT subframe, not 6 KB of PCM
    dec, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], c.astype(np.float32) / 32768.0)


def test_float_quantization_parity_with_wav():
    """encode_flac(float) quantizes exactly like encode_wav's 16-bit path,
    so either container decodes to the same float32 samples — the property
    that transfers the WAV gates' closed-form oracles to FLAC."""
    from eth2dgraph_spark.functions.wav import decode_wav, encode_wav

    rs = np.random.RandomState(1)
    sig = rs.rand(777) * 2 - 1
    wf, _ = decode_wav(encode_wav(sig, 8000))
    ff, _ = decode_flac(encode_flac(sig, 8000))
    assert np.array_equal(wf, ff)


# ------------------------------------------------------- hand-built streams


def _container(n, rate, ch_code, bps, write_subframes, md5=b"\x00" * 16, total=None):
    """Minimal fLaC container around hand-authored subframe bits: the
    _BitWriter only PACKS bits; every field value below is written out
    from the spec by hand, independent of encode_flac's choices."""
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocking
    bw.write(7, 4)  # block size: explicit u16 at header end
    bw.write(13, 4)  # sample rate: explicit u16 Hz
    bw.write(ch_code, 4)
    bw.write({8: 1, 16: 4}[bps], 3)
    bw.write(0, 1)  # reserved
    for b in _utf8ish_encode(0):
        bw.write(b, 8)
    bw.write(n - 1, 16)
    bw.write(rate, 16)
    bw.write(_crc8(bytes(bw.buf)), 8)
    write_subframes(bw)
    bw.align()
    body = bw.getvalue()
    frame = body + struct.pack(">H", _crc16(body))
    ch = 2 if ch_code >= 8 else ch_code + 1
    packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | (total or n)
    si = struct.pack(">HH", 16, max(16, n)) + b"\x00" * 6 + packed.to_bytes(8, "big") + md5
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frame


def _vals(dec, col=0):
    return [round(float(v) * 32768.0) for v in dec[:, col]]


def test_hand_constant():
    def sub(bw):
        bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)  # CONSTANT, no waste
        bw.write(-777 & 0xFFFF, 16)

    dec, rate = decode_flac(_container(5, 8000, 0, 16, sub))
    assert rate == 8000
    assert _vals(dec) == [-777] * 5


def test_hand_verbatim():
    want = [100, -100, 32767, -32768]

    def sub(bw):
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)  # VERBATIM
        for v in want:
            bw.write(v & 0xFFFF, 16)

    assert _vals(decode_flac(_container(4, 8000, 0, 16, sub))[0]) == want


def test_hand_fixed_order2():
    """x = [3, 5, 8, 12, 17]: order-2 residuals x[i]-2x[i-1]+x[i-2] are
    [1, 1, 1]; k=0 Rice: zigzag(1)=2 -> '001' each. All bits hand-derived."""
    def sub(bw):
        bw.write(0, 1); bw.write(8 + 2, 6); bw.write(0, 1)  # FIXED order 2
        bw.write(3, 16); bw.write(5, 16)  # warmup
        bw.write(0, 2); bw.write(0, 4)  # method 0 (Rice4), partition order 0
        bw.write(0, 4)  # k = 0
        for _ in range(3):
            bw.write(0b001, 3)  # unary 2 = zigzag(1)

    assert _vals(decode_flac(_container(5, 8000, 0, 16, sub))[0]) == [3, 5, 8, 12, 17]


def test_hand_lpc_order1():
    """LPC order 1, coeff 2, shift 1 => pred = prev (2*prev >> 1).
    x = [10, 13, 17]: residuals [3, 4]; k=3 Rice: zigzag(3)=6 -> '1'+'110',
    zigzag(4)=8 -> '01'+'000'."""
    def sub(bw):
        bw.write(0, 1); bw.write(32, 6); bw.write(0, 1)  # LPC order 1
        bw.write(10, 16)  # warmup
        bw.write(4 - 1, 4)  # precision 4
        bw.write(1, 5)  # shift 1
        bw.write(2, 4)  # coefficient
        bw.write(0, 2); bw.write(0, 4)  # Rice4, po 0
        bw.write(3, 4)  # k = 3
        bw.write(0b1110, 4)   # zigzag 6
        bw.write(0b01000, 5)  # zigzag 8

    assert _vals(decode_flac(_container(3, 8000, 0, 16, sub))[0]) == [10, 13, 17]


def test_hand_left_side():
    """ch_code 8: channel 0 = left (16 bits), channel 1 = side (17 bits);
    right = left - side."""
    def sub(bw):
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        bw.write(100, 16); bw.write(200, 16)  # left
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        bw.write(30, 17); bw.write(-5 & 0x1FFFF, 17)  # side

    dec, _ = decode_flac(_container(2, 8000, 8, 16, sub))
    assert _vals(dec, 0) == [100, 200]
    assert _vals(dec, 1) == [70, 205]


def test_hand_right_side():
    """ch_code 9: channel 0 = side (17 bits), channel 1 = right (16 bits);
    left = right + side."""
    def sub(bw):
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        bw.write(7, 17); bw.write(-3 & 0x1FFFF, 17)  # side
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        bw.write(50, 16); bw.write(60, 16)  # right

    dec, _ = decode_flac(_container(2, 8000, 9, 16, sub))
    assert _vals(dec, 0) == [57, 57]
    assert _vals(dec, 1) == [50, 60]


def test_hand_mid_side():
    """ch_code 10: mid = (l+r)>>1 (16 bits), side = l-r (17 bits).
    (l, r) = (25, 10): mid 17, side 15; reconstruction re-injects the
    dropped low bit from side's parity."""
    def sub(bw):
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        bw.write(17, 16)  # mid
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        bw.write(15, 17)  # side

    dec, _ = decode_flac(_container(1, 8000, 10, 16, sub))
    assert _vals(dec, 0) == [25]
    assert _vals(dec, 1) == [10]


def test_hand_wasted_bits():
    """Wasted-bits flag: unary count-1, samples read at bps-wasted bits
    then shifted left. CONSTANT 21 with 2 wasted bits -> 84."""
    def sub(bw):
        bw.write(0, 1); bw.write(0, 6)
        bw.write(1, 1)      # wasted flag
        bw.write(0b01, 2)   # unary 1 -> wasted = 2
        bw.write(21, 14)    # 16 - 2 effective bits

    assert _vals(decode_flac(_container(4, 8000, 0, 16, sub))[0]) == [84] * 4


def test_hand_rice_escape_partition():
    """Escape parameter (all-ones) -> 5-bit raw size, then raw signed
    residuals. FIXED order 0, raw size 6, values [5, -9, 0]."""
    def sub(bw):
        bw.write(0, 1); bw.write(8, 6); bw.write(0, 1)  # FIXED order 0
        bw.write(0, 2); bw.write(0, 4)
        bw.write(15, 4)  # escape
        bw.write(6, 5)   # raw bit size
        for v in (5, -9, 0):
            bw.write(v & 0x3F, 6)

    assert _vals(decode_flac(_container(3, 8000, 0, 16, sub))[0]) == [5, -9, 0]


def test_hand_rice2_and_partitions():
    """Residual method 1 (5-bit params) with partition order 1: n=4,
    FIXED order 0 -> two partitions of 2; k=0 then k=2."""
    def sub(bw):
        bw.write(0, 1); bw.write(8, 6); bw.write(0, 1)
        bw.write(1, 2)   # method 1 (Rice2)
        bw.write(1, 4)   # partition order 1
        bw.write(0, 5)   # partition 0: k=0
        bw.write(0b01, 2)    # zigzag 1 -> -1
        bw.write(0b1, 1)     # zigzag 0 -> 0
        bw.write(2, 5)   # partition 1: k=2
        bw.write(0b110, 3)   # q=0, rem=2 -> zigzag 2 -> 1
        bw.write(0b0111, 4)  # q=1, rem=3 -> zigzag 7 -> -4

    assert _vals(decode_flac(_container(4, 8000, 0, 16, sub))[0]) == [-1, 0, 1, -4]


def test_hand_md5_verified():
    """A non-zero STREAMINFO MD5 is checked against the DECODED samples:
    the right digest passes, a wrong one raises — the end-to-end
    reconstruction check (catches decode bugs, not just bit corruption)."""
    import hashlib

    want = np.array([[11], [-22]], dtype=np.int16)

    def sub(bw):
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        bw.write(11, 16); bw.write(-22 & 0xFFFF, 16)

    good = hashlib.md5(want.astype("<i2").tobytes()).digest()
    dec, _ = decode_flac(_container(2, 8000, 0, 16, sub, md5=good))
    assert _vals(dec) == [11, -22]
    bad = bytes(16)[:15] + b"\x01"
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(_container(2, 8000, 0, 16, sub, md5=bad))


# ------------------------------------------------------------- corruption


def test_single_byte_flips_caught():
    """CRC-8 (header), CRC-16 (frame), and MD5 (samples) leave no
    unprotected bit in the frame region; STREAMINFO's size-bound fields
    are the only silent-flip surface. Expect >= 90% of single-byte flips
    to raise, and none to escape as a non-ValueError crash."""
    x = (np.arange(200, dtype=np.int16) * 7 % 500 - 250).astype(np.int16)
    enc = bytearray(encode_flac(x, 8000))
    raised = 0
    for i in range(len(enc)):
        bad = bytes(enc[:i]) + bytes([enc[i] ^ 0x41]) + bytes(enc[i + 1 :])
        try:
            out, _ = decode_flac(bad)
            assert isinstance(out, np.ndarray)
        except ValueError:
            raised += 1
    assert raised >= 0.9 * len(enc), f"only {raised}/{len(enc)} flips caught"


def test_truncation_and_garbage():
    x = np.arange(100, dtype=np.int16)
    enc = encode_flac(x, 8000)
    for cut in (4, 20, 41, len(enc) - 1):
        with pytest.raises(ValueError):
            decode_flac(enc[:cut])
    rs = np.random.RandomState(17)
    for n in (0, 1, 6, 40, 300):
        blob = bytes(rs.randint(0, 256, size=n, dtype=np.uint8).tolist())
        for payload in (blob, b"fLaC" + blob):
            with pytest.raises(ValueError):
                decode_flac(payload)


def test_sample_budget_guard():
    x = np.zeros(100, dtype=np.int16)
    enc = encode_flac(x, 8000)
    with pytest.raises(ValueError, match="max_samples"):
        decode_flac(enc, max_samples=99)


def test_encode_rejections():
    with pytest.raises(ValueError, match="bit depth"):
        encode_flac(np.zeros(4, dtype=np.int16), 8000, bits=24)
    with pytest.raises(ValueError, match="sample rate"):
        encode_flac(np.zeros(4, dtype=np.int16), 0)
    with pytest.raises(ValueError, match="shape"):
        encode_flac(np.zeros((2, 2, 2), dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="empty"):
        encode_flac(np.zeros(0, dtype=np.int16), 8000)


# ------------------------------------------------------------ spark seams


def test_dispatch_parity_wav_vs_flac():
    from eth2dgraph_spark.functions.wav import encode_wav
    from eth2dgraph_spark.pipeline.multimodal import _decode_audio_samples_stdlib

    rs = np.random.RandomState(4)
    sig = rs.rand(500) * 2 - 1
    sw, rw = _decode_audio_samples_stdlib(encode_wav(sig, 8000))
    sf_, rf = _decode_audio_samples_stdlib(encode_flac(sig, 8000))
    assert rw == rf == 8000
    assert np.array_equal(sw, sf_)


def test_envelope_closed_form_spark(spark):
    from pyspark.sql import functions as F

    from eth2dgraph_spark.functions.flac import synthetic_envelope_flac_udf

    udf = synthetic_envelope_flac_udf()
    got = (
        spark.range(5)
        .select(F.col("id").alias("doc_id"), udf("id").alias("env"))
        .collect()
    )
    for r in got:
        k = (r["doc_id"] * 31 + np.arange(16)) % 20
        want = np.round(k * 32768.0 / 20.0) / 32768.0
        assert np.allclose(r["env"], want, rtol=0, atol=0)


def test_audio_fingerprints_flac_match_wav(spark):
    """The cross-container property end-to-end in Spark: the same clip in
    WAV and FLAC containers produces IDENTICAL fingerprint rows."""
    from eth2dgraph_spark.functions.flac import synthetic_clip_flac_udf
    from eth2dgraph_spark.functions.wav import synthetic_clip_udf
    from eth2dgraph_spark.pipeline import multimodal
    from pyspark.sql import functions as F

    wav_clip, flac_clip = synthetic_clip_udf(), synthetic_clip_flac_udf()
    d = spark.range(50).select(F.col("id").alias("asset_id"))
    rows = {}
    for tag, clip in (("wav", wav_clip), ("flac", flac_clip)):
        assets = d.select(
            "asset_id", F.lit("audio").alias("modality"), clip("asset_id").alias("payload")
        )
        got = multimodal.audio_fingerprints(assets, frame_ms=200).collect()
        rows[tag] = sorted((r["asset_id"], r["frame_idx"], r["ahash"], r["decode_ok"]) for r in got)
    assert rows["wav"] == rows["flac"]
    assert all(ok == "ok" for _, _, _, ok in rows["wav"])


def test_decode_audio_features_flac(spark):
    from eth2dgraph_spark.pipeline import multimodal

    if multimodal.HAS_SOUNDFILE:
        pytest.skip("stdlib path only runs without soundfile")
    rs = np.random.RandomState(9)
    sig = rs.rand(320) * 2 - 1
    rows = [
        (1, "audio", "audio/flac", bytearray(encode_flac(sig, 8000)), None, None, None),
        (2, "audio", None, b"\x00junk", None, None, None),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in multimodal.decode_audio_features(assets).collect()}
    assert got[1]["decode_ok"] == "ok" and len(got[1]["feature"]) == 16
    assert got[2]["decode_ok"] == "error"


# ------------------------------------------------- stereo decorrelation


def _frame_ch_code(enc: bytes) -> int:
    """Channel-assignment nibble of the FIRST frame header (byte 3 of
    the frame, which starts right after the 42-byte fLaC+STREAMINFO)."""
    assert enc[42] == 0xFF  # sync
    return enc[45] >> 4


def test_encoder_picks_decorrelation_and_roundtrips():
    """Each stereo construction forces a different winning assignment;
    all four roundtrip bit-exactly through the production decoder (the
    decoder's decorrelation paths now see full encoder streams, not
    just the hand-built single frames)."""
    # the shared base is INCOMPRESSIBLE (random), so fixed predictors
    # can't flatten it and the assignment choice is decisive — a smooth
    # base ties all four at near-zero cost
    rs = np.random.RandomState(11)
    w = rs.randint(-12000, 12000, size=3000)
    e1 = rs.randint(-3, 4, size=3000)
    e2 = rs.randint(-3, 4, size=3000)

    # identical channels: side == 0 (CONSTANT); left/side and mid/side
    # tie, and the deterministic tie-break takes the smaller code 8
    st = np.stack([w, w], axis=1).astype(np.int16)
    enc = encode_flac(st, 8000)
    assert _frame_ch_code(enc) == 8
    dec, _ = decode_flac(enc)
    assert np.array_equal(dec, st.astype(np.float32) / 32768.0)
    # and decorrelation actually pays: well under two independent channels
    assert len(enc) < 0.6 * len(encode_flac(
        rs.randint(-12000, 12000, size=(3000, 2)).astype(np.int16), 8000))

    # right = left + tiny noise: one full channel + a tiny side
    st2 = np.stack([w, w + e1], axis=1).astype(np.int16)
    enc2 = encode_flac(st2, 8000)
    assert _frame_ch_code(enc2) in (8, 9, 10)
    dec2, _ = decode_flac(enc2)
    assert np.array_equal(dec2, st2.astype(np.float32) / 32768.0)

    # anti-correlated: mid = (l+r)>>1 is tiny while side/left/right are
    # all full-entropy -> mid/side wins uniquely (odd l+r parities ride
    # the side low-bit re-injection)
    st3 = np.stack([w + e1, -w + e2], axis=1).astype(np.int16)
    enc3 = encode_flac(st3, 8000)
    assert _frame_ch_code(enc3) == 10
    dec3, _ = decode_flac(enc3)
    assert np.array_equal(dec3, st3.astype(np.float32) / 32768.0)

    # independent random channels: decorrelation cannot help -> code 1
    st4 = rs.randint(-32768, 32768, size=(3000, 2)).astype(np.int16)
    enc4 = encode_flac(st4, 8000)
    assert _frame_ch_code(enc4) == 1
    dec4, _ = decode_flac(enc4)
    assert np.array_equal(dec4, st4.astype(np.float32) / 32768.0)


def test_decorrelated_multiframe_and_md5():
    """Decorrelation decisions are PER FRAME; a 2.5-frame stereo stream
    roundtrips with the MD5 end-to-end check engaged."""
    rs = np.random.RandomState(5)
    n = 4096 * 2 + 1500
    left = (1500 * np.sin(np.arange(n) / 30.0)).astype(np.int64)
    right = left + rs.randint(-2, 3, size=n)
    st = np.stack([left, right], axis=1).astype(np.int16)
    dec, rate = decode_flac(encode_flac(st, 44100))
    assert rate == 44100
    assert np.array_equal(dec, st.astype(np.float32) / 32768.0)
