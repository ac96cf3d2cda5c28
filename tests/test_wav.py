"""Pure-stdlib WAV codec (functions/wav.py): encode/decode roundtrips for
8/16-bit mono/stereo, normalization conventions, hand-computed RMS
envelopes, strict rejection of corrupt or out-of-scope bytes (every
single-byte header flip must raise — WAV has no CRC, cross-field
consistency is the corruption signal), the resource cap, and the
end-to-end multimodal seam over real container bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from eth2dgraph_spark.functions.wav import (
    decode_wav,
    encode_wav,
    rms_envelope,
)


def test_roundtrip_16bit_exact():
    rng = np.random.default_rng(11)
    for ch in (1, 2, 4):
        a = rng.integers(-32768, 32768, size=(777, ch), dtype=np.int16)
        out, rate = decode_wav(encode_wav(a, 44100))
        assert rate == 44100 and out.shape == (777, ch)
        assert (np.round(out * 32768.0).astype(np.int16) == a).all()


def test_roundtrip_8bit_exact():
    rng = np.random.default_rng(12)
    a = rng.integers(0, 256, size=(333, 2), dtype=np.uint8)
    out, rate = decode_wav(encode_wav(a, 8000, bits=8))
    assert rate == 8000 and out.shape == (333, 2)
    assert (np.round(out * 128.0 + 128.0).astype(np.uint8) == a).all()


def test_roundtrip_float_through_quantization():
    t = np.linspace(0, 1, 1600, endpoint=False)
    sig = 0.25 * np.sin(2 * np.pi * 5 * t)
    out, _ = decode_wav(encode_wav(sig, 16000))
    assert out.shape == (1600, 1)
    assert np.abs(out[:, 0] - sig).max() < 1.0 / 32768.0 + 1e-9


def test_mono_1d_and_odd_8bit_padding():
    # (n,) mono input and an odd-length 8-bit data chunk (forces the RIFF
    # word-alignment pad byte) both roundtrip
    a = np.array([0, 64, 128, 192, 255], dtype=np.uint8)  # 5 bytes: odd
    wav = encode_wav(a, 1000, bits=8)
    assert len(wav) % 2 == 0  # padded to even
    out, _ = decode_wav(wav)
    assert out.shape == (5, 1)
    assert (np.round(out[:, 0] * 128.0 + 128.0).astype(np.uint8) == a).all()


def test_rms_envelope_hand_computed():
    # 16 segments of 10 samples, segment i constant at i/20 -> RMS = i/20
    sig = np.repeat(np.arange(16) / 20.0, 10)
    env = rms_envelope(sig)
    assert env == pytest.approx(np.arange(16) / 20.0, abs=1e-7)
    # stereo mono-mix: L=0.3, R=0.1 -> mono 0.2 everywhere
    st = np.column_stack([np.full(160, 0.3), np.full(160, 0.1)])
    assert rms_envelope(st) == pytest.approx([0.2] * 16, abs=1e-7)
    # empty input -> all-zero bins, no NaN
    assert rms_envelope(np.zeros((0, 1))).tolist() == [0.0] * 16


def test_rejects_out_of_scope_and_corrupt():
    ok = encode_wav(np.zeros(100, dtype=np.int16), 8000)
    # float fmt (3), 24-bit, 0 channels, truncation, garbage, None
    f24 = bytearray(ok)
    struct.pack_into("<H", f24, 34, 24)  # bits_per_sample field
    fmt3 = bytearray(ok)
    struct.pack_into("<H", fmt3, 20, 3)  # audio_format field
    ch0 = bytearray(ok)
    struct.pack_into("<H", ch0, 22, 0)  # channel count field
    for bad in [
        b"not a wav",
        ok[: len(ok) // 2],
        bytes(f24),
        bytes(fmt3),
        bytes(ch0),
        None,
        b"RIFF" + b"\x00" * 20,
    ]:
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_every_single_byte_header_flip_raises():
    """No CRC in WAV — strict cross-field validation must catch any
    single-bit corruption anywhere in the 44-byte canonical header."""
    ok = encode_wav(np.arange(-50, 50, dtype=np.int16), 8000)
    for pos in range(44):
        for bit in (0x01, 0x80):
            bad = bytearray(ok)
            bad[pos] ^= bit
            with pytest.raises(ValueError):
                decode_wav(bytes(bad))


def test_data_byte_flips_are_data_not_errors():
    # flips INSIDE the pcm payload are legitimate sample changes: decode
    # succeeds and differs only at the flipped sample
    ok = encode_wav(np.zeros(100, dtype=np.int16), 8000)
    bad = bytearray(ok)
    bad[44 + 10] ^= 0x01
    out, _ = decode_wav(bytes(bad))
    base, _ = decode_wav(ok)
    assert (out != base).sum() == 1


def test_max_samples_guard():
    ok = encode_wav(np.zeros(1000, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="max_samples"):
        decode_wav(ok, max_samples=999)
    assert decode_wav(ok, max_samples=1000)[0].shape == (1000, 1)


def test_decode_audio_features_end_to_end_real_bytes(spark):
    """The multimodal audio seam on REAL container bytes with zero external
    codecs: a synthesized staircase WAV pools to a known RMS envelope."""
    from eth2dgraph_spark.pipeline import multimodal

    # 16 segments of 100 samples at amplitude i/20 -> bin i RMS = i/20
    sig = np.repeat(np.arange(16) / 20.0, 100)
    rows = [
        (1, "audio", "audio/wav", bytearray(encode_wav(sig, 16000)), None, None, 100)
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    [r] = multimodal.decode_audio_features(assets).collect()
    assert r["decode_ok"] == "ok"
    assert r["feature"] == pytest.approx(list(np.arange(16) / 20.0), abs=1e-3)
