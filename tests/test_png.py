"""Pure-stdlib PNG codec (functions/png.py): encode/decode roundtrips for
all supported color types, hand-computed reconstruction for each of the
five scanline filters (PNG spec §9), luminance weights, rejection of
everything outside the supported subset, and the end-to-end multimodal
seam over real container bytes."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from eth2dgraph_spark.functions.png import _SIG, decode_png, encode_png, luminance


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _png(raw: bytes, w: int, h: int, ctype: int = 0, depth: int = 8,
         interlace: int = 0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(7)
    for shape in [(5, 7), (1, 1), (4, 4, 3), (3, 9, 4), (32, 32)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        b = decode_png(encode_png(a))
        assert b.shape == a.shape and (b == a).all(), shape


def test_filters_hand_computed():
    # Sub: row [10, 5, 5] reconstructs by accumulating the left neighbor
    assert decode_png(_png(b"\x01" + bytes([10, 5, 5]), 3, 1)).tolist() == [[10, 15, 20]]
    # Up: row1 adds the pixel above
    got = decode_png(_png(b"\x00" + bytes([1, 2, 3]) + b"\x02" + bytes([10, 10, 10]), 3, 2))
    assert got.tolist() == [[1, 2, 3], [11, 12, 13]]
    # Average: row1 x2 = 3 + (left 8 + above 8) // 2 = 11
    got = decode_png(_png(b"\x00" + bytes([4, 6, 8]) + b"\x03" + bytes([3, 3, 3]), 3, 2))
    assert got.tolist() == [[4, 6, 8], [5, 8, 11]]
    # Paeth, first row (all neighbors 0 -> predictor is the accumulating left)
    assert decode_png(_png(b"\x04" + bytes([1, 1, 1]), 3, 1)).tolist() == [[1, 2, 3]]
    # Paeth with a real above-row: x0 pred=b(100)->101, x1 pred=b(50)->51,
    # x2 p=51+25-50=26, pa=25 pb=1 pc=24 -> pred=b(25)->26
    got = decode_png(_png(b"\x00" + bytes([100, 50, 25]) + b"\x04" + bytes([1, 1, 1]), 3, 2))
    assert got.tolist() == [[100, 50, 25], [101, 51, 26]]


def test_filters_left_neighbor_is_per_channel():
    # RGB Sub: 'left' is the same CHANNEL one pixel back (ch bytes), not
    # the previous byte — px1 = px0 + delta per channel
    raw = b"\x01" + bytes([10, 20, 30, 1, 2, 3])
    got = decode_png(_png(raw, 2, 1, ctype=2))
    assert got.tolist() == [[[10, 20, 30], [11, 22, 33]]]


def test_luminance_weights():
    assert luminance(np.array([[[255, 0, 0]]], np.uint8))[0, 0] == pytest.approx(255 * 0.299)
    assert luminance(np.array([[[0, 255, 0]]], np.uint8))[0, 0] == pytest.approx(255 * 0.587)
    assert luminance(np.array([[[0, 0, 255, 9]]], np.uint8))[0, 0] == pytest.approx(255 * 0.114)
    assert luminance(np.array([[7]], np.uint8))[0, 0] == 7.0


def test_rejects_unsupported_and_corrupt():
    ok = encode_png(np.zeros((2, 2), np.uint8))
    for bad, why in [
        (b"not a png at all", "signature"),
        # NB ok[:-5] would NOT raise: that only clips IEND and every pixel
        # byte is already present — truncate into IDAT instead
        (ok[: len(ok) // 2], "truncated mid-IDAT"),
        (_png(b"\x00\x00", 1, 1, depth=16), "16-bit"),
        (_png(b"\x00\x00", 1, 1, ctype=3), "palette"),
        (_png(b"\x00\x00", 1, 1, interlace=1), "Adam7"),
        (_png(b"\x07\x00", 1, 1), "bad filter byte"),
        (_png(b"\x00\x00\x00", 1, 1), "size mismatch"),
        (None, "empty"),
    ]:
        with pytest.raises(ValueError):
            decode_png(bad)
    # flipped payload bit -> CRC mismatch
    corrupt = bytearray(ok)
    corrupt[len(_SIG) + 8 + 3] ^= 0x01  # inside IHDR payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))


def test_decompression_bomb_guard():
    # Declared dimensions past the cap are rejected straight off IHDR —
    # BEFORE any IDAT inflation (the ~1000:1 zlib bomb vector).
    w = h = 1 << 14  # 256 MP, far past DEFAULT_MAX_PIXELS
    bomb = _png(b"", w, h)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_png(bomb)
    # the cap is configurable: a 3x3 image fails a max_pixels=4 budget...
    small = encode_png(np.zeros((3, 3), np.uint8))
    with pytest.raises(ValueError, match="max_pixels"):
        decode_png(small, max_pixels=4)
    # ...and decodes under the default
    assert decode_png(small).shape == (3, 3)


def test_idat_inflation_is_output_capped():
    # A stream that inflates far past the declared raster must be rejected
    # by the capped decompressor, not materialized then length-checked:
    # declared 1x1 gray (expected 2 bytes) with 8 MB of zeros in IDAT.
    oversize = _png(b"\x00" * (8 << 20), 1, 1)
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(oversize)


def test_decode_features_end_to_end_real_bytes(spark):
    """The multimodal seam on REAL container bytes with zero external
    codecs: a synthesized 8x8 gradient PNG pools to known 4x4 features."""
    from eth2dgraph_spark.pipeline import multimodal

    # column x 8-gradient: each 2x2 block mean is (2*bx + 0.5) * 32 gray
    img = np.tile(np.arange(8, dtype=np.uint8) * 32, (8, 1))
    rows = [(1, "image", "image/png", bytearray(encode_png(img)), 8, 8, None)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    [r] = multimodal.decode_features(assets).collect()
    assert r["decode_ok"] == "ok"
    want_cols = [(2 * bx + 0.5) * 32 / 255.0 for bx in range(4)]
    assert r["feature"] == pytest.approx(want_cols * 4)
