"""Pure-stdlib baseline JPEG codec (functions/jpeg.py): encode/decode
roundtrips (exact for constant 8x8 blocks at quality=100, bounded-error
otherwise), an INDEPENDENT golden decode of a real-world-encoded 4:2:0
JPEG from the CPython test suite against its lossless PPM ground truth
(our own encoder cannot vet the decoder — a shared zigzag/IDCT bug would
roundtrip cleanly), structural rejection of everything outside the
supported subset, garbage-never-crashes properties, and the end-to-end
multimodal seam (magic-byte dispatch + pHash over real JPEG bytes)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from eth2dgraph_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    synthetic_group_jpeg,
    synthetic_luma_jpeg_udf,
)

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _load_ppm(path: str) -> np.ndarray:
    raw = open(path, "rb").read()
    tok = raw.split(None, 4)
    assert tok[0] == b"P6"
    w, h = int(tok[1]), int(tok[2])
    idx = raw.index(tok[3]) + len(tok[3]) + 1
    return np.frombuffer(raw[idx : idx + w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def _luma(a: np.ndarray) -> np.ndarray:
    return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]


# ------------------------------------------------------------- structure


def test_zigzag_is_the_standard_permutation():
    # spot-pin the generated table against the published T.81 order
    assert ZIGZAG[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[-4:].tolist() == [47, 55, 62, 63]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_constant_block_q100_roundtrip_exact():
    # a constant 8x8 block's DCT is a lone integer DC coefficient; with
    # all-ones (quality=100) tables quantization is the identity
    rs = np.random.RandomState(7)
    grid = rs.randint(0, 256, size=(4, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)


def test_arbitrary_gray_q100_nearly_lossless():
    rs = np.random.RandomState(11)
    img = rs.randint(0, 256, size=(24, 40), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 1


def test_rgb_roundtrip_bounded_error():
    rs = np.random.RandomState(3)
    # smooth image: low-frequency content survives quantization
    x = np.linspace(0, 4 * np.pi, 32)
    base = (127 + 120 * np.sin(x)[:, None] * np.cos(x)[None, :]).astype(np.uint8)
    rgb = np.stack([base, base[::-1], base.T], axis=-1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert dec.shape == rgb.shape
    assert np.mean(np.abs(dec.astype(float) - rgb.astype(float))) < 4.0


def test_non_multiple_of_8_dims_crop_back():
    rs = np.random.RandomState(5)
    img = rs.randint(0, 256, size=(13, 21), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == (13, 21)
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 1


def test_quality_monotone_size():
    rs = np.random.RandomState(9)
    img = rs.randint(0, 256, size=(32, 32), dtype=np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


# ------------------------------------------------------- independent golden


def test_golden_cpython_jpg_against_ppm_ground_truth():
    """tests/data/python.jpg (CPython Lib/test/imghdrdata, public) is a
    real-world-encoded baseline JPEG — 4:2:0 subsampling, four custom
    variable-length Huffman tables — with a lossless PPM of the same
    image beside it. Decoding it exercises every decoder path our own
    flat-table 4:4:4 encoder cannot (and independently pins zigzag/IDCT:
    a wrong permutation would produce garbage here while roundtripping
    cleanly through our encoder). Measured: luma mean |err| 3.11, so the
    4.0 bound has headroom without being vacuous — random output scores
    ~60-80."""
    dec = decode_jpeg(open(os.path.join(DATA, "python.jpg"), "rb").read())
    truth = _load_ppm(os.path.join(DATA, "python.ppm"))
    assert dec.shape == truth.shape == (16, 16, 3)
    assert np.mean(np.abs(_luma(dec.astype(float)) - _luma(truth.astype(float)))) < 4.0
    # full-channel error stays bounded too (chroma carries the 4:2:0 +
    # heavy-quantization loss at the logo's sharp edges)
    assert np.mean(np.abs(dec.astype(float) - truth.astype(float))) < 12.0


# -------------------------------------------------------------- rejection


def _valid() -> bytes:
    img = np.full((8, 8), 200, dtype=np.uint8)
    return encode_jpeg(img, quality=100)


def test_rejects_missing_soi_and_truncation():
    good = _valid()
    with pytest.raises(ValueError):
        decode_jpeg(good[2:])  # no SOI
    with pytest.raises(ValueError):
        decode_jpeg(good[:10])  # truncated header
    with pytest.raises(ValueError):
        decode_jpeg(good[:-4])  # truncated scan (no EOI)
    with pytest.raises(ValueError):
        decode_jpeg(b"")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # empty image: no SOF/scan


def test_rejects_progressive_sof():
    good = bytearray(_valid())
    i = good.index(b"\xff\xc0")
    good[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg(bytes(good))


def test_rejects_non_8bit_precision():
    good = bytearray(_valid())
    i = good.index(b"\xff\xc0")
    good[i + 4] = 12  # precision byte of SOF0
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(good))


def test_header_byte_flips_never_crash_with_foreign_errors():
    """Flip every single byte in the header region (up to SOS): each flip
    either still decodes to a uint8 array or raises ValueError — never an
    IndexError/struct.error/KeyError leaking out of the parser."""
    good = _valid()
    sos = good.index(b"\xff\xda")
    for i in range(sos + 14):  # header + SOS segment + first data bytes
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(good)
            mut[i] ^= flip
            try:
                out = decode_jpeg(bytes(mut))
                assert isinstance(out, np.ndarray) and out.dtype == np.uint8
            except ValueError:
                pass


def test_garbage_never_crashes():
    rs = np.random.RandomState(17)
    for n in (0, 1, 2, 3, 17, 64, 300):
        blob = bytes(rs.randint(0, 256, size=n, dtype=np.uint8).tolist())
        try:
            decode_jpeg(blob)
        except ValueError:
            pass
        # SOI-prefixed garbage too
        try:
            decode_jpeg(b"\xff\xd8" + blob)
        except ValueError:
            pass


# --------------------------------------------------------------- synthesis


def test_synthetic_group_jpeg_deterministic_and_decodable():
    a, b = synthetic_group_jpeg(3), synthetic_group_jpeg(3)
    assert a == b
    assert synthetic_group_jpeg(4) != a
    dec = decode_jpeg(a)
    assert dec.shape == (32, 32) and dec.dtype == np.uint8


def test_block_luma_closed_form():
    # the jpeg_luma gate's invariant, kernel-level: pooled bin k of the
    # roundtripped image equals (doc_id*31 + k*17) % 256 exactly
    for doc_id in (0, 1, 57, 1234):
        blocks = ((doc_id * 31 + np.arange(16) * 17) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(blocks.reshape(4, 4), 8, axis=0), 8, axis=1)
        dec = decode_jpeg(encode_jpeg(img, quality=100))
        pooled = dec.reshape(4, 8, 4, 8).astype(np.float64).mean(axis=(1, 3)).reshape(-1)
        assert pooled.tolist() == blocks.astype(np.float64).tolist()


# ------------------------------------------------------------ spark seams


def test_stdlib_luma_dispatch_png_and_jpeg():
    from eth2dgraph_spark.functions.png import encode_png
    from eth2dgraph_spark.pipeline.multimodal import _stdlib_luma

    img = np.full((16, 16), 77, dtype=np.uint8)
    via_jpeg = _stdlib_luma(encode_jpeg(img, quality=100))
    via_png = _stdlib_luma(encode_png(img))
    assert np.array_equal(via_jpeg, via_png)
    with pytest.raises(ValueError):
        _stdlib_luma(b"GIF89a not a supported container")


def test_phash_features_mixed_png_jpeg_and_error_rows(spark):
    """The multimodal seam: one asset table mixing PNG bytes, JPEG bytes
    of the SAME pixels, and garbage — stdlib dispatch hashes the two real
    containers to IDENTICAL pHashes (both decode to the same pixel array:
    constant-block q100 JPEG is exact) and marks the garbage row 'error'."""
    from eth2dgraph_spark.functions.png import encode_png
    from eth2dgraph_spark.pipeline import multimodal

    rs = np.random.RandomState(23)
    grid = rs.randint(0, 256, size=(4, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
    rows = [
        (1, "image", None, bytes(encode_png(img)), None, None, None),
        (2, "image", None, bytes(encode_jpeg(img, quality=100)), None, None, None),
        (3, "image", None, b"\x00garbage", None, None, None),
    ]
    out = {
        r["asset_id"]: r
        for r in multimodal.phash_features(
            spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
        ).collect()
    }
    assert out[1]["decode_ok"] == "ok" and out[2]["decode_ok"] == "ok"
    assert out[1]["phash"] == out[2]["phash"]
    assert out[3]["decode_ok"] == "error" and out[3]["phash"] is None


def test_synthetic_luma_jpeg_udf_spark(spark):
    from pyspark.sql import functions as F

    udf = synthetic_luma_jpeg_udf()

    got = (
        spark.range(5)
        .select(F.col("id").alias("doc_id"), udf("id").alias("bins"))
        .collect()
    )
    for r in got:
        want = [(r["doc_id"] * 31 + k * 17) % 256 for k in range(16)]
        assert r["bins"] == [float(v) for v in want]
