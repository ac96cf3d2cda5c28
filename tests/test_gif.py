"""Pure-stdlib GIF codec (functions/gif.py): exact encode/LZW-decode
roundtrips (GIF is lossless over its palette), an INDEPENDENT golden
decode of the CPython test suite's python.gif against its PPM sibling
(our encoder emits an initial clear + our own width schedule; a real-
world stream exercises the decoder's table growth independently),
interlace reordering, structural rejection, garbage properties, and the
multimodal magic-byte dispatch seam."""

from __future__ import annotations

import os

import numpy as np
import pytest

from eth2dgraph_spark.functions.gif import (
    decode_gif,
    encode_gif,
    synthetic_group_gif,
    synthetic_luma_gif_udf,
)

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _load_ppm(path: str) -> np.ndarray:
    raw = open(path, "rb").read()
    tok = raw.split(None, 4)
    w, h = int(tok[1]), int(tok[2])
    idx = raw.index(tok[3]) + len(tok[3]) + 1
    return np.frombuffer(raw[idx : idx + w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def test_gray_roundtrip_exact_across_width_boundaries():
    # 128x150 random noise crosses the 512/1024/2048/4096 LZW table
    # boundaries and forces a dictionary reset — the sync cases
    rs = np.random.RandomState(3)
    for shape in [(1, 1), (5, 7), (32, 32), (128, 150)]:
        img = rs.randint(0, 256, size=shape, dtype=np.uint8)
        dec = decode_gif(encode_gif(img))
        assert dec.shape == shape + (3,)
        assert (dec == img[..., None]).all(), shape


def test_rgb_roundtrip_exact_and_color_budget():
    rgb = np.zeros((16, 20, 3), np.uint8)
    rgb[:8, :, 0] = 200
    rgb[:, :10, 1] = 100
    rgb[..., 2] = 50
    assert (decode_gif(encode_gif(rgb)) == rgb).all()
    rs = np.random.RandomState(1)
    with pytest.raises(ValueError, match="256"):
        encode_gif(rs.randint(0, 256, size=(32, 32, 3), dtype=np.uint8))


def test_golden_cpython_gif_against_ppm():
    """python.gif (CPython Lib/test/imghdrdata, public): real-world
    encoder, 128-color global table, GIF89a extensions to skip. The PPM
    sibling pins pixel values: palette quantization plus the
    transparent-as-palette-color convention measure mean |err| 4.4 (the
    composited alternative measured 102.7 — see the decoder comment)."""
    dec = decode_gif(open(os.path.join(DATA, "python.gif"), "rb").read())
    truth = _load_ppm(os.path.join(DATA, "python.ppm"))
    assert dec.shape == truth.shape == (16, 16, 3)
    assert np.mean(np.abs(dec.astype(float) - truth.astype(float))) < 6.0


def test_interlaced_decode():
    """Interlace the index rows of a valid stream by hand: encode
    normally, reorder rows into pass order, set the interlace flag —
    decode must undo the 8/8/4/2 pass ordering exactly."""
    rs = np.random.RandomState(9)
    img = rs.randint(0, 256, size=(13, 8), dtype=np.uint8)
    order = (
        list(range(0, 13, 8))
        + list(range(4, 13, 8))
        + list(range(2, 13, 4))
        + list(range(1, 13, 2))
    )
    enc = bytearray(encode_gif(img[order]))  # pass-ordered rows
    # image descriptor starts right after header+GCT: 13 + 768
    desc = 13 + 768
    assert enc[desc] == 0x2C
    enc[desc + 9] |= 0x40  # set the interlace flag
    dec = decode_gif(bytes(enc))
    assert (dec == img[..., None]).all()


def test_rejections_and_garbage():
    good = encode_gif(np.full((8, 8), 7, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_gif(good[4:])  # no signature
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated
    with pytest.raises(ValueError):
        decode_gif(good[:-2])  # missing trailer path -> truncated stream
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7)  # zero dimensions
    rs = np.random.RandomState(17)
    for n in (0, 1, 6, 40, 300):
        blob = bytes(rs.randint(0, 256, size=n, dtype=np.uint8).tolist())
        for payload in (blob, b"GIF89a" + blob):
            try:
                out = decode_gif(payload)
                assert isinstance(out, np.ndarray)
            except ValueError:
                pass


def test_synthetic_group_gif_deterministic():
    assert synthetic_group_gif(5) == synthetic_group_gif(5)
    assert synthetic_group_gif(5) != synthetic_group_gif(6)
    rs = np.random.RandomState(5 * 7541 + 41)
    grid = rs.randint(0, 256, size=(8, 8), dtype=np.uint8)
    want = np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1)
    assert (decode_gif(synthetic_group_gif(5)) == want[..., None]).all()


def test_stdlib_luma_dispatch_gif():
    from eth2dgraph_spark.functions.png import encode_png
    from eth2dgraph_spark.pipeline.multimodal import _stdlib_luma

    img = np.full((16, 16), 93, dtype=np.uint8)
    via_gif = _stdlib_luma(encode_gif(img))
    via_png = _stdlib_luma(encode_png(img))
    assert np.array_equal(via_gif, via_png)


def test_block_luma_closed_form_spark(spark):
    from pyspark.sql import functions as F

    udf = synthetic_luma_gif_udf()
    got = (
        spark.range(5)
        .select(F.col("id").alias("doc_id"), udf("id").alias("bins"))
        .collect()
    )
    for r in got:
        want = [(r["doc_id"] * 29 + k * 13) % 256 for k in range(16)]
        assert r["bins"] == [float(v) for v in want]


def test_resize_stdlib_gif_input(spark):
    from eth2dgraph_spark.functions.png import decode_png
    from eth2dgraph_spark.pipeline import multimodal

    if multimodal.HAS_PIL:
        pytest.skip("stdlib path only runs without Pillow")
    rs = np.random.RandomState(4)
    src = rs.randint(0, 256, size=(16, 16), dtype=np.uint8)
    rows = [(1, "image", "image/gif", bytearray(encode_gif(src)), 16, 16, None)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = multimodal.resize_images(assets, 4, 4).collect()[0]
    out = decode_png(bytes(got["payload"]))
    ri = (np.arange(4) * 16 // 4).astype(int)
    # GIF decodes to RGB; gray input -> all three channels equal
    assert (out == src[ri][:, ri][..., None]).all()
