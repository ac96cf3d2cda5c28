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


# -------------------------------------------------------------- animation

from eth2dgraph_spark.functions.gif import decode_gif_frames, encode_gif_frames  # noqa: E402


def test_animated_roundtrip_exact_with_delays():
    rs = np.random.RandomState(2)
    fr = rs.randint(0, 256, size=(4, 24, 30), dtype=np.uint8)
    dec, delays = decode_gif_frames(encode_gif_frames(fr, delay_ms=250))
    assert dec.shape == (4, 24, 30, 3)
    assert delays == [250] * 4
    assert (dec == fr[..., None]).all()


def test_animated_golden_single_frame():
    """A single-frame real-world file decodes through the animation path.
    The two paths deliberately differ ONLY at transparent pixels:
    decode_gif keeps the palette color (the CPython-PPM still
    convention), decode_gif_frames composites onto the untouched canvas =
    the background color (animation semantics — later frames must show
    what is underneath). python.gif: transparent=101 (black),
    background=100 (white)."""
    raw = open(os.path.join(DATA, "python.gif"), "rb").read()
    g, delays = decode_gif_frames(raw)
    still = decode_gif(raw)
    assert g.shape == (1, 16, 16, 3) and len(delays) == 1
    diff = (g[0] != still).any(axis=2)
    # the logo's whole transparent backdrop — 107 of 256 pixels
    assert 0 < int(diff.sum()) < 256
    assert (g[0][diff] == 255).all()  # they show the white background
    assert (still[diff] == 0).all()  # the still path kept palette black


def test_animated_transparency_shows_previous_frame():
    """Frame 2 marks value 7 transparent: those pixels must show frame
    1's content (frame-over-frame compositing), not palette[7]."""
    f1 = np.full((8, 8), 200, dtype=np.uint8)
    f2 = np.full((8, 8), 7, dtype=np.uint8)
    f2[0, 0] = 31  # one opaque pixel
    enc = bytearray(encode_gif_frames(np.stack([f1, f2]), delay_ms=100))
    # second GCE: flip on transparency with index 7
    first_gce = enc.index(b"\x21\xf9")
    second_gce = enc.index(b"\x21\xf9", first_gce + 2)
    enc[second_gce + 3] |= 1  # transparency flag
    enc[second_gce + 6] = 7  # transparent index
    dec, _ = decode_gif_frames(bytes(enc))
    assert (dec[1, 0, 0] == 31).all()
    assert (dec[1, 1:, :] == 200).all()  # previous frame shows through


def test_animated_disposal_2_restores_background():
    """Disposal 2 on frame 1 clears the canvas back to the background
    color before frame 2 draws; frame 2 transparent everywhere except one
    pixel ⇒ background shows, not frame 1."""
    f1 = np.full((8, 8), 200, dtype=np.uint8)
    f2 = np.full((8, 8), 7, dtype=np.uint8)
    f2[0, 0] = 31
    enc = bytearray(encode_gif_frames(np.stack([f1, f2]), delay_ms=100))
    first_gce = enc.index(b"\x21\xf9")
    second_gce = enc.index(b"\x21\xf9", first_gce + 2)
    enc[first_gce + 3] |= 2 << 2  # disposal 2 on frame 1
    enc[second_gce + 3] |= 1
    enc[second_gce + 6] = 7
    dec, _ = decode_gif_frames(bytes(enc))
    assert (dec[0] == 200).all()
    assert (dec[1, 0, 0] == 31).all()
    assert (dec[1, 1:, :] == 0).all()  # background index 0 -> gray 0


def test_animated_disposal_3_rejected():
    enc = bytearray(encode_gif_frames(np.zeros((2, 4, 4), dtype=np.uint8)))
    gce = enc.index(b"\x21\xf9")
    enc[gce + 3] |= 3 << 2
    with pytest.raises(ValueError, match="disposal"):
        decode_gif_frames(bytes(enc))


def test_video_frame_phashes_over_animated_gif(spark):
    """The video fingerprint chain over REAL animated-GIF bytes via the
    magic dispatch: same-frames assets hash identically; the variable-
    delay frame-at-ts pick resolves the schedule; garbage -> error."""
    from eth2dgraph_spark.pipeline import multimodal

    rs = np.random.RandomState(11)
    fr = rs.randint(0, 256, size=(3, 16, 16), dtype=np.uint8)
    clip = encode_gif_frames(fr, delay_ms=1000)
    rows = [
        (1, "video", "image/gif", bytearray(clip), None, None, 2500),
        (2, "video", "image/gif", bytearray(clip), None, None, 2500),
        (3, "video", None, b"\x00junk", None, None, 2500),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = multimodal.video_frame_phashes(assets, every_ms=1000).collect()
    by = {}
    for r in got:
        by.setdefault(r["asset_id"], {})[r["frame_ts_ms"]] = (r["phash"], r["decode_ok"])
    assert set(by[1]) == {0, 1000, 2000}
    assert by[1] == by[2]  # identical bytes -> identical per-frame hashes
    assert all(v[1] == "ok" for v in by[1].values())
    assert all(v == (None, "error") for v in by[3].values())


def test_gif_frame_at_ts_uses_cumulative_delays():
    from eth2dgraph_spark.pipeline.multimodal import _decode_video_gray_gif

    f0 = np.full((4, 4), 10, dtype=np.uint8)
    f1 = np.full((4, 4), 250, dtype=np.uint8)
    clip = encode_gif_frames(np.stack([f0, f1]), delay_ms=500)
    # frame 0 on screen for [0, 500); frame 1 from 500 on (clamped after)
    out = _decode_video_gray_gif(clip, [0, 499, 500, 5000])
    vals = [round(float(a[0, 0])) for a in out]
    assert vals == [10, 10, 250, 250]

# ----------------------------------------------- local color tables (r13)

from eth2dgraph_spark.functions.gif import _lzw_encode  # noqa: E402


def _img_block(x0, y0, iw, ih, idx, local_pal=None):
    """Image descriptor + optional local color table (2 entries) + LZW
    data for a hand-built test stream (mcs=2, the spec minimum)."""
    flags = 0x80 if local_pal is not None else 0
    out = bytearray(
        [0x2C, x0 & 255, x0 >> 8, y0 & 255, y0 >> 8,
         iw & 255, iw >> 8, ih & 255, ih >> 8, flags]
    )
    if local_pal is not None:
        out += bytes(local_pal)  # 2 RGB entries = 6 bytes (size bits 0)
    out += bytes([2]) + _lzw_encode(2, np.asarray(idx, dtype=np.uint8).reshape(-1))
    return bytes(out)


RED_GREEN_GCT = [255, 0, 0, 0, 255, 0]
BLUE_WHITE_LCT = [0, 0, 255, 255, 255, 255]


def _header(w, h, bg=0):
    return (
        b"GIF89a"
        + bytes([w & 255, w >> 8, h & 255, h >> 8, 0x80, bg, 0])
        + bytes(RED_GREEN_GCT)
    )


def test_animated_local_palette_frame_uses_its_own_table():
    """The ADVICE r12 repro: a full-screen frame drawn with a LOCAL
    blue/white palette while a red/green GCT exists must decode BLUE
    (its own table), not red (the GCT)."""
    raw = (
        _header(4, 4)
        + _img_block(0, 0, 4, 4, np.zeros(16), local_pal=BLUE_WHITE_LCT)
        + b"\x3B"
    )
    frames, _ = decode_gif_frames(raw)
    assert (frames[0] == np.array([0, 0, 255], np.uint8)).all()


def test_animated_mixed_palettes_composite_in_rgb():
    """Frame 1 full-screen via the GCT (green), frame 2 a 2x2 sub-region
    via a local palette (blue): frame 2 must show blue in the region and
    frame 1's GREEN everywhere else — an index canvas cannot represent
    this (it would re-resolve green's index through the local table)."""
    raw = (
        _header(4, 4)
        + _img_block(0, 0, 4, 4, np.ones(16))  # GCT index 1 = green
        + _img_block(0, 0, 2, 2, np.zeros(4), local_pal=BLUE_WHITE_LCT)
        + b"\x3B"
    )
    frames, _ = decode_gif_frames(raw)
    assert (frames[0] == np.array([0, 255, 0], np.uint8)).all()
    assert (frames[1][:2, :2] == np.array([0, 0, 255], np.uint8)).all()
    assert (frames[1][2:, :] == np.array([0, 255, 0], np.uint8)).all()
    assert (frames[1][:2, 2:] == np.array([0, 255, 0], np.uint8)).all()


def test_still_local_palette_background_via_gct():
    """Still decode of a sub-screen local-palette frame: the frame region
    resolves through the LOCAL table (blue), the undrawn background
    through the GCT (bg_index=1 = green) — previously the background was
    looked up in the local table (white)."""
    raw = (
        _header(4, 4, bg=1)
        + _img_block(0, 0, 2, 2, np.zeros(4), local_pal=BLUE_WHITE_LCT)
        + b"\x3B"
    )
    out = decode_gif(raw)
    assert (out[:2, :2] == np.array([0, 0, 255], np.uint8)).all()
    assert (out[2:, :] == np.array([0, 255, 0], np.uint8)).all()
    assert (out[:2, 2:] == np.array([0, 255, 0], np.uint8)).all()


def test_animated_disposal2_restores_gct_background_color():
    """Disposal-2 restore after a LOCAL-palette frame must refill with
    the GCT background COLOR, not an index resolved through whatever
    palette comes next."""
    raw = (
        _header(4, 4, bg=1)  # background = green
        + _img_block(0, 0, 4, 4, np.zeros(16), local_pal=BLUE_WHITE_LCT)
        + _img_block(0, 0, 1, 1, np.zeros(1))  # GCT red, 1 px
        + b"\x3B"
    )
    enc = bytearray(raw)
    # insert a GCE with disposal 2 before the FIRST image descriptor
    first_img = enc.index(0x2C, 13 + 6)
    enc[first_img:first_img] = bytes([0x21, 0xF9, 4, 2 << 2, 0, 0, 0, 0])
    frames, _ = decode_gif_frames(bytes(enc))
    assert (frames[0] == np.array([0, 0, 255], np.uint8)).all()
    assert (frames[1][0, 0] == np.array([255, 0, 0], np.uint8)).all()
    assert (frames[1][1:, :] == np.array([0, 255, 0], np.uint8)).all()
    assert (frames[1][0, 1:] == np.array([0, 255, 0], np.uint8)).all()
