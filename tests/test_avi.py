"""Pure-stdlib AVI codec (functions/avi.py): encode/decode roundtrips,
fps/frame-pick arithmetic, hand-computed luma grids, strict rejection of
corrupt or out-of-scope bytes (every single-byte flip in the header and
idx1 regions must raise — AVI has no CRC, cross-field consistency is the
corruption signal), the resource cap, and the end-to-end multimodal seam
over real container bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from eth2dgraph_spark.functions.avi import (
    decode_avi,
    encode_avi,
    luma_grid16,
)


def _clip(n=2, h=8, w=8, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_roundtrip_exact_various_shapes():
    rng = np.random.default_rng(7)
    for n, h, w in [(1, 8, 8), (3, 6, 10), (2, 5, 7), (4, 4, 4)]:
        a = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        dec, fps = decode_avi(encode_avi(a, fps=12))
        assert fps == 12.0
        assert dec.shape == a.shape and (dec == a).all()


def test_stride_padding_roundtrip():
    # w=5 -> 15-byte rows pad to 16; w=7 -> 21 pads to 24: pad bytes must
    # be written, skipped on decode, and never leak into pixels
    for w in (5, 6, 7):
        a = _clip(n=2, h=3, w=w, seed=w)
        dec, _ = decode_avi(encode_avi(a, fps=10))
        assert (dec == a).all()


def test_luma_grid_hand_computed():
    # constant gray v: BT.601 integer-ratio luma is exactly v/255 per bin
    f = np.full((8, 8, 3), 80, dtype=np.uint8)
    assert luma_grid16(f).tolist() == [80 / 255.0] * 16
    # pure-channel frames pin the 299/587/114 weights
    r = np.zeros((8, 8, 3), dtype=np.uint8)
    r[:, :, 0] = 255
    assert luma_grid16(r) == pytest.approx([0.299] * 16)
    g = np.zeros((8, 8, 3), dtype=np.uint8)
    g[:, :, 1] = 255
    assert luma_grid16(g) == pytest.approx([0.587] * 16)
    # block structure: 2x2 blocks of distinct grays land in distinct bins
    grid = (np.arange(16, dtype=np.uint8) * 8).reshape(4, 4)
    px = np.repeat(np.repeat(grid, 2, axis=0), 2, axis=1)
    frame = np.repeat(px[:, :, None], 3, axis=2)
    assert luma_grid16(frame).tolist() == [v * 8 / 255.0 for v in range(16)]


def test_rejects_out_of_scope_and_corrupt():
    ok = encode_avi(_clip(), fps=10)
    trunc = ok[: len(ok) // 2]
    extra_stream = bytearray(ok)
    struct.pack_into("<I", extra_stream, ok.index(b"avih") + 8 + 24, 2)  # dwStreams
    for bad in [b"not an avi", trunc, bytes(extra_stream), None, b"RIFF" + b"\x00" * 20]:
        with pytest.raises(ValueError):
            decode_avi(bad)


def test_every_header_and_index_byte_flip_raises():
    """No CRC in AVI — strict cross-field validation must catch any
    single-bit corruption anywhere before the first pixel byte (magics,
    avih, strh, strf, list/chunk sizes) and anywhere in idx1."""
    ok = encode_avi(_clip(), fps=10)
    first_px = ok.index(b"movi") + 4 + 8
    idx1 = ok.index(b"idx1")
    for pos in list(range(first_px)) + list(range(idx1, len(ok))):
        for bit in (0x01, 0x80):
            bad = bytearray(ok)
            bad[pos] ^= bit
            with pytest.raises(ValueError):
                decode_avi(bytes(bad))


def test_mid_movi_chunk_header_flip_raises():
    # the '00db'+size header of the SECOND frame sits between pixel blocks;
    # flips there must be caught by the chunk walk, not read as pixels
    a = _clip(n=2, h=8, w=8)
    ok = encode_avi(a, fps=10)
    frame_size = 8 * ((8 * 3 + 3) & ~3)
    second_hdr = ok.index(b"movi") + 4 + 8 + frame_size
    for pos in range(second_hdr, second_hdr + 8):
        bad = bytearray(ok)
        bad[pos] ^= 0x01
        with pytest.raises(ValueError):
            decode_avi(bytes(bad))


def test_pixel_byte_flips_are_data_not_errors():
    a = _clip(n=1, h=4, w=4)
    ok = encode_avi(a, fps=10)
    bad = bytearray(ok)
    bad[ok.index(b"movi") + 4 + 8 + 5] ^= 0x01
    dec, _ = decode_avi(bytes(bad))
    base, _ = decode_avi(ok)
    assert (dec != base).sum() == 1


def test_max_pixels_guard():
    a = _clip(n=2, h=8, w=8)  # 128 pixels
    ok = encode_avi(a, fps=10)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_avi(ok, max_pixels=127)
    assert decode_avi(ok, max_pixels=128)[0].shape == (2, 8, 8, 3)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_avi(np.zeros((2, 4, 4, 3), dtype=np.float32), fps=10)  # not uint8
    with pytest.raises(ValueError):
        encode_avi(np.zeros((0, 4, 4, 3), dtype=np.uint8), fps=10)  # no frames
    with pytest.raises(ValueError):
        encode_avi(np.zeros((1, 4, 4, 3), dtype=np.uint8), fps=0)  # bad fps


def test_decode_video_frames_end_to_end_real_bytes(spark):
    """The multimodal video seam on REAL container bytes with zero external
    codecs: a 3-frame constant-gray AVI at 1 fps pools each sampled ts to
    the frame on screen at that instant."""
    from eth2dgraph_spark.pipeline import multimodal

    grays = [40, 120, 200]
    frames = np.stack(
        [np.full((8, 8, 3), g, dtype=np.uint8) for g in grays]
    )
    rows = [
        (1, "video", "video/avi", bytearray(encode_avi(frames, fps=1)), None, None, 2500),
        (2, "video", "video/avi", bytearray(b"garbage"), None, None, 1500),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = multimodal.decode_video_frames(assets, every_ms=1000).collect()
    if multimodal.HAS_AV:  # this container has no PyAV; guard for parity envs
        return
    ok = {r["frame_ts_ms"]: r for r in got if r["asset_id"] == 1}
    assert sorted(ok) == [0, 1000, 2000]
    for ts, g in zip([0, 1000, 2000], grays):
        assert ok[ts]["decode_ok"] == "ok"
        assert ok[ts]["feature"] == pytest.approx([g / 255.0] * 16)
    bad = [r for r in got if r["asset_id"] == 2]
    assert len(bad) == 2  # full schedule emitted
    assert all(r["decode_ok"] == "error" and r["feature"] is None for r in bad)


def test_frame_pick_clamps_past_end(spark):
    # duration_ms longer than the clip: ts past the last frame returns the
    # last frame (the PyAV at-or-before-ts semantics)
    from eth2dgraph_spark.pipeline import multimodal

    if multimodal.HAS_AV:
        return
    frames = np.stack([np.full((4, 4, 3), g, dtype=np.uint8) for g in (10, 250)])
    feats = multimodal._decode_video_frames_avi(
        encode_avi(frames, fps=1), [0, 1000, 5000]
    )
    assert feats[0] == pytest.approx([10 / 255.0] * 16)
    assert feats[1] == pytest.approx([250 / 255.0] * 16)
    assert feats[2] == pytest.approx([250 / 255.0] * 16)  # clamped


def test_synthetic_luma_udf_closed_form(spark):
    """The avi_luma gate kernel: encode->decode roundtrip per doc equals the
    closed form ((doc_id*31 + pos) % 32) * 8 / 255 exactly."""
    from eth2dgraph_spark.functions.avi import synthetic_luma_udf
    from pyspark.sql import functions as F

    d = spark.createDataFrame([(0,), (7,), (123,)], "doc_id long")
    rows = d.select("doc_id", F.posexplode(synthetic_luma_udf()("doc_id"))).collect()
    assert len(rows) == 3 * 32
    for r in rows:
        want = (r["doc_id"] * 31 + r["pos"]) % 32 * 8 / 255.0
        assert r["col"] == want  # exact float64 equality, no tolerance


def test_video_frame_phashes_real_bytes(spark):
    """Identical clips produce identical per-frame hashes; undecodable
    payloads emit the full schedule as 'error' rows with NULL hashes."""
    from eth2dgraph_spark.pipeline import multimodal

    clip = encode_avi(_clip(n=3, h=16, w=16, seed=5), fps=1)
    rows = [
        (1, "video", "video/avi", bytearray(clip), None, None, 2500),
        (2, "video", "video/avi", bytearray(clip), None, None, 2500),
        (3, "video", "video/avi", bytearray(b"junk"), None, None, 1500),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = multimodal.video_frame_phashes(assets, every_ms=1000).collect()
    by = {}
    for r in got:
        by.setdefault(r["asset_id"], {})[r["frame_ts_ms"]] = r
    assert sorted(by[1]) == [0, 1000, 2000]
    for ts in by[1]:
        assert by[1][ts]["decode_ok"] == "ok"
        assert by[1][ts]["phash"] == by[2][ts]["phash"]  # bit-identical clips
    assert len(set(r["phash"] for r in by[1].values())) == 3  # frames distinct
    assert sorted(by[3]) == [0, 1000]
    assert all(r["decode_ok"] == "error" and r["phash"] is None for r in by[3].values())


def test_video_overlap_pairs_semantics(spark):
    """min_shared filter, triangular orientation, NULL hashes never post,
    and the max_posting cap drops boilerplate hashes (title cards every
    clip shares) instead of emitting O(f^2) pairs on them."""
    from eth2dgraph_spark.pipeline.multimodal import video_overlap_pairs

    rows = [
        # clips 1,2 share hashes 100 and 101 (a near-dup pair)
        (1, 0, 100, "ok"), (1, 1000, 101, "ok"), (1, 2000, 7, "ok"),
        (2, 0, 100, "ok"), (2, 1000, 101, "ok"), (2, 2000, 8, "ok"),
        # clip 3 shares only hash 100 with 1,2 -> below min_shared=2
        (3, 0, 100, "ok"), (3, 1000, 9, "ok"),
        # hash 500 appears in EVERY clip (boilerplate title card)
        (1, 3000, 500, "ok"), (2, 3000, 500, "ok"),
        (3, 2000, 500, "ok"), (4, 0, 500, "ok"),
        # NULL hash rows (decode errors) must not join
        (4, 1000, None, "error"), (5, 0, None, "error"),
    ]
    fh = spark.createDataFrame(
        rows, "asset_id long, frame_ts_ms long, phash long, decode_ok string"
    )
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in video_overlap_pairs(fh, min_shared=2).collect()}
    # with the boilerplate hash 500 posting (4 clips <= cap), 1-2 share
    # 100,101,500 and clip 3 reaches min_shared via 100+500
    assert got == {(1, 2): 3, (1, 3): 2, (2, 3): 2}
    # cap at 3: hash 500's posting (4 clips) is dropped entirely; 1-2 keep 100,101
    capped = {(r["id_a"], r["id_b"]): r["n_shared"]
              for r in video_overlap_pairs(fh, min_shared=2, max_posting=3).collect()}
    assert capped == {(1, 2): 2}


def test_video_near_pairs_end_to_end(spark):
    """Real bytes all the way: two clip groups -> exactly the same-group
    pairs, with n_shared = the full frame count."""
    from eth2dgraph_spark.pipeline import multimodal

    clip_a = encode_avi(_clip(n=3, h=16, w=16, seed=21), fps=1)
    clip_b = encode_avi(_clip(n=3, h=16, w=16, seed=22), fps=1)
    rows = [
        (1, "video", "video/avi", bytearray(clip_a), None, None, 2500),
        (2, "video", "video/avi", bytearray(clip_a), None, None, 2500),
        (3, "video", "video/avi", bytearray(clip_b), None, None, 2500),
        (4, "video", "video/avi", bytearray(clip_b), None, None, 2500),
        (5, "video", "video/avi", bytearray(clip_a), None, None, 2500),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in multimodal.video_near_pairs(assets, every_ms=1000).collect()}
    assert got == {(1, 2): 3, (1, 5): 3, (2, 5): 3, (3, 4): 3}


def test_fingerprint_overlap_pairs_hamming_semantics(spark):
    """Hamming-tolerant frame matching: near hash values (1 flipped bit)
    count as shared; max_hamming=0 degenerates to the exact kernel;
    singleton postings can still match near hashes (unlike the exact
    kernel's >1 posting filter); NULLs never post."""
    from eth2dgraph_spark.pipeline.multimodal import (
        fingerprint_overlap_pairs,
        fingerprint_overlap_pairs_hamming,
    )

    rows = [
        (1, 0, 100, "ok"), (1, 1, 1 << 20, "ok"),
        (2, 0, 100, "ok"), (2, 1, (1 << 20) | 1, "ok"),  # hamming 1 to 1's
        (3, 0, 1 << 50, "ok"),
        (4, 0, None, "error"),
    ]
    fh = spark.createDataFrame(
        rows, "asset_id long, frame_ts_ms long, phash long, decode_ok string"
    )
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in fingerprint_overlap_pairs_hamming(fh, max_hamming=1, min_shared=2).collect()}
    assert got == {(1, 2): 2}  # exact 100 + near (1<<20 ~ (1<<20)|1)
    # h=0 == exact semantics on the same input (min_shared=1 to see both)
    h0 = {(r["id_a"], r["id_b"]): r["n_shared"]
          for r in fingerprint_overlap_pairs_hamming(fh, max_hamming=0, min_shared=1).collect()}
    ex = {(r["id_a"], r["id_b"]): r["n_shared"]
          for r in fingerprint_overlap_pairs(fh, min_shared=1).collect()}
    assert h0 == ex == {(1, 2): 1}
    with pytest.raises(ValueError, match="max_hamming"):
        fingerprint_overlap_pairs_hamming(fh, max_hamming=-1)


def test_hamming_overlap_end_to_end_flipped_pixel_clip(spark):
    """Real bytes: a clip whose frames differ from another clip's by a
    single pixel produces pHashes within small hamming — the tolerant
    matcher pairs them where exact matching cannot."""
    from eth2dgraph_spark.pipeline import multimodal

    base = _clip(n=3, h=16, w=16, seed=99)
    drift = base.copy()
    drift[:, 0, 0, :] ^= 3  # one pixel nudged in every frame
    rows = [
        (1, "video", "video/avi", bytearray(encode_avi(base, fps=1)), None, None, 2500),
        (2, "video", "video/avi", bytearray(encode_avi(drift, fps=1)), None, None, 2500),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    fh = multimodal.video_frame_phashes(assets, every_ms=1000)
    exact = multimodal.fingerprint_overlap_pairs(fh, min_shared=2).collect()
    ham = multimodal.fingerprint_overlap_pairs_hamming(
        fh, max_hamming=4, min_shared=2
    ).collect()
    # the drifted clip's hashes may coincide or drift by a few bits; the
    # tolerant matcher must pair them, and must find at least as much as
    # the exact matcher
    assert {(r["id_a"], r["id_b"]) for r in ham} == {(1, 2)}
    assert len(ham) >= len(exact)
