"""Pure-stdlib AVI (RIFF 'AVI ') uncompressed-video codec — the
real-container-bytes VIDEO path for the multimodal seam in environments
where PyAV cannot be installed (this container: pip is network-blocked,
attempts documented in BASELINE.md). The video sibling of functions/png.py
and functions/wav.py, built to the same discipline: synthesize real
container bytes in tests, decode them with zero external dependencies,
reject everything outside the supported subset with ValueError so
decode_video_frames degrades the row to 'error' (bad bytes are data, not a
job crash), and bound resources on untrusted input BEFORE touching pixel
data.

Scope: canonical single-stream RIFF/AVI with one 'vids' stream of
uncompressed BI_RGB 24-bit DIB frames ('00db' chunks, bottom-up BGR rows
padded to 4-byte stride) and a mandatory idx1 index. Anything else
(compressed fourccs, multiple streams, 8/16/32-bit, top-down, palettized,
missing index) raises. Parsing is STRICT — AVI, like WAV, has no CRC, so
cross-field consistency (riff size, avih↔strh↔strf agreement, chunk sizes,
idx1 offsets) is the only corruption signal available; strictness is what
lets the property tests assert that any single-byte flip in the header or
index region is caught.

Reference parity note: the reference engine (davideaimar/eth2dgraph) has no
video surface; this module serves the brief's multimodal-column requirement
(binary payload -> typed per-frame feature) with a decoder that executes on
real bytes rather than an injected fake.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

# Resource guard, same role as png.DEFAULT_MAX_PIXELS / wav.DEFAULT_MAX_SAMPLES:
# cap total pixels (frames x height x width) parsed from the headers BEFORE
# any frame bytes are decoded. AVI-DIB is uncompressed so there is no
# inflation bomb, but the declared sizes still bound downstream O(n) work;
# 16M pixels = 48 MB of BGR, past any 16-bin pooling need.
DEFAULT_MAX_PIXELS = 16_777_216

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # DIB rows pad to 4-byte boundaries


def decode_avi(
    data: "bytes | bytearray | memoryview", max_pixels: int = DEFAULT_MAX_PIXELS
) -> "tuple[np.ndarray, float]":
    """Decode AVI bytes to (frames, fps): frames is uint8 of shape
    (n_frames, height, width, 3) in RGB order (file order BGR bottom-up is
    undone), fps = rate/scale from the stream header. Raises ValueError on
    corrupt or out-of-scope bytes: bad magic, any size-field inconsistency,
    truncation, trailing garbage, compressed or non-24-bit formats, stream
    counts != 1, missing/disagreeing idx1, or more than ``max_pixels``
    total declared pixels."""
    if data is None:
        raise ValueError("avi: empty payload")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: bad RIFF/AVI signature")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size != len(data) - 8:
        raise ValueError(f"avi: RIFF size field {riff_size} != actual {len(data) - 8}")

    def chunks(lo: int, hi: int):
        pos = lo
        while pos < hi:
            if pos + 8 > hi:
                raise ValueError("avi: truncated chunk header")
            cid, ln = struct.unpack_from("<4sI", data, pos)
            body_lo, body_hi = pos + 8, pos + 8 + ln
            if body_hi > hi:
                raise ValueError(f"avi: truncated {cid!r} chunk")
            yield cid, body_lo, body_hi
            pos = body_hi + (ln & 1)  # chunks are word-aligned (even padding)
        if pos != hi:
            raise ValueError("avi: trailing bytes after final chunk")

    tops = list(chunks(12, len(data)))
    if (
        len(tops) != 3
        or tops[0][0] != b"LIST"
        or data[tops[0][1] : tops[0][1] + 4] != b"hdrl"
        or tops[1][0] != b"LIST"
        or data[tops[1][1] : tops[1][1] + 4] != b"movi"
        or tops[2][0] != b"idx1"
    ):
        raise ValueError("avi: expected exactly LIST-hdrl, LIST-movi, idx1")

    # ---- hdrl: avih + one LIST-strl(strh, strf) --------------------------
    hdrl = list(chunks(tops[0][1] + 4, tops[0][2]))
    if (
        len(hdrl) != 2
        or hdrl[0][0] != b"avih"
        or hdrl[1][0] != b"LIST"
        or data[hdrl[1][1] : hdrl[1][1] + 4] != b"strl"
    ):
        raise ValueError("avi: hdrl must hold avih then one LIST-strl")
    avih = data[hdrl[0][1] : hdrl[0][2]]
    if len(avih) != 56:
        raise ValueError(f"avi: avih size {len(avih)} (56 required)")
    (
        us_per_frame,
        max_bps,
        pad_gran,
        flags,
        total_frames,
        init_frames,
        n_streams,
        sug_buf,
        width,
        height,
    ) = struct.unpack_from("<10I", avih, 0)
    if avih[40:] != b"\x00" * 16:
        raise ValueError("avi: nonzero avih reserved words")
    if n_streams != 1:
        raise ValueError(f"avi: {n_streams} streams (single-stream only)")
    if pad_gran != 0 or init_frames != 0 or flags != _AVIF_HASINDEX:
        raise ValueError("avi: unsupported avih flags/padding/interleave")
    if width < 1 or height < 1 or total_frames < 1:
        raise ValueError("avi: zero width, height, or frame count")
    if total_frames * height * width > max_pixels:
        raise ValueError(
            f"avi: {total_frames * height * width} pixels exceeds "
            f"max_pixels={max_pixels}"
        )
    frame_size = _stride(width) * height
    if sug_buf != frame_size or max_bps * us_per_frame == 0:
        raise ValueError("avi: avih buffer/rate fields inconsistent")

    strl = list(chunks(hdrl[1][1] + 4, hdrl[1][2]))
    if len(strl) != 2 or strl[0][0] != b"strh" or strl[1][0] != b"strf":
        raise ValueError("avi: strl must hold strh then strf")
    strh = data[strl[0][1] : strl[0][2]]
    if len(strh) != 56:
        raise ValueError(f"avi: strh size {len(strh)} (56 required)")
    fcc_type, handler = strh[0:4], strh[4:8]
    (
        s_flags,
        prio_lang,
        s_init,
        scale,
        rate,
        start,
        length,
        s_buf,
        quality,
        sample_size,
    ) = struct.unpack_from("<10I", strh, 8)
    rc = struct.unpack_from("<4h", strh, 48)
    if fcc_type != b"vids" or handler != b"DIB ":
        raise ValueError(f"avi: unsupported stream {fcc_type!r}/{handler!r}")
    if s_flags or prio_lang or s_init or start or quality or sample_size:
        raise ValueError("avi: nonzero reserved strh fields")
    if scale < 1 or rate < 1 or length != total_frames or s_buf != frame_size:
        raise ValueError("avi: strh rate/length/buffer disagree with avih")
    if us_per_frame != round(1_000_000 * scale / rate):
        raise ValueError(
            f"avi: dwMicroSecPerFrame {us_per_frame} != 1e6*scale/rate"
        )
    if max_bps != (frame_size * rate + scale - 1) // scale:
        raise ValueError("avi: dwMaxBytesPerSec != frame_size*fps")
    if rc != (0, 0, width, height):
        raise ValueError(f"avi: rcFrame {rc} != (0,0,{width},{height})")

    strf = data[strl[1][1] : strl[1][2]]
    if len(strf) != 40:
        raise ValueError(f"avi: strf size {len(strf)} (BITMAPINFOHEADER=40)")
    (
        bi_size,
        bi_w,
        bi_h,
        planes,
        bpp,
        compression,
        size_image,
        xp,
        yp,
        clr_used,
        clr_imp,
    ) = struct.unpack("<IiiHHIIiiII", strf)
    if bi_size != 40 or planes != 1:
        raise ValueError("avi: bad BITMAPINFOHEADER size/planes")
    if compression != 0 or bpp != 24:
        raise ValueError(
            f"avi: unsupported compression={compression} bpp={bpp} "
            "(BI_RGB 24-bit only)"
        )
    if bi_w != width or bi_h != height:  # bi_h>0 == bottom-up, the only scope
        raise ValueError(
            f"avi: strf {bi_w}x{bi_h} disagrees with avih {width}x{height}"
        )
    if size_image != frame_size or xp or yp or clr_used or clr_imp:
        raise ValueError("avi: strf image-size/reserved fields inconsistent")

    # ---- movi: exactly total_frames '00db' chunks of frame_size bytes ----
    movi_lo = tops[1][1]  # offset of the 'movi' fourcc itself
    frames = np.empty((total_frames, height, width, 3), dtype=np.uint8)
    offsets = []
    i = 0
    for cid, lo, hi in chunks(movi_lo + 4, tops[1][2]):
        if cid != b"00db" or hi - lo != frame_size:
            raise ValueError(
                f"avi: movi chunk {i}: {cid!r} len={hi - lo} "
                f"(00db of {frame_size} required)"
            )
        if i >= total_frames:
            raise ValueError("avi: more movi chunks than dwTotalFrames")
        offsets.append(lo - 8 - movi_lo)  # idx1 offsets point at the ck header
        raw = np.frombuffer(data, dtype=np.uint8, count=frame_size, offset=lo)
        rows = raw.reshape(height, _stride(width))[:, : width * 3]
        frames[i] = rows.reshape(height, width, 3)[::-1, :, ::-1]  # flip+BGR->RGB
        i += 1
    if i != total_frames:
        raise ValueError(f"avi: {i} movi chunks != dwTotalFrames {total_frames}")

    # ---- idx1: one keyframe entry per chunk, offsets/sizes exact ---------
    idx = data[tops[2][1] : tops[2][2]]
    if len(idx) != 16 * total_frames:
        raise ValueError(f"avi: idx1 size {len(idx)} != 16*{total_frames}")
    for j in range(total_frames):
        ckid, iflags, off, sz = struct.unpack_from("<4sIII", idx, 16 * j)
        if ckid != b"00db" or iflags != _AVIIF_KEYFRAME:
            raise ValueError(f"avi: idx1 entry {j}: bad ckid/flags")
        if off != offsets[j] or sz != frame_size:
            raise ValueError(f"avi: idx1 entry {j}: offset/size disagree")
    return frames, rate / scale


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode frames — uint8 (n, h, w, 3) RGB — as canonical single-stream
    uncompressed RIFF/AVI bytes (BI_RGB 24-bit '00db' chunks + idx1). The
    synthesis half of the codec: tests and sinks produce real container
    bytes with no external library (the encode_png/encode_wav discipline)."""
    a = np.asarray(frames)
    if a.dtype != np.uint8 or a.ndim != 4 or a.shape[3] != 3 or a.shape[0] < 1:
        raise ValueError(f"avi: frames must be uint8 (n,h,w,3), got {a.shape}")
    if int(fps) != fps or fps < 1:
        raise ValueError(f"avi: fps must be a positive integer, got {fps}")
    n, h, w = a.shape[:3]
    stride = _stride(w)
    frame_size = stride * h
    us_per_frame = round(1_000_000 / fps)

    avih = struct.pack(
        "<10I16x",
        us_per_frame,
        frame_size * fps,
        0,
        _AVIF_HASINDEX,
        n,
        0,
        1,
        frame_size,
        w,
        h,
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<10I4h", 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0, 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    def ck(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    strl = b"LIST" + struct.pack("<I", 4 + len(ck(b"strh", strh)) + len(ck(b"strf", strf))) + b"strl" + ck(b"strh", strh) + ck(b"strf", strf)
    hdrl_body = ck(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body

    padded = np.zeros((n, h, stride), dtype=np.uint8)
    padded[:, :, : w * 3] = a[:, ::-1, :, ::-1].reshape(n, h, w * 3)  # top-down RGB -> bottom-up BGR
    movi_body = b"".join(ck(b"00db", f.tobytes()) for f in padded)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body

    idx = b"".join(
        struct.pack(
            "<4sIII", b"00db", _AVIIF_KEYFRAME, 4 + i * (8 + frame_size), frame_size
        )
        for i in range(n)
    )
    body = b"AVI " + hdrl + movi + ck(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def luma_grid16(frame: np.ndarray) -> np.ndarray:
    """Pool one RGB uint8 frame to the 16-dim luminance grid — the same
    feature contract as the PyAV path (_decode_video_frames_av): BT.601
    integer-ratio luma (299R+587G+114B)/1000 scaled to [0,1], cropped to
    multiples of 4, 4x4 block-mean, flattened. Factored here so the stdlib
    AVI path, the gate oracle, and tests share one definition."""
    f = frame.astype(np.float64)
    luma = (299.0 * f[:, :, 0] + 587.0 * f[:, :, 1] + 114.0 * f[:, :, 2]) / 1000.0 / 255.0
    h, w = luma.shape
    pooled = luma[: h - h % 4 or h, : w - w % 4 or w]
    ph, pw = pooled.shape
    return pooled.reshape(4, ph // 4, 4, pw // 4).mean(axis=(1, 3)).reshape(16)


def synthetic_luma_udf():
    """pandas UDF factory: doc_id -> 32-element float64 array, the two
    4x4-pooled luma grids of a deterministic 2-frame 8x8 AVI clip computed
    through a REAL container-bytes encode->decode roundtrip (encode_avi ->
    decode_avi) per row. Pooled block b of frame f is a constant gray
    v = ((doc_id*31 + f*16 + b) % 32) * 8, so bin (f*16+b) equals v/255
    EXACTLY in float64 (BT.601 integer-ratio luma of gray v is 1000v/1000;
    the 2x2 block mean of four identical doubles is exact) — a closed form
    a SQL oracle can replay. This is the avi_luma driver gate's kernel; it
    lives here so the pandas type hints resolve against this module's
    globals (the entry module uses `from __future__ import annotations`)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<double>")
    def avi_luma(doc_ids: pd.Series) -> pd.Series:
        out = []
        for d in doc_ids:
            blocks = (int(d) * 31 + np.arange(32)) % 32 * 8  # (2 frames)x(16 blocks)
            grid = blocks.reshape(2, 4, 4).astype(np.uint8)
            px = np.repeat(np.repeat(grid, 2, axis=1), 2, axis=2)  # 8x8 pixels
            frames = np.repeat(px[:, :, :, None], 3, axis=3)  # gray RGB
            dec, fps = decode_avi(encode_avi(frames, fps=10))
            assert fps == 10.0
            out.append(np.concatenate([luma_grid16(f) for f in dec]))
        return pd.Series(out)

    return avi_luma


def synthetic_clip_udf():
    """pandas UDF factory: doc_id -> real AVI container bytes, a
    deterministic 3-frame 16x16 clip at 1 fps whose pattern depends only on
    group = doc_id % 25 — every document in a group carries a bit-identical
    clip, so per-frame pHashes match exactly within a group, and the
    video-near-dup gate's oracle is the closed-form same-group pair set.
    Block (0,0) pins the group (g*10) and block (0,1) the frame index
    (f*85), so no two distinct (group, frame) patterns are pixel-equal;
    the remaining 4x4 blocks vary as (g*31 + f*16 + b*7) % 256. Measured
    on groups 0..24: no two groups share more than ONE colliding frame
    pHash (hash_size=8, dct_size=16), so min_shared=2 separates
    same-group pairs (n_shared=3) from collision noise deterministically."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def avi_clip(doc_ids: pd.Series) -> pd.Series:
        cache: dict[int, bytes] = {}
        out = []
        for d in doc_ids:
            g = int(d) % 25
            if g not in cache:
                frames = []
                for f in range(3):
                    flat = (g * 31 + f * 16 + np.arange(16) * 7) % 256
                    grid = flat.reshape(4, 4).astype(np.uint8)
                    grid[0, 0] = g * 10
                    grid[0, 1] = f * 85
                    px = np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1)
                    frames.append(np.repeat(px[:, :, None], 3, axis=2))
                cache[g] = encode_avi(np.stack(frames), fps=1)
            out.append(cache[g])
        return pd.Series(out)

    return avi_clip
