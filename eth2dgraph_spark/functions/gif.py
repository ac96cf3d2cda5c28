"""Pure-stdlib GIF codec (struct-free byte walking + numpy).

GIF is the remaining ubiquitous web-corpus image container after
PNG/JPEG; unlike JPEG it is LOSSLESS over its palette, so closed-form
oracles can demand EXACT pixel equality through a real
encode→LZW-decode roundtrip. This module implements the public GIF87a/
GIF89a spec:

- decode_gif: header + logical screen descriptor, global/local color
  tables, extension skipping (GCE/APP/comment), the FIRST image
  descriptor (still-image scope — animation is the AVI/video layer's
  job), LZW decompression (LSB-first bit packing, clear/end codes,
  variable code width 3..12 bits), interlace reordering, palette → RGB.
  Frames smaller than the logical screen composite onto a background-
  color canvas. Anything malformed raises ValueError — the multimodal
  kernels' 'error'-row contract.

- encode_gif: minimal valid GIF89a for synthesis/tests — 2D grayscale
  (fixed 256-gray palette, pixels used verbatim: the roundtrip is
  BYTE-EXACT) or (H, W, 3) RGB with <= 256 distinct colors (exact over
  the constructed palette; > 256 colors raises — quantization is a
  Pillow-path concern). Real LZW with code-width growth and a
  dictionary reset at 4096 entries.

No reference parallel — the reference (eth2dgraph, Rust) has no image
layer; this extends the no-pip codec chain (png.py, jpeg.py, wav.py,
avi.py) per SURVEY.md's multimodal training-data mandate. Golden-tested
against the CPython test suite's python.gif vs its lossless PPM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(mcs: int, data: bytes, expected: int) -> np.ndarray:
    """GIF LZW: LSB-first bit stream, initial code width mcs+1, clear and
    end-of-information codes, width grows after the dictionary fills the
    current width, 12-bit cap. Returns exactly `expected` indices."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"gif: bad LZW minimum code size {mcs}")
    clear = 1 << mcs
    end = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0
    v = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    prev: bytes | None = None
    while True:
        if pos + width > nbits:
            raise ValueError("gif: LZW stream truncated")
        code = (v >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first LZW code out of range")
            seq = table[code]
        elif code < len(table):
            seq = table[code]
            table.append(prev + seq[:1])
        elif code == len(table):
            seq = prev + prev[:1]
            table.append(seq)
        else:
            raise ValueError("gif: LZW code out of range")
        if n_out + len(seq) > expected:
            # more pixels than the image descriptor promised
            raise ValueError("gif: LZW output exceeds image size")
        out[n_out : n_out + len(seq)] = np.frombuffer(seq, dtype=np.uint8)
        n_out += len(seq)
        prev = seq
        if len(table) == (1 << width) and width < 12:
            width += 1
        if n_out == expected:
            break
    if n_out != expected:
        raise ValueError(f"gif: LZW produced {n_out} of {expected} pixels")
    return out


def _sub_blocks(data: bytes, i: int) -> "tuple[bytes, int]":
    """Concatenate a GIF sub-block chain starting at i; returns
    (payload, index after the 0 terminator)."""
    parts = []
    n = len(data)
    while True:
        if i >= n:
            raise ValueError("gif: truncated sub-block chain")
        ln = data[i]
        i += 1
        if ln == 0:
            return b"".join(parts), i
        if i + ln > n:
            raise ValueError("gif: truncated sub-block")
        parts.append(data[i : i + ln])
        i += ln


def decode_gif(data: bytes) -> np.ndarray:
    """Decode GIF bytes to the first frame as a uint8 (H, W, 3) RGB array
    over the logical screen. Raises ValueError on malformed or
    unsupported input."""
    if len(data) < 14 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("gif: missing GIF87a/GIF89a signature")
    w = data[6] | data[7] << 8
    h = data[8] | data[9] << 8
    if w == 0 or h == 0:
        raise ValueError("gif: zero logical screen dimension")
    flags = data[10]
    bg_index = data[11]
    i = 13
    gct = None
    if flags & 0x80:
        sz = 2 << (flags & 7)
        if i + 3 * sz > len(data):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(data[i : i + 3 * sz], dtype=np.uint8).reshape(sz, 3)
        i += 3 * sz
    transparent = None
    while i < len(data):
        b = data[i]
        if b == 0x3B:  # trailer before any image
            raise ValueError("gif: no image data")
        if b == 0x21:  # extension: label + sub-blocks
            if i + 2 > len(data):
                raise ValueError("gif: truncated extension")
            label = data[i + 1]
            body, i = _sub_blocks(data, i + 2)
            if label == 0xF9 and len(body) >= 4 and body[0] & 1:
                transparent = body[3]  # GCE transparency flag + index
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        # image descriptor
        if i + 10 > len(data):
            raise ValueError("gif: truncated image descriptor")
        x0 = data[i + 1] | data[i + 2] << 8
        y0 = data[i + 3] | data[i + 4] << 8
        iw = data[i + 5] | data[i + 6] << 8
        ih = data[i + 7] | data[i + 8] << 8
        f = data[i + 9]
        i += 10
        if iw == 0 or ih == 0 or x0 + iw > w or y0 + ih > h:
            raise ValueError("gif: image exceeds logical screen")
        pal = gct
        if f & 0x80:  # local color table
            sz = 2 << (f & 7)
            if i + 3 * sz > len(data):
                raise ValueError("gif: truncated local color table")
            pal = np.frombuffer(data[i : i + 3 * sz], dtype=np.uint8).reshape(sz, 3)
            i += 3 * sz
        if pal is None:
            raise ValueError("gif: image has no color table")
        if i >= len(data):
            raise ValueError("gif: missing LZW minimum code size")
        mcs = data[i]
        lzw, i = _sub_blocks(data, i + 1)
        idx = _lzw_decode(mcs, lzw, iw * ih).reshape(ih, iw)
        if f & 0x40:  # interlaced: reorder rows by the four passes
            de = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, ih, step)
                de[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = de
        if (idx >= len(pal)).any():
            raise ValueError("gif: pixel index outside color table")
        # transparent pixels (GCE flag) keep their PALETTE color — the
        # still-image convention the golden pins: CPython's python.ppm
        # sibling renders python.gif's transparent index as its palette
        # value (black), and compositing onto the background color
        # measured 23x worse against that ground truth (mean |err| 4.4
        # palette-color vs 102.7 composited). `transparent` stays parsed
        # for callers that want the mask semantics later.
        del transparent
        # Compose in RGB: the frame region resolves through ITS OWN
        # palette (local when present), while undrawn background pixels
        # resolve through the table bg_index refers to — the GCT (the
        # spec ties the background index to the global table; a local
        # table applies only to the image that carries it). Before this,
        # mixed-palette stills with a sub-screen frame rendered the
        # background through the frame's local palette.
        base = gct if gct is not None else pal
        bg = bg_index if gct is not None and bg_index < len(gct) else 0
        out = np.empty((h, w, 3), dtype=np.uint8)
        out[:] = base[bg]
        out[y0 : y0 + ih, x0 : x0 + iw] = pal[idx]
        return out
    raise ValueError("gif: ran past end of file (no trailer)")


# ------------------------------------------------------------------ encode


def _lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    clear = 1 << mcs
    end = clear + 1
    out_v = 0
    out_bits = 0
    chunks = []

    def put(code: int, width: int) -> None:
        nonlocal out_v, out_bits
        out_v |= code << out_bits
        out_bits += width

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    put(clear, width)
    cur = b""
    for p in indices.tolist():
        nxt = cur + bytes([p])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # mirror the decoder exactly: its table stays ONE entry behind our
        # next_code (the deferred KwKwK append), and it grows width when
        # ITS size reaches the width's capacity — so we grow at
        # next_code - 1 == 2^width (verified by the exhaustive roundtrip
        # property test crossing the 512/1024-entry boundaries)
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:  # dictionary full: reset
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        cur = bytes([p])
    if cur:
        put(table[cur], width)
    put(end, width)
    raw = out_v.to_bytes((out_bits + 7) // 8, "little")
    for k in range(0, len(raw), 255):
        part = raw[k : k + 255]
        chunks.append(bytes([len(part)]) + part)
    chunks.append(b"\x00")
    return b"".join(chunks)


def encode_gif(arr: np.ndarray) -> bytes:
    """Encode a uint8 array as GIF89a: 2D grayscale (256-gray palette,
    byte-exact roundtrip) or (H, W, 3) RGB with <= 256 distinct colors."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("gif: encoder expects uint8 pixels")
    if a.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idx = a
    elif a.ndim == 3 and a.shape[2] == 3:
        flat = a.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(f"gif: {len(pal)} distinct colors (> 256); quantize first")
        pad = np.zeros((max(0, 2 - len(pal)), 3), dtype=np.uint8)
        pal = np.vstack([pal, pad]).astype(np.uint8)
        idx = inv.reshape(a.shape[:2]).astype(np.uint8)
    else:
        raise ValueError(f"gif: unsupported array shape {a.shape}")
    h, w = idx.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"gif: unencodable dimensions {h}x{w}")
    # color table size: smallest power of two >= len(pal), min 2
    bits = max(1, int(len(pal) - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    out = bytearray()
    out += b"GIF89a"
    out += bytes([w & 255, w >> 8, h & 255, h >> 8])
    out += bytes([0x80 | ((bits - 1) & 7), 0, 0])  # GCT present, bg 0
    out += table.tobytes()
    out += bytes([0x2C, 0, 0, 0, 0, w & 255, w >> 8, h & 255, h >> 8, 0])
    mcs = max(2, bits)
    out += bytes([mcs])
    out += _lzw_encode(mcs, idx.reshape(-1))
    out += b"\x3B"
    return bytes(out)


def synthetic_group_gif(g: int) -> bytes:
    """Frozen group→GIF construction (the PNG/JPEG siblings' seeded-
    random-grid family, its own seed multiplier): 8x8
    RandomState(g*7541 + 41) grid upscaled 4x, GIF-encoded — bit-identical
    within a group, and LOSSLESS, so the decoded pixels equal the grid
    construction exactly."""
    rs = np.random.RandomState(g * 7541 + 41)
    grid = rs.randint(0, 256, size=(8, 8), dtype=np.uint8)
    return encode_gif(np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1))


def synthetic_luma_gif_udf():
    """pandas UDF factory: doc_id -> 16-element float64 array, the 4x4
    block-mean luma grid of a deterministic 32x32 grayscale image pushed
    through a REAL encode_gif -> decode_gif roundtrip per row. GIF is
    lossless, so bin k equals the block value (doc_id*29 + k*13) % 256
    EXACTLY — zero-tolerance closed-form oracle (the jpeg_luma pattern
    for the GIF container). Gray input decodes to RGB with all three
    channels equal; channel 0 is taken directly — the Rec.601 weighted
    sum of three equal floats is NOT exact (0.299v+0.587v+0.114v rounds
    one ulp off v) and would poison the zero-tolerance hash."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<double>")
    def gif_luma(doc_ids: pd.Series) -> pd.Series:
        out = []
        for d in doc_ids:
            blocks = ((int(d) * 29 + np.arange(16) * 13) % 256).astype(np.uint8)
            img = np.repeat(np.repeat(blocks.reshape(4, 4), 8, axis=0), 8, axis=1)
            lum = decode_gif(encode_gif(img))[:, :, 0].astype(np.float64)
            pooled = lum.reshape(4, 8, 4, 8).mean(axis=(1, 3))
            out.append(pooled.reshape(-1))
        return pd.Series(out)

    return gif_luma


# ------------------------------------------------------------- animation


def decode_gif_frames(data: bytes) -> "tuple[np.ndarray, list[int]]":
    """Decode an animated (or single-frame) GIF to (frames, delays_ms):
    frames is uint8 (N, H, W, 3) over the logical screen, delays the GCE
    delay per frame in ms (100 when absent or zero — the player default).
    Real animation semantics, unlike decode_gif's still-image view:
    transparent pixels show the PREVIOUS canvas content (frame-over-frame
    compositing), disposal 0/1 leave the canvas, disposal 2 restores the
    background after the frame is emitted; disposal 3 (restore-previous)
    raises — rare, and silently approximating it would corrupt every
    later frame."""
    if len(data) < 14 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("gif: missing GIF87a/GIF89a signature")
    w = data[6] | data[7] << 8
    h = data[8] | data[9] << 8
    if w == 0 or h == 0:
        raise ValueError("gif: zero logical screen dimension")
    flags = data[10]
    bg_index = data[11]
    i = 13
    gct = None
    if flags & 0x80:
        sz = 2 << (flags & 7)
        if i + 3 * sz > len(data):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(data[i : i + 3 * sz], dtype=np.uint8).reshape(sz, 3)
        i += 3 * sz
    bg = bg_index if gct is not None and bg_index < len(gct) else 0
    # The canvas composites in RGB, not palette indices: an index canvas
    # cannot record WHICH palette each pixel was drawn with, so frames
    # drawn from a LOCAL color table would be re-resolved through the GCT
    # (a full-screen blue local-palette frame decoded as red). RGB
    # compositing applies each frame's own palette to its region at draw
    # time; initialization (and disposal-2 restores) use the background
    # color resolved through the GCT. When there is no GCT, the first
    # frame's local palette supplies the background color (resolved
    # lazily below — the canvas is never emitted before the first draw).
    canvas: "np.ndarray | None" = None
    bg_color: "np.ndarray | None" = None if gct is None else gct[bg]
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = None
    disposal = 0
    delay_ms = 100
    while i < len(data):
        b = data[i]
        if b == 0x3B:
            break
        if b == 0x21:
            if i + 2 > len(data):
                raise ValueError("gif: truncated extension")
            label = data[i + 1]
            body, i = _sub_blocks(data, i + 2)
            if label == 0xF9 and len(body) >= 4:
                disposal = (body[0] >> 2) & 7
                transparent = body[3] if body[0] & 1 else None
                delay_ms = ((body[1] | body[2] << 8) or 10) * 10
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        if i + 10 > len(data):
            raise ValueError("gif: truncated image descriptor")
        x0 = data[i + 1] | data[i + 2] << 8
        y0 = data[i + 3] | data[i + 4] << 8
        iw = data[i + 5] | data[i + 6] << 8
        ih = data[i + 7] | data[i + 8] << 8
        f = data[i + 9]
        i += 10
        if iw == 0 or ih == 0 or x0 + iw > w or y0 + ih > h:
            raise ValueError("gif: image exceeds logical screen")
        pal = gct
        if f & 0x80:
            sz = 2 << (f & 7)
            if i + 3 * sz > len(data):
                raise ValueError("gif: truncated local color table")
            pal = np.frombuffer(data[i : i + 3 * sz], dtype=np.uint8).reshape(sz, 3)
            i += 3 * sz
        if pal is None:
            raise ValueError("gif: image has no color table")
        if disposal == 3:
            raise ValueError("gif: disposal method 3 (restore previous) unsupported")
        if i >= len(data):
            raise ValueError("gif: missing LZW minimum code size")
        mcs = data[i]
        lzw, i = _sub_blocks(data, i + 1)
        idx = _lzw_decode(mcs, lzw, iw * ih).reshape(ih, iw)
        if (idx >= len(pal)).any():
            raise ValueError("gif: pixel index outside color table")
        if bg_color is None:
            bg_color = pal[bg if bg < len(pal) else 0]
        if canvas is None:
            canvas = np.empty((h, w, 3), dtype=np.uint8)
            canvas[:] = bg_color
        rgb = pal[idx]
        region = canvas[y0 : y0 + ih, x0 : x0 + iw]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:
            canvas[y0 : y0 + ih, x0 : x0 + iw] = bg_color
        transparent = None
        disposal = 0
        delay_ms = 100
    if not frames:
        raise ValueError("gif: no image data")
    return np.stack(frames), delays


def encode_gif_frames(frames: np.ndarray, delay_ms: int = 100) -> bytes:
    """Encode uint8 (N, H, W) grayscale frames as an animated GIF89a —
    full-frame draw-over, one GCE (delay, no transparency) per frame,
    256-gray global palette: the roundtrip through decode_gif_frames is
    BYTE-EXACT per frame. Synthesis/test encoder (the AVI sibling)."""
    a = np.asarray(frames)
    if a.dtype != np.uint8 or a.ndim != 3:
        raise ValueError("gif: animated encoder expects uint8 (N, H, W) frames")
    n, h, w = a.shape
    if n == 0 or h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"gif: unencodable frame geometry {a.shape}")
    if not 0 < delay_ms <= 655350:
        raise ValueError(f"gif: bad delay {delay_ms}")
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out = bytearray()
    out += b"GIF89a"
    out += bytes([w & 255, w >> 8, h & 255, h >> 8, 0x80 | 7, 0, 0])
    out += pal.tobytes()
    d = delay_ms // 10
    for frame in a:
        out += bytes([0x21, 0xF9, 4, 0, d & 255, d >> 8, 0, 0])  # GCE
        out += bytes([0x2C, 0, 0, 0, 0, w & 255, w >> 8, h & 255, h >> 8, 0])
        out += bytes([8])  # LZW minimum code size for a 256-color palette
        out += _lzw_encode(8, frame.reshape(-1))
    out += b"\x3B"
    return bytes(out)


def synthetic_clip_gif_udf():
    """pandas UDF factory: doc_id -> real ANIMATED-GIF container bytes, a
    deterministic 3-frame 16x16 clip (1000 ms/frame) with EXACTLY the
    avi.synthetic_clip_udf frame construction — GIF is lossless over its
    gray palette and AVI is uncompressed, so the two containers decode to
    pixel-identical frames and the AVI gate's measured collision property
    (no two groups share more than ONE frame pHash; same-group clips
    share all 3) transfers verbatim. Bit-identical within group
    doc_id % 25."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def gif_clip(doc_ids: pd.Series) -> pd.Series:
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
                    frames.append(np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1))
                cache[g] = encode_gif_frames(np.stack(frames), delay_ms=1000)
            out.append(cache[g])
        return pd.Series(out)

    return gif_clip
