"""Pure-stdlib PNG codec (zlib + struct + numpy) — the real-container-bytes
image path for the multimodal seam in environments where Pillow cannot be
installed (this container: pip is network-blocked, attempts documented in
BASELINE.md).

Scope: 8-bit, non-interlaced, color types 0 (grayscale), 2 (RGB) and
6 (RGBA) — the subset a deterministic training-data pipeline can synthesize
and verify end-to-end. Everything else (palette, 16-bit, Adam7 interlace)
raises ValueError so decode_features degrades the row to 'error' (bad or
unsupported bytes are data, not a job crash). All five scanline filters
(None/Sub/Up/Average/Paeth, PNG spec §9) are implemented and unit-pinned.

Performance note: unfiltering Sub/Average/Paeth is sequential along x by
definition (each byte needs its already-reconstructed left neighbor), so
those rows run a Python loop. At corpus scale the parallelism is across
ASSETS (mapInPandas partitions), not within one image — this decoder is the
per-row kernel, and typical thumbnail-sized payloads decode in microseconds
to milliseconds. Filters None/Up are numpy-vectorized per scanline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Decompression-bomb guard (Pillow-style): reject images whose declared
# dimensions exceed this pixel count BEFORE inflating any IDAT data. A
# crafted PNG compresses ~1000:1, so without a cap a ~60 MB payload can
# inflate to ~64 GB and OOM the executor; a huge Paeth-filtered image also
# pins a core in the sequential per-byte unfilter loop. 4 MP (2048x2048)
# comfortably covers the thumbnail-scale scope documented above while
# bounding worst-case unfilter work to a few seconds per row.
DEFAULT_MAX_PIXELS = 4_194_304


def decode_png(
    data: "bytes | bytearray | memoryview", max_pixels: int = DEFAULT_MAX_PIXELS
) -> np.ndarray:
    """Decode a PNG byte string to a uint8 pixel array: (H, W) for
    grayscale, (H, W, C) for gray+alpha / RGB / RGBA. Raises ValueError on
    anything outside the supported subset or on corrupt bytes (bad
    signature, chunk CRC mismatch, truncation, size mismatch).

    ``max_pixels`` caps declared width*height (checked right after IHDR
    parse, before any inflation) and the IDAT stream is inflated with a
    hard output limit, so adversarial bytes cannot expand past the declared
    raster size — bad bytes are data, not a job crash OR a resource bomb."""
    if data is None:
        raise ValueError("png: empty payload")
    data = bytes(data)
    if data[:8] != _SIG:
        raise ValueError("png: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        end = pos + 8 + ln
        chunk = data[pos + 8 : end]
        if len(chunk) < ln or end + 4 > len(data):
            raise ValueError("png: truncated chunk")
        (crc,) = struct.unpack(">I", data[end : end + 4])
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {typ!r}")
        pos = end + 4
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR or IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise ValueError(f"png: unsupported bit depth {depth} (8 only)")
    if ctype not in _CHANNELS:
        raise ValueError(f"png: unsupported color type {ctype} (no palette)")
    if interlace != 0:
        raise ValueError("png: Adam7 interlace unsupported")
    if w == 0 or h == 0:
        raise ValueError("png: zero dimension")
    if w * h > max_pixels:
        raise ValueError(
            f"png: declared {w}x{h} exceeds max_pixels={max_pixels} "
            "(decompression-bomb guard)"
        )
    ch = _CHANNELS[ctype]
    stride = w * ch
    expected = h * (stride + 1)
    # Inflate with a hard output cap: never materialize more than one byte
    # past the declared raster, no matter what the compressed stream claims.
    decomp = zlib.decompressobj()
    raw = bytearray()
    tail = b"".join(idat)
    try:
        raw += decomp.decompress(tail, expected + 1)
        while decomp.unconsumed_tail and len(raw) <= expected:
            piece = decomp.decompress(decomp.unconsumed_tail, expected + 1 - len(raw))
            if not piece:
                break
            raw += piece
    except zlib.error as e:
        raise ValueError(f"png: corrupt IDAT stream ({e})") from e
    raw = bytes(raw)
    if len(raw) != expected:
        raise ValueError("png: decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential along x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"png: bad filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 pixel array — (H, W) gray, (H, W, 3) RGB or
    (H, W, 4) RGBA — as a minimal valid PNG (filter 0 scanlines, single
    IDAT). The synthesis half of the codec: tests and sinks produce real
    container bytes without any external library."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        ctype = 0
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        ctype = 2
    elif a.ndim == 3 and a.shape[2] == 4:
        ctype = 6
    else:
        raise ValueError(f"png: unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def luminance(arr: np.ndarray) -> np.ndarray:
    """2D float64 luminance from a decode_png result: identity for
    grayscale, Rec.601 weights for RGB/RGBA (alpha ignored), the gray
    channel for gray+alpha."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] == 2:  # gray + alpha
        return a[:, :, 0]
    return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]


def synthetic_group_image(g: int) -> bytes:
    """The frozen group→PNG construction shared by synthetic_image_udf and
    the multimodal soaks (one definition so the soak can never drift from
    the gate's pattern): 8x8 RandomState(g*7919 + 17) random grid upscaled
    4x, stdlib-PNG-encoded. See synthetic_image_udf for why random grids
    (structured grids measured pHash-colliding at hamming 0)."""
    rs = np.random.RandomState(g * 7919 + 17)
    grid = rs.randint(0, 256, size=(8, 8), dtype=np.uint8)
    return encode_png(np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1))


def synthetic_image_udf():
    """pandas UDF factory: doc_id -> real PNG container bytes, a
    deterministic 32x32 grayscale image whose pattern depends only on
    group = doc_id % 25 — every document in a group carries a bit-identical
    image, so pHashes (multimodal.phash_features, the stdlib decode path)
    match exactly within a group and the image-near-dup gate's oracle is
    the closed-form same-group pair set. The pattern is an 8x8
    seeded-random grid (np.random.RandomState(g*7919 + 17) — the frozen
    legacy generator, bit-stable across numpy versions) upscaled 4x:
    structured arithmetic grids (the AVI clip pattern) land too CLOSE in
    pHash space — the DCT hash is brightness-invariant, and measured
    cross-group collisions reached hamming 0 — while random grids measure
    min cross-group hamming 22 over groups 0..24 (hash_size=8,
    dct_size=32), so max_hamming=2 separates same-group pairs (hamming 0)
    from cross-group noise deterministically. The video sibling is
    avi.synthetic_clip_udf, the audio one wav.synthetic_clip_udf."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def png_image(doc_ids: pd.Series) -> pd.Series:
        cache: dict[int, bytes] = {}
        out = []
        for d in doc_ids:
            g = int(d) % 25
            if g not in cache:
                cache[g] = synthetic_group_image(g)
            out.append(cache[g])
        return pd.Series(out)

    return png_image
