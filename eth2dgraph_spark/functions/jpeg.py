"""Pure-stdlib baseline JPEG codec (struct + numpy — no Pillow, no scipy).

JPEG is the dominant image container in any real multimodal corpus; the
engine's no-pip fallback chain (functions/png.py, wav.py, avi.py) covered
PNG/WAV/AVI but not it. This module closes that gap with a REAL baseline
sequential DCT decoder (ITU-T T.81 / ISO 10918-1, the public spec):

- decode_jpeg: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI marker parse,
  canonical Huffman decode of the entropy-coded scan (byte unstuffing,
  restart-interval handling), dequantize, inverse zigzag, 8x8 inverse DCT
  (the same orthonormal basis-matrix construction pHash uses —
  pipeline/multimodal.py _dct_matrix: the JPEG T.81 A.3.3 DCT with its
  1/4·C(u)C(v) scaling IS the orthonormal 2D DCT-II, so one matmul pair
  inverts it exactly), chroma upsampling, BT.601 YCbCr→RGB. Grayscale
  (1 component) and YCbCr (3 components) at integer-divisible sampling
  factors — 4:4:4, 4:2:2, 4:2:0 all decode. Everything else (progressive
  SOF2, arithmetic coding, 12-bit precision, CMYK, fractional sampling)
  raises ValueError, which the multimodal kernels record as an 'error'
  ROW, never a task crash (bad bytes are data at corpus scale).

- encode_jpeg: a minimal valid baseline encoder for synthesis and tests —
  grayscale or RGB 4:4:4, IJG quality scaling of the Annex K example
  quantization tables (quality=100 ⇒ all-ones tables, which makes images
  built from CONSTANT 8x8 blocks roundtrip BYTE-EXACT: a constant block's
  DCT is a lone integer DC coefficient, so quantize/dequantize is the
  identity — the property the jpeg_luma oracle replays in closed form).
  The emitted Huffman tables are deliberately FLAT canonical tables (all
  12 DC symbols at 4 bits, all 162 AC symbols at 8 bits): valid per the
  spec, trivially typo-proof, and the decoder is exercised on real
  variable-length tables by the CPython-test-suite golden file instead
  (tests/data/python.jpg — 4:2:0, four custom DHT segments).

Determinism: both directions are pure functions of the input bytes/array.
No reference parallel — the reference (eth2dgraph, Rust) has no image
layer; this module serves SURVEY.md's multimodal training-data mandate.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

# ----------------------------------------------------------- shared tables


def _zigzag_order() -> np.ndarray:
    """Natural (row-major) index of each zigzag position, generated rather
    than transcribed (a typo'd literal table would be invisible to
    encode/decode roundtrips — both sides would invert it consistently)."""
    out = []
    for s in range(15):  # anti-diagonals of the 8x8 block
        rows = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:  # even diagonals walk bottom-left -> top-right
            rows = reversed(list(rows))
        for r in rows:
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()  # zigzag position -> natural index


def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis matrix (== T.81 A.3.3 scaling)."""
    x = np.arange(8, dtype=np.float64)
    m = np.sqrt(2.0 / 8) * np.cos(np.pi * (2 * x[None, :] + 1) * x[:, None] / 16)
    m[0, :] = np.sqrt(1.0 / 8)
    return m


_DCT8 = _dct8()

# Annex K.1 example quantization tables (natural order), the public IJG
# baseline everyone scales by quality.
_QT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100, 50 = the Annex K table verbatim,
    100 = all ones (lossless for constant blocks)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"jpeg: quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ------------------------------------------------------------------ decode


class _Bits:
    """MSB-first bit reader over an unstuffed entropy chunk. The whole
    chunk becomes one Python int once; take()/peek8() are shift/mask
    arithmetic (no per-byte state machine in the hot loop)."""

    __slots__ = ("v", "n", "pos")

    def __init__(self, data: bytes):
        self.v = int.from_bytes(data, "big")
        self.n = len(data) * 8
        self.pos = 0

    def take(self, k: int) -> int:
        p = self.pos + k
        if p > self.n:
            raise ValueError("jpeg: truncated entropy-coded data")
        self.pos = p
        return (self.v >> (self.n - p)) & ((1 << k) - 1)

    def peek8(self) -> int:
        """Next 8 bits without consuming, zero-padded past the end (the
        fast-path consumer re-checks the real length via take())."""
        p = self.pos + 8
        if p <= self.n:
            return (self.v >> (self.n - p)) & 0xFF
        rem = self.n - self.pos  # < 8: the tail bits are v's lowest rem bits
        if rem <= 0:
            return 0
        return (self.v & ((1 << rem) - 1)) << (8 - rem)


def _build_huff(bits16: bytes, values: bytes) -> tuple:
    """Canonical Huffman decode tables: (fast, slow) where `fast` maps the
    next 8 BITS to (symbol, code_length) for every code of <= 8 bits —
    one dict probe per symbol instead of a bit-by-bit walk (the measured
    5x decode win on the near-dup gate: 6 ms -> ~1 ms per 32x32 image) —
    and `slow` maps (code_length, code) for the 9..16-bit tail."""
    fast = {}
    slow = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits16[length - 1]):
            if k >= len(values):
                raise ValueError("jpeg: DHT values shorter than BITS counts")
            if length <= 8:
                # every 8-bit word starting with this code hits the entry
                base = code << (8 - length)
                for fill in range(1 << (8 - length)):
                    fast[base | fill] = (values[k], length)
            else:
                slow[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
        if code > (1 << length + 1):
            raise ValueError("jpeg: DHT BITS counts overflow the code space")
    return fast, slow


def _huff_decode(br: _Bits, table: tuple) -> int:
    fast, slow = table
    hit = fast.get(br.peek8())
    if hit is not None:
        sym, length = hit
        br.take(length)  # bounds-checked consume (peek zero-pads past end)
        return sym
    code = br.take(8) if br.pos + 8 <= br.n else None
    if code is None:
        # fewer than 8 bits left and no fast hit: walk what remains
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.take(1)
            sym = slow.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code in entropy data")
    for length in range(9, 17):
        code = (code << 1) | br.take(1)
        sym = slow.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code in entropy data")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received magnitude bits to the
    signed coefficient value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _entropy_chunks(data: bytes, pos: int) -> "tuple[list[bytes], int]":
    """Split the scan's entropy-coded bytes into restart-interval chunks:
    unstuff FF00→FF, split at RST0-7, stop at any other marker. Returns
    (chunks, position of the terminating marker's FF)."""
    chunks: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("jpeg: scan data ends in a dangling FF")
        m = data[i + 1]
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker: interval boundary
            chunks.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker terminates the scan
            chunks.append(bytes(cur))
            return chunks, i
    raise ValueError("jpeg: scan data ran past end of file (no EOI)")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential JPEG bytes to a uint8 pixel array —
    2D (H, W) for grayscale, 3D (H, W, 3) RGB for YCbCr color. Raises
    ValueError on anything that is not a well-formed baseline JPEG this
    decoder supports (the multimodal kernels turn that into an 'error'
    row)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("jpeg: missing SOI marker")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) from SOF0
    i = 2
    planes = None
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {i}")
        m = data[i + 1] if i + 1 < len(data) else None
        if m is None:
            raise ValueError("jpeg: dangling FF at end of file")
        if m == 0xD9:  # EOI
            break
        if m == 0xFF:  # fill byte
            i += 1
            continue
        if i + 4 > len(data):
            raise ValueError("jpeg: truncated marker segment header")
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("jpeg: truncated marker segment body")
        if m == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    if p + 64 > len(seg):
                        raise ValueError("jpeg: truncated DQT")
                    t = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                elif pq == 1:
                    if p + 128 > len(seg):
                        raise ValueError("jpeg: truncated 16-bit DQT")
                    t = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    raise ValueError(f"jpeg: bad DQT precision {pq}")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = t  # stored zigzag -> natural order
                qt[tq] = nat.reshape(8, 8)
        elif m == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("jpeg: truncated DHT")
                tc, th = seg[p] >> 4, seg[p] & 15
                bits16 = seg[p + 1 : p + 17]
                nv = sum(bits16)
                if p + 17 + nv > len(seg):
                    raise ValueError("jpeg: truncated DHT values")
                values = seg[p + 17 : p + 17 + nv]
                p += 17 + nv
                if tc == 0:
                    huff_dc[th] = _build_huff(bits16, values)
                elif tc == 1:
                    huff_ac[th] = _build_huff(bits16, values)
                else:
                    raise ValueError(f"jpeg: bad DHT class {tc}")
        elif m == 0xC0:  # SOF0 baseline sequential
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(
                ">H", seg[3:5]
            )[0], seg[5]
            if prec != 8:
                raise ValueError(f"jpeg: unsupported precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"jpeg: unsupported component count {nc}")
            if h == 0 or w == 0:
                raise ValueError("jpeg: zero image dimension")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (h, w, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg: unsupported SOF marker 0x{m:02x} (baseline only)")
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS — decode the scan
            if frame is None:
                raise ValueError("jpeg: SOS before SOF0")
            h, w, comps = frame
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("jpeg: multi-scan files not supported (baseline interleaved only)")
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 15)
            for comp in comps:
                if comp["id"] not in sel:
                    raise ValueError("jpeg: SOS component id missing from SOF")
                comp["td"], comp["ta"] = sel[comp["id"]]
            planes = _decode_scan(
                data, i + 2 + seg_len, frame, qt, huff_dc, huff_ac, restart_interval
            )
            planes, i = planes
            continue
        # APPn (E0-EF), COM (FE) and other tableless segments: skipped
        i += 2 + seg_len
    if planes is None or frame is None:
        raise ValueError("jpeg: no image scan found")
    return _assemble(frame, planes)


def _decode_scan(data, pos, frame, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("jpeg: bad sampling factors")
    for c in comps:
        if c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"]:
            raise ValueError("jpeg: non-divisible sampling factors unsupported")
        if c["tq"] not in qt:
            raise ValueError(f"jpeg: missing quant table {c['tq']}")
        if c["td"] not in huff_dc or c["ta"] not in huff_ac:
            raise ValueError("jpeg: missing Huffman table referenced by SOS")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    total_mcus = mcux * mcuy
    chunks, end = _entropy_chunks(data, pos)
    want = -(-total_mcus // restart_interval) if restart_interval else 1
    if len(chunks) != want:
        raise ValueError(
            f"jpeg: expected {want} restart interval(s), found {len(chunks)}"
        )
    # per-component full plane in MCU-padded geometry
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    idct = _DCT8.T
    mcu = 0
    for chunk in chunks:
        br = _Bits(chunk)
        pred = [0] * len(comps)  # DC predictors reset at every restart
        in_this = (
            min(restart_interval, total_mcus - mcu) if restart_interval else total_mcus
        )
        for _ in range(in_this):
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(comps):
                dct = huff_dc[c["td"]]
                act = huff_ac[c["ta"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        s = _huff_decode(br, dct)
                        if s > 11:
                            raise ValueError("jpeg: DC category > 11")
                        pred[ci] += _extend(br.take(s), s)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC run past block end")
                            coef[ZIGZAG[k]] = _extend(br.take(sz), sz)
                            k += 1
                        block = idct @ ((coef.reshape(8, 8) * q)) @ _DCT8 + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
    return (planes, end)


def _assemble(frame, planes) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for c, plane in zip(comps, planes):
        # crop to the component's true geometry, then replicate up to full
        ch = -(-h * c["v"] // vmax)
        cw = -(-w * c["h"] // hmax)
        p = plane[:ch, :cw]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encode


class _BitWriter:
    """MSB-first bit writer with FF byte stuffing; flush pads with 1s
    (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


# Flat canonical Huffman tables (see module docstring): every DC symbol at
# 4 bits, every AC symbol at 8 bits. Valid, typo-proof, suboptimal.
_ENC_DC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
_ENC_DC_VALUES = bytes(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = bytes([0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8)
_ENC_AC_VALUES = bytes(_AC_SYMBOLS)


def _enc_codes(bits16: bytes, values: bytes) -> dict:
    """symbol -> (code, length) for the encoder (canonical assignment)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits16[length - 1]):
            table[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


_DC_CODES = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALUES)
_AC_CODES = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALUES)


def _put_coef(bw: _BitWriter, codes: dict, run_size: int, v: int) -> None:
    code, length = codes[run_size]
    bw.put(code, length)
    s = run_size & 15
    if s:
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int) -> int:
    """FDCT + quantize + Huffman-encode one 8x8 sample block; returns the
    new DC predictor."""
    coef = _DCT8 @ (block - 128.0) @ _DCT8.T
    qc = np.round(coef / q).astype(np.int64)
    zz = qc.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = int(abs(diff)).bit_length()
    if s > 11:
        raise ValueError("jpeg: DC difference out of baseline range")
    _put_coef(bw, _DC_CODES, s, diff)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            _put_coef(bw, _AC_CODES, 0xF0, 0)  # ZRL
            run -= 16
        s = int(abs(v)).bit_length()
        if s > 10:
            raise ValueError("jpeg: AC coefficient out of baseline range")
        _put_coef(bw, _AC_CODES, (run << 4) | s, v)
        run = 0
    if run:
        _put_coef(bw, _AC_CODES, 0x00, 0)  # EOB
    return dc


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def encode_jpeg(arr: np.ndarray, quality: int = 75) -> bytes:
    """Encode a uint8 array — 2D grayscale or (H, W, 3) RGB — as baseline
    JFIF bytes. 4:4:4 (no chroma subsampling); quality 1..100 via IJG
    scaling of the Annex K tables (100 ⇒ all-ones ⇒ constant 8x8 blocks
    roundtrip exactly)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("jpeg: encoder expects uint8 pixels")
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[..., k].astype(np.float64) for k in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    else:
        raise ValueError(f"jpeg: unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"jpeg: unencodable dimensions {h}x{w}")
    nqt = 1 if len(planes) == 1 else 2
    qts = [_scaled_qt(_QT_LUMA, quality)]
    if nqt == 2:
        qts.append(_scaled_qt(_QT_CHROMA, quality))
    qnat = [np.zeros(64, dtype=np.int64) for _ in range(nqt)]
    for t, qn in zip(qts, qnat):
        qn[:] = t  # already natural order
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qn in enumerate(qnat):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in qn[ZIGZAG])  # natural -> zigzag storage
    # SOF0: all components 1x1 sampling (4:4:4)
    nc = len(planes)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    # DHT: one flat DC + one flat AC table, shared by every component
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(_ENC_DC_VALUES))
    out += bytes([0x00]) + _ENC_DC_BITS + _ENC_DC_VALUES
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(_ENC_AC_VALUES))
    out += bytes([0x10]) + _ENC_AC_BITS + _ENC_AC_VALUES
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for c in range(nc):
        out += bytes([c + 1, 0x00])
    out += bytes([0, 63, 0])
    bw = _BitWriter()
    padded = [_pad8(p) for p in planes]
    ph, pw = padded[0].shape
    preds = [0] * nc
    qsel = [qts[0]] + [qts[-1]] * (nc - 1)
    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            for ci in range(nc):
                preds[ci] = _encode_block(
                    bw,
                    padded[ci][y0 : y0 + 8, x0 : x0 + 8],
                    qsel[ci].reshape(8, 8),
                    preds[ci],
                )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)

# -------------------------------------------------------------- synthesis


def synthetic_luma_jpeg_udf():
    """pandas UDF factory: doc_id -> 16-element float64 array, the 4x4
    block-mean luma grid of a deterministic 32x32 grayscale image computed
    through a REAL container-bytes encode->decode roundtrip (encode_jpeg
    quality=100 -> decode_jpeg) per row. The image is a 4x4 grid of
    CONSTANT 8x8 blocks, block k = (doc_id*31 + k*17) % 256 — a constant
    block's DCT is a lone integer DC coefficient, so the all-ones
    quality-100 tables make quantize/dequantize the identity and bin k
    equals the block value EXACTLY in float64 (the 8x8 block mean of 64
    identical uint8 is exact) — a closed form a SQL oracle can replay
    with no rounding tolerance. This is the jpeg_luma driver gate's
    kernel; it lives here so the pandas type hints resolve against this
    module's globals (the entry module uses `from __future__ import
    annotations`)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<double>")
    def jpeg_luma(doc_ids: pd.Series) -> pd.Series:
        out = []
        for d in doc_ids:
            blocks = ((int(d) * 31 + np.arange(16) * 17) % 256).astype(np.uint8)
            img = np.repeat(np.repeat(blocks.reshape(4, 4), 8, axis=0), 8, axis=1)
            dec = decode_jpeg(encode_jpeg(img, quality=100))
            # 4x4 block means, each the mean of 64 identical values
            pooled = dec.reshape(4, 8, 4, 8).astype(np.float64).mean(axis=(1, 3))
            out.append(pooled.reshape(-1))
        return pd.Series(out)

    return jpeg_luma


def synthetic_group_jpeg(g: int) -> bytes:
    """The frozen group→JPEG construction for the image-near-dup JPEG arm
    (one definition shared by the gate UDF and any soak): an 8x8
    RandomState(g*6151 + 29) random grid upscaled 4x to 32x32, encoded
    baseline-JPEG at quality=100 — every document in a group carries
    bit-identical JPEG bytes, so stdlib-decoded pHashes match exactly
    within a group (hamming 0) while cross-group hamming stays far above
    the gate threshold (measured over groups 0..24 — see the gate
    docstring for the frozen margin)."""
    rs = np.random.RandomState(g * 6151 + 29)
    grid = rs.randint(0, 256, size=(8, 8), dtype=np.uint8)
    img = np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1)
    return encode_jpeg(img, quality=100)


def synthetic_jpeg_udf():
    """pandas UDF factory: doc_id -> real baseline-JPEG container bytes,
    deterministic per group = doc_id % 25 (bit-identical within a group).
    The JPEG sibling of png.synthetic_image_udf — same seeded-random-grid
    family (structured grids measured pHash-colliding at hamming 0), a
    different seed multiplier so the two modality arms never share
    patterns."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def jpeg_image(doc_ids: pd.Series) -> pd.Series:
        cache: dict[int, bytes] = {}
        out = []
        for d in doc_ids:
            g = int(d) % 25
            if g not in cache:
                cache[g] = synthetic_group_jpeg(g)
            out.append(cache[g])
        return pd.Series(out)

    return jpeg_image
