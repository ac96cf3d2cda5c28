"""Pure-stdlib FLAC codec — the compressed-audio path for the multimodal
seam in environments where soundfile/PyAV cannot be installed (this
container: pip is network-blocked, attempts documented in BASELINE.md).
The audio sibling of functions/jpeg.py, built to the same discipline:
synthesize real container bytes, decode them with zero external
dependencies, reject everything outside the supported subset with
ValueError so decode_features degrades the row to 'error', and bound
resources on untrusted input.

Why FLAC (round-13 VERDICT item 4): real audio corpora are compressed,
and FLAC is the lossless one — exact-value oracles survive a REAL
compression roundtrip (the gif_luma property transfers: a 16-bit sample
reconstructs bit-exactly through fixed/LPC prediction + Rice residuals),
where an MP3 path would force tolerance-based gates.

Bitstream per the public spec (RFC 9639 / xiph.org format docs):

- decode_flac: fLaC magic, STREAMINFO (+ skipped other metadata blocks),
  frame headers (sync, blocking strategy, coded frame number, CRC-8),
  subframes CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) with wasted
  bits, inter-channel decorrelation (left/side, right/side, mid/side),
  Rice and Rice2 residual partitions including raw-bits escapes, frame
  CRC-16, and the STREAMINFO MD5 of the unencoded samples — verified,
  so ANY reconstruction bug (not just bitstream corruption) raises.
- encode_flac: 16/8-bit, 1..8 channels, fixed-blocking frames (u16
  explicit block size), per-channel subframe choice CONSTANT / best
  FIXED order 0..4 by exact Rice cost / VERBATIM fallback, single-
  partition Rice residuals, per-frame STEREO DECORRELATION (exact-bit
  argmin over independent / left-side / right-side / mid-side), real
  CRC-8/16 and MD5.

Correctness pinning: FLAC's losslessness makes the encoder->decoder
roundtrip self-healing against SYMMETRIC prediction bugs (residual =
x - pred_wrong reconstructs x for any consistent pred), so roundtrips
alone prove losslessness, not spec conformance. Spec conformance is
pinned by hand-built bitstreams in tests/test_flac.py (bit layouts
written out from the spec, covering LPC, all stereo decorrelations,
wasted bits, and Rice escapes) — no FLAC asset ships with CPython's
test suite (checked; its audio fixtures are WAV/AIFF/AU), documented in
BASELINE.md as the one golden-source gap vs the JPEG/GIF codecs.

Reference parity note: the reference engine (davideaimar/eth2dgraph)
has no audio surface; this module serves the brief's multimodal-column
requirement (binary payload -> typed feature) on real compressed bytes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

# Same resource-guard role as wav.DEFAULT_MAX_SAMPLES: caps total samples
# BEFORE decoding frames (FLAC is compressed, so declared totals can
# massively inflate — the PNG bomb argument applies).
DEFAULT_MAX_SAMPLES = 67_108_864

_BITS_OK = (8, 16)
_BLOCK = 4096  # encoder block size (frames are independent at this stride)

# ------------------------------------------------------------------- CRCs

_CRC8_TABLE = []
for _b in range(256):
    _r = _b
    for _ in range(8):
        _r = ((_r << 1) ^ 0x07) & 0xFF if _r & 0x80 else (_r << 1) & 0xFF
    _CRC8_TABLE.append(_r)

_CRC16_TABLE = []
for _b in range(256):
    _r = _b << 8
    for _ in range(8):
        _r = ((_r << 1) ^ 0x8005) & 0xFFFF if _r & 0x8000 else (_r << 1) & 0xFFFF
    _CRC16_TABLE.append(_r)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16_TABLE[(r >> 8) ^ b] ^ ((r << 8) & 0xFFFF)
    return r


# ------------------------------------------------------------------- bits


class _BitWriter:
    """MSB-first bit packer (FLAC bit order)."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("flac: unaligned bit buffer")
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over immutable bytes."""

    __slots__ = ("data", "pos", "end")

    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.data = data
        self.pos = pos_bits
        self.end = len(data) * 8

    def read(self, n: int) -> int:
        p = self.pos
        e = p + n
        if e > self.end:
            raise ValueError("flac: truncated bitstream")
        self.pos = e
        b = self.data[p >> 3 : (e + 7) >> 3]
        v = int.from_bytes(b, "big")
        return (v >> ((len(b) << 3) - (e - (p & ~7)))) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        data, pos, end = self.data, self.pos, self.end
        while True:
            if pos >= end:
                raise ValueError("flac: truncated unary code")
            o = pos & 7
            cur = data[pos >> 3] & (0xFF >> o)
            if cur == 0:
                q += 8 - o
                pos += 8 - o
                continue
            z = (8 - o) - cur.bit_length()
            self.pos = pos + z + 1
            return q + z


# ------------------------------------------------------------ coded number


def _utf8ish_encode(v: int) -> bytes:
    """FLAC's UTF-8-style coded number (extended to 36 bits)."""
    if v < 0x80:
        return bytes([v])
    # bits capacity: 1 byte 7; 2 bytes 11; 3 bytes 16; 4 bytes 21;
    # 5 bytes 26; 6 bytes 31; 7 bytes 36
    caps = [(11, 0xC0, 1), (16, 0xE0, 2), (21, 0xF0, 3), (26, 0xF8, 4), (31, 0xFC, 5), (36, 0xFE, 6)]
    for bits, lead, n_follow in caps:
        if v < (1 << bits):
            out = bytearray(n_follow + 1)
            for k in range(n_follow, 0, -1):
                out[k] = 0x80 | (v & 0x3F)
                v >>= 6
            out[0] = lead | v
            return bytes(out)
    raise ValueError(f"flac: coded number {v} exceeds 36 bits")


def _utf8ish_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    for lead, nf in ((0xFE, 6), (0xFC, 5), (0xF8, 4), (0xF0, 3), (0xE0, 2), (0xC0, 1)):
        if (b0 & ~((1 << (7 - nf)) - 1) if nf < 6 else b0) == lead and (
            nf == 6 or (b0 & (1 << (6 - nf))) == 0
        ):
            n_follow = nf
            break
    else:
        raise ValueError(f"flac: bad coded-number lead byte 0x{b0:02x}")
    v = b0 & ((1 << (6 - n_follow)) - 1) if n_follow < 6 else 0
    for _ in range(n_follow):
        bn = br.read(8)
        if bn & 0xC0 != 0x80:
            raise ValueError(f"flac: bad coded-number continuation 0x{bn:02x}")
        v = (v << 6) | (bn & 0x3F)
    return v


# --------------------------------------------------------- fixed predictors

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _undiff(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Reconstruct x from its order-th finite difference: Δ^order x = res
    for positions >= order, seeded by the warmup samples. Vectorized: one
    cumsum per order level (the inverse of np.diff applied order times)."""
    heads = []
    t = warm.astype(np.int64)
    for _ in range(order):
        heads.append(int(t[0]))
        t = np.diff(t)
    seq = res.astype(np.int64)
    for j in range(order - 1, -1, -1):
        seq = heads[j] + np.concatenate(([0], np.cumsum(seq)))
    return seq


# ------------------------------------------------------------------ decode


def _read_residual(br: _BitReader, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    if n >> po << po != n:
        raise ValueError(f"flac: partition order {po} does not divide block size {n}")
    out = np.empty(n - order, dtype=np.int64)
    w = 0
    for p in range(1 << po):
        cnt = (n >> po) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        k = br.read(plen)
        if k == escape:
            raw = br.read(5)
            if raw == 0:
                out[w : w + cnt] = 0
            else:
                for i in range(cnt):
                    out[w + i] = br.read_signed(raw)
            w += cnt
            continue
        read_unary, read = br.read_unary, br.read
        if k:
            for i in range(cnt):
                u = (read_unary() << k) | read(k)
                out[w + i] = (u >> 1) ^ -(u & 1)
        else:
            for i in range(cnt):
                u = read_unary()
                out[w + i] = (u >> 1) ^ -(u & 1)
        w += cnt
    return out


def _read_subframe(br: _BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count-1 follows
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError(f"flac: wasted bits {wasted} >= bps {bps}")
    if stype == 0:  # CONSTANT
        out = np.full(n, br.read_signed(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter(
            (br.read_signed(eff) for _ in range(n)), dtype=np.int64, count=n
        )
    elif 8 <= stype <= 12:  # FIXED order 0..4
        order = stype - 8
        if order > n:
            raise ValueError(f"flac: fixed order {order} > block size {n}")
        warm = np.fromiter(
            (br.read_signed(eff) for _ in range(order)), dtype=np.int64, count=order
        )
        res = _read_residual(br, n, order)
        out = _undiff(warm, res, order) if order else res
    elif stype >= 32:  # LPC order 1..32
        order = stype - 31
        if order > n:
            raise ValueError(f"flac: lpc order {order} > block size {n}")
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("flac: invalid lpc precision escape")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError(f"flac: negative lpc shift {shift}")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, n, order)
        out_l = warm + [0] * (n - order)
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += coeffs[j] * out_l[i - 1 - j]
            out_l[i] = int(res[i - order]) + (acc >> shift)
        out = np.asarray(out_l, dtype=np.int64)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return out << wasted if wasted else out


_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(
    data: "bytes | bytearray | memoryview", max_samples: int = DEFAULT_MAX_SAMPLES
) -> "tuple[np.ndarray, int]":
    """Decode FLAC bytes to (samples, sample_rate): samples is float32 of
    shape (n_frames, n_channels) normalized to [-1, 1] (bps-bit signed
    ints / 2^(bps-1) — the libsndfile convention, matching decode_wav so
    fingerprints transfer across containers). Verifies frame CRC-8/16 and
    the STREAMINFO MD5 (when present), so corruption anywhere — header,
    residual bits, or a reconstruction bug — raises ValueError."""
    if data is None:
        raise ValueError("flac: empty payload")
    data = bytes(data)
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC signature")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        hdr = data[pos]
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("flac: truncated metadata block")
        btype = hdr & 0x7F
        if btype == 127:
            raise ValueError("flac: invalid metadata block type 127")
        if btype == 0:
            if streaminfo is not None:
                raise ValueError("flac: duplicate STREAMINFO")
            streaminfo = body
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("flac: missing or malformed STREAMINFO")
    min_bs, max_bs = struct.unpack_from(">HH", streaminfo, 0)
    si = int.from_bytes(streaminfo[10:18], "big")
    rate = si >> 44
    channels = ((si >> 41) & 0x7) + 1
    bps = ((si >> 36) & 0x1F) + 1
    total = si & ((1 << 36) - 1)
    md5 = streaminfo[18:34]
    if rate == 0:
        raise ValueError("flac: zero sample rate")
    if min_bs < 16 and min_bs != 0:
        raise ValueError(f"flac: min block size {min_bs} < 16")
    if bps not in _BITS_OK:
        raise ValueError(f"flac: unsupported bit depth {bps} (8/16 only)")
    if total * channels > max_samples:
        raise ValueError(
            f"flac: {total * channels} samples exceeds max_samples={max_samples}"
        )

    out: list[np.ndarray] = []
    got = 0
    while pos < len(data):
        frame_start = pos
        if pos + 2 > len(data):
            raise ValueError("flac: truncated frame header")
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("flac: bad frame sync")
        variable = data[pos + 1] & 1
        br = _BitReader(data, (pos + 2) * 8)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: frame header reserved bit set")
        _num = _utf8ish_decode(br)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code 0")
        elif bs_code == 1:
            n = 192
        elif bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 0:
            frate = rate
        elif sr_code <= 11:
            frate = (88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000)[sr_code - 1]
        elif sr_code == 12:
            frate = br.read(8) * 1000
        elif sr_code == 13:
            frate = br.read(16)
        elif sr_code == 14:
            frate = br.read(16) * 10
        else:
            raise ValueError("flac: invalid sample rate code 15")
        if frate != rate:
            raise ValueError(f"flac: frame rate {frate} != STREAMINFO rate {rate}")
        if bps_code == 0:
            fbps = bps
        else:
            fbps = _BPS_CODES.get(bps_code)
            if fbps is None:
                raise ValueError(f"flac: reserved sample size code {bps_code}")
        if fbps != bps:
            raise ValueError(f"flac: frame bps {fbps} != STREAMINFO bps {bps}")
        if ch_code < 8:
            fch = ch_code + 1
            decorr = None
        elif ch_code <= 10:
            fch = 2
            decorr = ("left_side", "right_side", "mid_side")[ch_code - 8]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        if fch != channels:
            raise ValueError(
                f"flac: frame channels {fch} != STREAMINFO channels {channels}"
            )
        hdr_end_bits = br.pos
        if hdr_end_bits & 7:
            raise ValueError("flac: frame header not byte-aligned before CRC-8")
        hdr_bytes = data[frame_start : hdr_end_bits >> 3]
        crc8 = br.read(8)
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")
        if got + n > total:
            raise ValueError("flac: more samples than STREAMINFO total")

        chans = []
        for c in range(fch):
            cbps = bps
            if decorr == "left_side" and c == 1:
                cbps += 1
            elif decorr == "right_side" and c == 0:
                cbps += 1
            elif decorr == "mid_side" and c == 1:
                cbps += 1
            chans.append(_read_subframe(br, n, cbps))
        # byte-align, then frame CRC-16
        if br.pos & 7:
            if br.read(8 - (br.pos & 7)) != 0:
                raise ValueError("flac: nonzero frame padding bits")
        crc_end = br.pos >> 3
        crc16 = br.read(16)
        if _crc16(data[frame_start:crc_end]) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.pos >> 3

        if decorr == "left_side":
            left = chans[0]
            right = left - chans[1]
            frame = np.stack([left, right], axis=1)
        elif decorr == "right_side":
            right = chans[1]
            left = chans[1] + chans[0]
            frame = np.stack([left, right], axis=1)
        elif decorr == "mid_side":
            side = chans[1]
            mid = (chans[0] << 1) | (side & 1)
            frame = np.stack([(mid + side) >> 1, (mid - side) >> 1], axis=1)
        else:
            frame = np.stack(chans, axis=1)
        lim = 1 << (bps - 1)
        if frame.min() < -lim or frame.max() >= lim:
            raise ValueError("flac: decoded sample outside bit depth range")
        out.append(frame)
        got += n
        del variable, _num

    if got != total:
        raise ValueError(f"flac: decoded {got} samples, STREAMINFO says {total}")
    samples = (
        np.concatenate(out, axis=0) if out else np.empty((0, channels), np.int64)
    )
    if md5 != b"\x00" * 16:
        width = bps // 8
        dt = "<i1" if bps == 8 else "<i2"
        if hashlib.md5(samples.astype(dt).tobytes()).digest() != md5:
            raise ValueError("flac: MD5 mismatch (decoded audio != encoded audio)")
        del width
    return samples.astype(np.float32) / float(1 << (bps - 1)), rate


# ------------------------------------------------------------------ encode


def _best_rice_k(u: np.ndarray) -> "tuple[int, int]":
    best_k, best_cost = 0, None
    for k in range(15):
        cost = int((u >> k).sum()) + len(u) * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        if (u >> k).sum() == 0 and k > 0:
            break
    return best_k, best_cost


def _write_rice(bw: _BitWriter, res: np.ndarray, k: int) -> None:
    u = (res << 1) ^ (res >> 63)  # zigzag fold
    if k:
        for v in u.tolist():
            bw.write(1, (v >> k) + 1)
            bw.write(v & ((1 << k) - 1), k)
    else:
        for v in u.tolist():
            bw.write(1, v + 1)


def _plan_subframe(x: np.ndarray, eff: int):
    """(cost_bits, plan) for one channel signal at `eff` sample bits:
    plan is ('const',) | ('verbatim',) | ('fixed', order, res, k). The
    exact bit cost (8-bit subframe header included) is what the stereo
    decorrelation chooser compares across channel assignments."""
    n = len(x)
    if (x == x[0]).all():
        return 8 + eff, ("const",)
    best = None  # (cost, order, res, k)
    diffs = x
    for order in range(min(4, n - 1) + 1):
        if order:
            diffs = np.diff(diffs)
        res = diffs  # Δ^order x = the residuals at positions order..n-1
        u = (res << 1) ^ (res >> 63)
        if len(u) == 0:
            continue
        if int(u.max()) >= (1 << 40):
            continue  # pathological growth; higher orders only worse
        k, cost = _best_rice_k(u)
        cost += 8 + order * eff + 2 + 4 + 4  # headers + warmup + residual hdr
        if best is None or cost < best[0]:
            best = (cost, order, res.copy(), k)
    verb_cost = 8 + n * eff
    if best is None or best[0] >= verb_cost:
        return verb_cost, ("verbatim",)
    cost, order, res, k = best
    return cost, ("fixed", order, res, k)


def _write_subframe(bw: _BitWriter, x: np.ndarray, eff: int, plan) -> None:
    if plan[0] == "const":
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), eff)
        return
    if plan[0] == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in x.tolist():
            bw.write(int(v), eff)
        return
    _, order, res, k = plan
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED order
    bw.write(0, 1)  # no wasted bits
    for v in x[:order].tolist():
        bw.write(int(v), eff)
    bw.write(0, 2)  # residual method 0 (4-bit Rice)
    bw.write(0, 4)  # partition order 0
    bw.write(k, 4)
    _write_rice(bw, res, k)


def encode_flac(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode samples — (n,) mono or (n, ch) float in [-1, 1] (or already
    int16/int8) — as real FLAC bytes: fixed 4096-sample blocking, per-
    channel CONSTANT / best-FIXED-order(0..4) / VERBATIM subframes with
    single-partition Rice residuals, per-frame stereo decorrelation by
    exact bit cost, frame CRC-8/16, STREAMINFO MD5.
    Float input quantizes exactly like encode_wav's 16-bit path
    (round, clip), so a clip encoded both ways decodes to IDENTICAL
    float32 samples — the cross-container parity the fingerprint gates
    rely on. LOSSLESS: decode_flac(encode_flac(x)) == x bit-exactly."""
    if bits not in _BITS_OK:
        raise ValueError(f"flac: unsupported bit depth {bits} (8/16 only)")
    if not 0 < sample_rate < (1 << 20):
        raise ValueError(f"flac: sample rate {sample_rate} outside 1..2^20-1")
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or not 1 <= a.shape[1] <= 8:
        raise ValueError(f"flac: unsupported sample shape {np.asarray(samples).shape}")
    ch = a.shape[1]
    if bits == 16:
        if a.dtype != np.int16:
            a = np.clip(np.round(a.astype(np.float64) * 32768.0), -32768, 32767).astype(np.int16)
        raw_dt = "<i2"
    else:
        if a.dtype != np.int8:
            a = np.clip(np.round(a.astype(np.float64) * 128.0), -128, 127).astype(np.int8)
        raw_dt = "<i1"
    n_total = a.shape[0]
    if n_total == 0:
        raise ValueError("flac: empty sample array")
    if n_total >= (1 << 36):
        raise ValueError("flac: too many samples for a 36-bit total")
    md5 = hashlib.md5(a.astype(raw_dt).tobytes()).digest()

    # sample rate field in the frame header: explicit u16 Hz (code 13)
    # keeps every 1..65535 Hz test rate exact; 10s-of-Hz (code 14) covers
    # the rest of the 20-bit STREAMINFO range
    if sample_rate < (1 << 16):
        sr_code, sr_field, sr_bits = 13, sample_rate, 16
    elif sample_rate % 10 == 0 and sample_rate // 10 < (1 << 16):
        sr_code, sr_field, sr_bits = 14, sample_rate // 10, 16
    else:
        raise ValueError(f"flac: sample rate {sample_rate} not frame-encodable")

    frames = bytearray()
    x64 = a.astype(np.int64)
    for fi, start in enumerate(range(0, n_total, _BLOCK)):
        blk = x64[start : start + _BLOCK]
        n = blk.shape[0]
        # channel assignment: mono/multichannel -> independent; STEREO ->
        # exact-bit-cost argmin over the four spec assignments (the
        # decorrelation decision real encoders make per frame — side =
        # l - r collapses correlated channels, mid/side anti-correlated
        # ones; ties break toward the smallest code = independent, so
        # decorrelation only engages when it strictly saves bits)
        if ch == 2:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            planned = {
                sig_id: _plan_subframe(sig, eff)
                for sig_id, (sig, eff) in {
                    "l": (left, bits),
                    "r": (right, bits),
                    "s": (side, bits + 1),
                    "m": (mid, bits),
                }.items()
            }
            layouts = {
                1: (("l", left, bits), ("r", right, bits)),
                8: (("l", left, bits), ("s", side, bits + 1)),
                9: (("s", side, bits + 1), ("r", right, bits)),
                10: (("m", mid, bits), ("s", side, bits + 1)),
            }
            ch_code = min(
                layouts,
                key=lambda c: (sum(planned[t[0]][0] for t in layouts[c]), c),
            )
            subframes = [
                (sig, eff, planned[sid][1]) for sid, sig, eff in layouts[ch_code]
            ]
        else:
            ch_code = ch - 1
            subframes = [
                (blk[:, c], bits, _plan_subframe(blk[:, c], bits)[1])
                for c in range(ch)
            ]
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # block size: u16 n-1 at header end
        bw.write(sr_code, 4)
        bw.write(ch_code, 4)
        bw.write(4 if bits == 16 else 1, 3)
        bw.write(0, 1)  # reserved
        for byte in _utf8ish_encode(fi):
            bw.write(byte, 8)
        bw.write(n - 1, 16)
        bw.write(sr_field, sr_bits)
        bw.write(_crc8(bytes(bw.buf)), 8)
        for sig, eff, plan in subframes:
            _write_subframe(bw, sig, eff, plan)
        bw.align()
        body = bw.getvalue()
        frames += body
        frames += struct.pack(">H", _crc16(body))

    si = bytearray()
    # STREAMINFO block sizes have a spec floor of 16 (a final partial
    # frame may be smaller — the fields describe the blocking STRATEGY)
    bs_min = min(_BLOCK, n_total)
    bs_last = n_total - (n_total // _BLOCK) * _BLOCK or _BLOCK
    si += struct.pack(
        ">HH", max(16, min(bs_min, bs_last)), max(16, min(_BLOCK, n_total))
    )
    # frame size bounds unknown -> 0 (permitted by spec)
    si += b"\x00\x00\x00" * 2
    packed = (sample_rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | n_total
    si += packed.to_bytes(8, "big")
    si += md5
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si) + bytes(frames)


# --------------------------------------------------------------- synthesis


def synthetic_envelope_flac_udf():
    """pandas UDF factory: doc_id -> 16-element float64 RMS envelope of a
    deterministic synthesized clip, through a REAL FLAC encode->decode
    roundtrip per row — the wav.synthetic_envelope_udf closed form
    verbatim (FLAC quantizes float input exactly like encode_wav's 16-bit
    path and is LOSSLESS, so each envelope bin equals
    round(k*1638.4)/32768 exactly; the oracle replays it with zero
    tolerance). The flac_envelope driver gate's kernel."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<double>")
    def flac_env(doc_ids: pd.Series) -> pd.Series:
        out = []
        for d in doc_ids:
            k = (int(d) * 31 + np.arange(16)) % 20
            sig = np.repeat(k / 20.0, 10)
            samples, _rate = decode_flac(encode_flac(sig, 8000))
            segs = samples[:, 0].astype(np.float64).reshape(16, 10)
            out.append(np.sqrt((segs * segs).mean(axis=1)))
        return pd.Series(out)

    return flac_env


def synthetic_clip_flac_udf():
    """pandas UDF factory: doc_id -> real FLAC container bytes carrying
    EXACTLY wav.synthetic_clip_udf's clip (same amplitudes, same rate,
    same 16-bit quantization; FLAC is lossless), so the two containers
    decode to bit-identical float32 samples and the WAV gate's measured
    fingerprint-collision property transfers verbatim: per-frame energy
    signatures match exactly within group doc_id % 25 and the near-dup
    oracle is the same closed-form same-group pair set."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def flac_clip(doc_ids: pd.Series) -> pd.Series:
        cache: dict[int, bytes] = {}
        out = []
        for d in doc_ids:
            g = int(d) % 25
            if g not in cache:
                amps = []
                for f in range(3):
                    for b in range(8):
                        v = g * 10 if b == 0 else (f * 80 if b == 1 else (g * 31 + f * 16 + b * 7) % 256)
                        amps.extend([v / 255.0] * 25)
                cache[g] = encode_flac(np.array(amps), 1000)
            out.append(cache[g])
        return pd.Series(out)

    return flac_clip
