"""Pure-stdlib WAV (RIFF/WAVE) PCM codec — the real-container-bytes audio
path for the multimodal seam in environments where soundfile/PyAV cannot be
installed (this container: pip is network-blocked, attempts documented in
BASELINE.md). The audio sibling of functions/png.py, built to the same
discipline: synthesize real container bytes in tests, decode them with zero
external dependencies, reject everything outside the supported subset with
ValueError so decode_features degrades the row to 'error' (bad bytes are
data, not a job crash), and bound resources on untrusted input.

Scope: canonical RIFF/WAVE with a 16-byte PCM fmt chunk — format 1 (integer
PCM), 8-bit unsigned or 16-bit signed little-endian samples, 1..8 channels.
Anything else (float/ADPCM/extensible fmt, 24/32-bit, compressed) raises.
Parsing is STRICT (riff size, byte_rate, block_align, chunk walk must all
be mutually consistent, exactly) — WAV has no CRC, so cross-field
consistency is the only corruption signal available; strictness is what
lets the property tests assert that any single-byte header flip is caught.

Reference parity note: the reference engine (davideaimar/eth2dgraph) has no
audio surface; this module serves the brief's multimodal-column requirement
(binary payload -> typed feature) with a decoder that executes on real
bytes rather than an injected fake.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

# Resource guard, same role as png.DEFAULT_MAX_PIXELS: cap total samples
# (frames x channels) before converting to float32. WAV is uncompressed so
# there is no inflation bomb, but the declared sizes still bound downstream
# O(n) work; 64M samples = 256 MB float32, past any envelope-kernel need.
DEFAULT_MAX_SAMPLES = 67_108_864

_BITS_OK = (8, 16)


def decode_wav(
    data: "bytes | bytearray | memoryview", max_samples: int = DEFAULT_MAX_SAMPLES
) -> "tuple[np.ndarray, int]":
    """Decode WAV bytes to (samples, sample_rate): samples is float32 of
    shape (n_frames, n_channels) normalized to [-1, 1] (16-bit: x/32768;
    8-bit unsigned: (x-128)/128 — libsndfile's conventions). Raises
    ValueError on corrupt or out-of-scope bytes: bad magic, size-field
    inconsistency, truncation, trailing garbage, non-PCM format, bit
    depths outside {8, 16}, zero/overflowing channel counts, or more than
    ``max_samples`` total samples."""
    if data is None:
        raise ValueError("wav: empty payload")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE signature")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size != len(data) - 8:
        raise ValueError(
            f"wav: RIFF size field {riff_size} != actual {len(data) - 8}"
        )
    pos, fmt, pcm = 12, None, None
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("wav: truncated chunk header")
        cid, ln = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError(f"wav: truncated {cid!r} chunk")
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned (even padding)
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
    if pos != len(data):
        raise ValueError("wav: trailing bytes after final chunk")
    if fmt is None or pcm is None:
        raise ValueError("wav: missing fmt or data chunk")
    if len(fmt) != 16:
        raise ValueError(f"wav: fmt chunk size {len(fmt)} (PCM requires 16)")
    audio_fmt, ch, rate, byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt
    )
    if audio_fmt != 1:
        raise ValueError(f"wav: unsupported audio format {audio_fmt} (PCM=1 only)")
    if not 1 <= ch <= 8:
        raise ValueError(f"wav: channel count {ch} outside 1..8")
    if bits not in _BITS_OK:
        raise ValueError(f"wav: unsupported bit depth {bits} (8/16 only)")
    if rate == 0:
        raise ValueError("wav: zero sample rate")
    width = bits // 8
    if block_align != ch * width:
        raise ValueError(
            f"wav: block_align {block_align} != channels*width {ch * width}"
        )
    if byte_rate != rate * block_align:
        raise ValueError(
            f"wav: byte_rate {byte_rate} != rate*block_align {rate * block_align}"
        )
    if len(pcm) % block_align != 0:
        raise ValueError(
            f"wav: data length {len(pcm)} not a multiple of block_align {block_align}"
        )
    n_frames = len(pcm) // block_align
    if n_frames * ch > max_samples:
        raise ValueError(
            f"wav: {n_frames * ch} samples exceeds max_samples={max_samples}"
        )
    if bits == 16:
        raw = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    else:
        raw = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    return raw.reshape(n_frames, ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode samples — (n,) mono or (n, ch) float in [-1, 1] (or already
    int16/uint8) — as canonical RIFF/WAVE PCM bytes. The synthesis half of
    the codec: tests and sinks produce real container bytes with no
    external library (the encode_png discipline)."""
    if bits not in _BITS_OK:
        raise ValueError(f"wav: unsupported bit depth {bits} (8/16 only)")
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or not 1 <= a.shape[1] <= 8:
        raise ValueError(f"wav: unsupported sample shape {np.asarray(samples).shape}")
    ch = a.shape[1]
    if bits == 16:
        if a.dtype != np.int16:
            a = np.clip(np.round(a.astype(np.float64) * 32768.0), -32768, 32767).astype(
                np.int16
            )
        pcm = a.astype("<i2").tobytes()
    else:
        if a.dtype != np.uint8:
            a = np.clip(
                np.round(a.astype(np.float64) * 128.0 + 128.0), 0, 255
            ).astype(np.uint8)
        pcm = a.tobytes()
    width = bits // 8
    block_align = ch * width
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, bits
    )
    pad = b"\x00" if len(pcm) & 1 else b""
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def rms_envelope(samples: np.ndarray, n_bins: int = 16) -> np.ndarray:
    """Mono-mix then n_bins-segment RMS energy envelope (float32) — the
    exact feature math of the soundfile path (_decode_audio_sf), factored
    out so the stdlib WAV path and tests share one definition."""
    a = np.asarray(samples, dtype=np.float32)
    mono = a.mean(axis=1) if a.ndim == 2 else a
    bins = np.array_split(mono, n_bins)
    return np.array(
        [float(np.sqrt(np.mean(b * b))) if len(b) else 0.0 for b in bins],
        dtype=np.float32,
    )


def synthetic_envelope_udf():
    """pandas UDF factory: doc_id -> 16-element float64 RMS envelope of a
    deterministic synthesized clip, computed through a REAL container-bytes
    encode->decode roundtrip (encode_wav -> decode_wav) per row. The clip
    is 16 constant 10-sample segments at amplitude ((doc_id*31 + i) % 20)/20,
    so after 16-bit quantization each envelope bin equals
    round(k*1638.4)/32768 exactly — a closed form a SQL oracle can replay
    (fractional parts are multiples of 0.2: no round-half ties; all math
    float64: segment RMS of a constant is exact). This is the wav_envelope
    driver gate's kernel; it lives here so the pandas type hints resolve
    against this module's globals (the entry module uses
    `from __future__ import annotations`)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<double>")
    def wav_env(doc_ids: pd.Series) -> pd.Series:
        out = []
        for d in doc_ids:
            k = (int(d) * 31 + np.arange(16)) % 20
            sig = np.repeat(k / 20.0, 10)
            samples, _rate = decode_wav(encode_wav(sig, 8000))
            segs = samples[:, 0].astype(np.float64).reshape(16, 10)
            out.append(np.sqrt((segs * segs).mean(axis=1)))
        return pd.Series(out)

    return wav_env


def synthetic_clip_udf():
    """pandas UDF factory: doc_id -> real WAV container bytes, a
    deterministic 3-frame clip (rate 1000 Hz, 200 ms frames, 8 constant
    25-sample segments per frame) whose amplitudes depend only on
    group = doc_id % 25 — every document in a group carries a
    bit-identical clip, so per-frame quantized energy signatures
    (multimodal.audio_fingerprints) match exactly within a group and the
    audio-near-dup gate's oracle is the closed-form same-group pair set.
    Segment 0 pins the group (amplitude g*10/255) and segment 1 the frame
    index (f*80/255), so no two distinct (group, frame) signatures can
    collide AT ALL (the byte is recovered exactly: 16-bit PCM quantization
    error <= 1/65536, and round(rms*255) undoes it). The video sibling is
    avi.synthetic_clip_udf."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def wav_clip(doc_ids: pd.Series) -> pd.Series:
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
                cache[g] = encode_wav(np.array(amps), 1000)
            out.append(cache[g])
        return pd.Series(out)

    return wav_clip


def synthetic_drift_clip_udf():
    """pandas UDF factory: doc_id -> real WAV container bytes, a
    deterministic 2-frame clip (rate 1000 Hz, 200 ms frames, 8 constant
    25-sample segments per frame) for the Hamming-TOLERANT audio matching
    gate: the clip pattern depends on group = doc_id % 25, and documents
    with doc_id % 4 == 0 carry a one-quantization-step DRIFT in segment 2
    (v -> v+1) — the re-encode-drift case exact fingerprint matching
    misses. All base segment bytes are EVEN (and byte 7 < 128, clear of
    the int64 sign), so the +1 drift flips exactly ONE bit (bit 16) of
    the packed 64-bit energy signature, and every quantized byte
    roundtrips the 16-bit PCM codec exactly (round(rms*255) == v, the
    synthetic_clip_udf argument — verified for the odd drift bytes too).
    Byte formula: b=0 -> g*10 (pins group), b=1 -> f*80 (pins frame),
    b=7 -> 2*((g*31 + f*16 + 49) % 64), else 2*((g*31 + f*16 + b*7) % 128).
    Measured over groups 0..24: min cross-group base hamming 4 (so a
    cross pair is >= 3 apart even when exactly one side drifts — the two
    drift bits are BOTH bit 16 and cancel when both sides drift) and min
    within-group cross-frame hamming 10, so max_hamming=1 matches exactly
    the same-group same-frame fingerprints, drifted or not."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def wav_drift_clip(doc_ids: pd.Series) -> pd.Series:
        cache: dict[tuple[int, bool], bytes] = {}
        out = []
        for d in doc_ids:
            g, drift = int(d) % 25, int(d) % 4 == 0
            if (g, drift) not in cache:
                amps = []
                for f in range(2):
                    for b in range(8):
                        if b == 0:
                            v = g * 10
                        elif b == 1:
                            v = f * 80
                        elif b == 7:
                            v = 2 * ((g * 31 + f * 16 + 49) % 64)
                        else:
                            v = 2 * ((g * 31 + f * 16 + b * 7) % 128)
                        if drift and b == 2:
                            v += 1
                        amps.extend([v / 255.0] * 25)
                cache[(g, drift)] = encode_wav(np.array(amps), 1000)
            out.append(cache[(g, drift)])
        return pd.Series(out)

    return wav_drift_clip
