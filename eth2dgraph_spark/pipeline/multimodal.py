"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Codec availability is a FEATURE FLAG per modality: Pillow for images,
soundfile for audio, PyAV for video. On a real cluster with the codec
installed the decode kernels run it. For IMAGES the fallback is itself a
REAL codec: the pure-stdlib PNG decoder (functions/png.py — zlib+struct,
all five scanline filters); for AUDIO the stdlib RIFF/WAVE PCM decoder
(functions/wav.py); for VIDEO the stdlib uncompressed-AVI decoder
(functions/avi.py) — so one genuine container format PER MODALITY decodes
end-to-end in every environment, no pip required; out-of-scope payloads
degrade to 'error' rows. Deterministic stubs remain available by explicit
injection, and every mode preserves the full Spark-side contract — schemas,
Arrow batch shapes, mapInPandas signatures and partitioning are identical,
and `decode_ok` records which path produced each row ('ok' | 'stubbed' |
'error'). Tests cover every mode by injecting the decoder callable.

Driver/worker mismatch safety: the flags above are the DRIVER's view, used
only to pick the plan; the kernels re-import the codec on the WORKER, and a
`probe` runs at kernel start (outside the per-row try/except) so an executor
missing the codec the driver planned for fails the task with a named
environment-mismatch error instead of silently labeling every row 'error'.
"""

from __future__ import annotations

import io
from typing import Callable, Iterator

try:  # feature flag: real codec path when Pillow exists (driver view; the
    # kernels re-import worker-side so each executor's truth is what runs)
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

try:  # audio codec flag (same pattern)
    import soundfile  # noqa: F401

    HAS_SOUNDFILE = True
except ImportError:
    HAS_SOUNDFILE = False

try:  # video codec flag (same pattern)
    import av  # noqa: F401

    HAS_AV = True
except ImportError:
    HAS_AV = False

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .dedup import DEFAULT_MAX_BAND_BUCKET as _PHASH_DEFAULT_MAX_BUCKET

# The at-rest contract for a multimodal asset table.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),  # opaque bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),  # pooled features
        StructField("decode_ok", StringType(), True),  # ok|stubbed|error
    ]
)


def _decode_image_stub(payload: bytes | None) -> np.ndarray:
    """Fallback when no codec library is present: a DETERMINISTIC 16-dim
    feature from byte-histogram moments — stable across runs/partitionings,
    so the stub mode is itself testable end-to-end."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % 16, minlength=16).astype(np.float32)
    return hist / max(float(hist.sum()), 1.0)


def _probe_pil() -> None:
    """Worker-side codec probe. Runs at kernel START (outside the per-row
    try/except), so a driver/worker environment mismatch — Pillow on the
    driver, missing on an executor — fails the task with this message
    instead of silently labeling every row 'error'."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "Pillow was selected on the driver but is not importable on this "
            "worker — driver/worker environment mismatch; install Pillow on "
            "every executor or pass an explicit decoder"
        ) from e


def _decode_image_pil(payload: bytes | None) -> np.ndarray:
    """Real codec path (requires Pillow): decode, grayscale, pool to a 4x4
    luminance grid -> 16-dim feature in [0, 1]. Same shape/dtype contract as
    the stub. Imports Pillow worker-side (sys.modules-cached after the first
    call) instead of dereferencing a driver-resolved module global."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    from PIL import Image  # worker-side import; _probe_pil vets it at kernel start

    img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    return (np.asarray(img, dtype=np.float32) / 255.0).reshape(16)


def _stdlib_luma(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch over the no-pip codec chain: FFD8 → the stdlib
    baseline JPEG decoder (functions/jpeg.py), GIF8 → the stdlib GIF
    decoder (functions/gif.py), anything else → the stdlib PNG decoder
    (functions/png.py, which validates its own signature); the result
    reduced to Rec.601 luminance. Unsupported or malformed payloads raise
    ValueError — the callers' 'error'-row contract."""
    from eth2dgraph_spark.functions.png import luminance

    if payload[:2] == b"\xff\xd8":
        from eth2dgraph_spark.functions.jpeg import decode_jpeg

        return luminance(decode_jpeg(payload))
    if payload[:4] == b"GIF8":
        from eth2dgraph_spark.functions.gif import decode_gif

        return luminance(decode_gif(payload))
    from eth2dgraph_spark.functions.png import decode_png

    return luminance(decode_png(payload))


def _decode_image_png(payload: bytes | None) -> np.ndarray:
    """Real codec path with ZERO external dependencies: the pure-stdlib
    PNG decoder (functions/png.py — zlib+struct+numpy, 8-bit
    non-interlaced gray/RGB/RGBA with all five scanline filters) or the
    pure-stdlib baseline JPEG decoder (functions/jpeg.py — Huffman +
    IDCT + YCbCr), dispatched on magic bytes. Decode, Rec.601 luminance,
    block-mean pool to a 4x4 grid -> 16-dim feature in [0, 1] — the same
    shape/dtype contract as the Pillow path. Other formats or
    unsupported payloads raise, so decode_features marks the row 'error'
    (data, not a crash)."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    lum = _stdlib_luma(payload)
    return (_pool_mean(lum, 4) / 255.0).astype(np.float32).reshape(16)


def default_image_decoder() -> tuple[Callable[[bytes | None], np.ndarray], str]:
    """(decoder, decode_ok label) by feature flag — resolved on the DRIVER at
    plan-build time so the chosen callable is captured in the kernel closure
    (worker processes re-import modules; late-bound flags would not stick).
    Pillow when present (any format); otherwise the stdlib PNG codec — a
    REAL container-bytes decode path in every environment, labeled 'ok'.
    The byte-histogram stub remains available by explicit injection
    (_decode_image_stub) for format-agnostic smoke plumbing."""
    if HAS_PIL:
        return _decode_image_pil, "ok"
    return _decode_image_png, "ok"


def decode_features(
    assets: DataFrame,
    batch_hint: int = 1024,
    decoder: Callable[[bytes | None], np.ndarray] | None = None,
    ok_label: str | None = None,
    probe: Callable[[], None] | None = None,
) -> DataFrame:
    """mapInPandas decode/feature-extract: Arrow batches, per-partition
    iteration, column pruning of the heavy payload AFTER the kernel. The
    decode callable comes from the PIL feature flag by default; rows whose
    decode raises degrade to 'error' with a null feature instead of failing
    the task (bad bytes are data at corpus scale, not a job crash). An
    environment mismatch is NOT data: `probe` runs once at kernel start,
    outside the per-row try/except, so a worker missing the codec the driver
    planned for fails the task loudly."""
    if decoder is None:
        decoder, ok_label = default_image_decoder()
        if decoder is _decode_image_pil and probe is None:
            probe = _probe_pil
    elif ok_label is None:
        ok_label = "ok"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if probe is not None:
            probe()
        for pdf in batches:
            feats, status = [], []
            for p in pdf["payload"]:
                try:
                    feats.append(decoder(p).tolist())
                    status.append(ok_label)
                except Exception:  # noqa: BLE001 — undecodable payload is data
                    feats.append(None)
                    status.append("error")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "decode_ok": status,
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        kernel, schema=DECODED_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (asset, frame_ts). The sampling
    schedule is pure column math (sequence over duration); the actual frame
    decode would plug into decode_features. Raises nothing here — the decode
    stub marks itself 'stubbed'."""
    return (
        assets.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            # greatest(..., 0): a negative duration_ms (corrupt metadata)
            # would make sequence(0, <0, step) throw under ANSI and kill
            # the job on one bad row; clamped, it emits the single ts=0
            # frame — matching decode_video_frames' schedule for the same
            # row, so plan and decoded views stay 1:1
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("asset_id", "frame_ts_ms")
    )


# ------------------------------------------------------- perceptual hash

def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix: M[u, x] = a(u) cos(pi (2x+1) u / 2n),
    a(0) = sqrt(1/n), a(u>0) = sqrt(2/n). Pure numpy — pHash needs no codec
    and no scipy, so it runs TODAY against any pixel-array producer (the
    injected-fake decoders included)."""
    x = np.arange(n, dtype=np.float64)
    u = x[:, None]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x[None, :] + 1) * u / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


def _pool_mean(pixels: np.ndarray, n: int) -> np.ndarray:
    """Block-mean pool a 2D array to (n, n) with near-equal index bins
    (reduceat) — deterministic area averaging, no interpolation kernels."""
    p = np.asarray(pixels, dtype=np.float64)
    if p.ndim != 2:
        raise ValueError(f"phash: expected a 2D pixel array, got ndim={p.ndim}")
    h, w = p.shape
    if h < n or w < n:
        raise ValueError(f"phash: image {h}x{w} smaller than dct_size {n}")
    rb = (np.arange(n) * h) // n
    cb = (np.arange(n) * w) // n
    rows = np.add.reduceat(p, rb, axis=0)
    pooled = np.add.reduceat(rows, cb, axis=1)
    rcnt = np.diff(np.append(rb, h))
    ccnt = np.diff(np.append(cb, w))
    return pooled / (rcnt[:, None] * ccnt[None, :])


def phash64(
    pixels: np.ndarray,
    hash_size: int = 8,
    dct_size: int = 32,
    coef_dp: int | None = None,
) -> int:
    """DCT perceptual hash of a grayscale pixel array (the classic pHash
    construction the public imagehash library popularized): block-mean
    pool to dct_size², 2D DCT-II, keep the low-frequency hash_size² block,
    set bit (u*hash_size + v) iff coef[u, v] > median of the block. Robust
    to small shifts/rescales because those perturb only high-frequency
    coefficients. `coef_dp` rounds coefficients (tie-nudged) BEFORE the
    median/compare — the cross-engine gate mode: float accumulation order
    differs between numpy matmul and the SQL replica, and an unrounded
    coefficient sitting one ulp from the median would flip a bit."""
    m = _dct_matrix(dct_size)
    coef = m @ _pool_mean(pixels, dct_size) @ m.T
    low = coef[:hash_size, :hash_size].reshape(-1)
    if coef_dp is not None:
        low = np.round(low + 1e-9, coef_dp)
    med = np.median(low)
    bits = low > med
    return int(sum(1 << i for i, b in enumerate(bits) if b))


def signed64(h: int | None) -> int | None:
    """Two's-complement view of an unsigned 64-bit hash — the LongType
    representation the Spark kernels emit (bit 63 set would otherwise
    overflow Arrow int64). XOR/bit_count Hamming math is bit-identical
    either way."""
    if h is None:
        return None
    return h - (1 << 64) if h >= (1 << 63) else h


def phash_from_arrays(
    df: DataFrame,
    id_col: str = "asset_id",
    vec_col: str = "pixels",
    height: int = 8,
    width: int = 8,
    hash_size: int = 4,
    dct_size: int = 8,
    coef_dp: int | None = None,
    out_col: str = "phash",
) -> DataFrame:
    """(id_col, phash long) from a flat pixel ARRAY column (row-major
    height x width) — the codec-free entry: any upstream producer (real
    decoder, stub, or a numeric table reinterpreted as pixels) feeds it.
    Arrow-batched; rows whose array is NULL or mis-sized get a NULL hash
    (bad pixels are data, the decode_features 'error' convention)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for v in pdf[vec_col]:
                if v is None or len(v) != height * width:
                    out.append(None)
                    continue
                px = np.asarray(v, dtype=np.float64).reshape(height, width)
                out.append(signed64(phash64(px, hash_size, dct_size, coef_dp)))
            # dtype=object: a batch mixing ints and None must NOT let
            # pandas infer float64 — int64 hashes past 2^53 would silently
            # round to multiples of 512 (caught by the audio near-dup test)
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: pd.Series(out, dtype="object")}
            )

    return df.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} long, {out_col} long"
    )


def phash_features(
    assets: DataFrame,
    pixel_decoder: "Callable[[bytes | None], np.ndarray] | None" = None,
    hash_size: int = 8,
    dct_size: int = 32,
    min_partitions: "int | None" = None,
) -> DataFrame:
    """(asset_id, phash, decode_ok) for image assets: decode payload ->
    grayscale pixel array -> phash64. The decoder contract returns a 2D
    array; by default the Pillow path when available (any format), else
    the pure-stdlib PNG/baseline-JPEG codecs (functions/png.py,
    functions/jpeg.py, magic-byte dispatch) — a REAL perceptual decode
    in every environment; other formats degrade to 'error' rows. (The old byte-tiling stub is gone from the default chain: it
    hashed arbitrary bytes, not pixels — inject a decoder explicitly for
    format-agnostic plumbing smoke tests.)

    min_partitions forwards to the _floor_partitions contract (None =
    floor at defaultParallelism, 0 = off, int = explicit floor) — the
    same engine-level decode-parallelism floor audio_fingerprints and
    video_frame_phashes already carry; the image kernel was the last
    codec path without it (its batch gates repartitioned at the gate, but
    foreachBatch callers arrive as one-split frames and decoded on one
    core — r14 measured pair on image_dedup_stream)."""
    if pixel_decoder is None:
        if HAS_PIL:
            def pixel_decoder(payload):  # noqa: F811 — flag-resolved default
                if not payload:
                    return np.zeros((dct_size, dct_size), dtype=np.float64)
                from PIL import Image

                img = Image.open(io.BytesIO(payload)).convert("L")
                return np.asarray(img, dtype=np.float64)

            ok_label, probe = "ok", _probe_pil
        else:
            def pixel_decoder(payload):  # noqa: F811
                if not payload:
                    return np.zeros((dct_size, dct_size), dtype=np.float64)
                return _stdlib_luma(payload)  # PNG or baseline JPEG by magic

            ok_label, probe = "ok", None
    else:
        ok_label, probe = "ok", None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if probe is not None:
            probe()
        for pdf in batches:
            hashes, status = [], []  # emitted as dtype=object below
            for p in pdf["payload"]:
                try:
                    hashes.append(signed64(phash64(pixel_decoder(p), hash_size, dct_size)))
                    status.append(ok_label)
                except Exception:  # noqa: BLE001 — undecodable payload is data
                    hashes.append(None)
                    status.append("error")
            # dtype=object, NOT inference: pandas converts an int+None
            # list to float64, silently rounding int64 hashes past 2^53
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "phash": pd.Series(hashes, dtype="object"),
                    "decode_ok": status,
                }
            )

    return _floor_partitions(
        assets.select("asset_id", "payload"), min_partitions
    ).mapInPandas(kernel, schema="asset_id long, phash long, decode_ok string")


def phash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "asset_id",
    hash_col: str = "phash",
    num_chunks: int = 6,
    max_bucket: "int | None" = _PHASH_DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Hamming near-duplicate image pairs over pHash values, riding the
    SimHash chunk-combination banding (`dedup.simhash_near_pairs` —
    Manku WWW'07). The banding keys cover bits 0..59; a 64-bit pHash pair
    within max_hamming differs in <= max_hamming of those chunks
    regardless of where its differing bits fall (extra differences in the
    un-banded top bits only ADD chunk agreement), so exact recall is
    preserved, and verification popcounts the full 64-bit XOR.

    `max_bucket` forwards VERBATIM to simhash_near_pairs (cap-parity with
    fingerprint_overlap_pairs_hamming): None means UNCAPPED, the finite
    default is the hot-bucket star defense. Callers whose oracle is a
    closed-form pair set must pass None so the cap can never silently
    diverge from the oracle at a larger scale factor.

    BREAKING (round 12): None used to mean "use the 1024 default"; it now
    means UNCAPPED. A caller that wants the hot-bucket defense must omit
    the argument (or pass a finite cap) — passing None explicitly opts
    into O(bucket^2) expansion on identical-hash-heavy corpora."""
    from .dedup import simhash_near_pairs

    sigs = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("simhash")
    )
    out = simhash_near_pairs(sigs, max_hamming, num_chunks, max_bucket)
    return out


RESIZED_SCHEMA = StructType(
    [StructField("asset_id", LongType()), StructField("payload", BinaryType())]
)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize behind the same feature flag: with Pillow the kernel
    decodes, resizes (bicubic), and re-encodes PNG; without it the
    pure-stdlib codecs resize by NEAREST-NEIGHBOR index mapping and
    re-encode PNG — PNG or baseline-JPEG inputs by magic-byte dispatch
    (functions/png.py + functions/jpeg.py; the output container is
    always PNG, matching the Pillow arm's normalize-on-resize contract).
    A REAL resize path in every environment; the two arms produce
    different pixels by design (different resampling kernels), both a
    decodable PNG of the requested geometry. The import happens inside
    the kernel on the WORKER, so the decision reflects each executor's
    actual environment. Pillow-path decode failures propagate
    (any-format scope); stdlib-path out-of-scope payloads degrade to a
    NULL payload (unsupported bytes are data on the zero-dep path, not
    a job crash)."""
    if width < 1 or height < 1:
        raise ValueError(f"resize target must be >= 1x1, got {width}x{height}")
    use_pil = HAS_PIL

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
            _probe_pil()
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)
                    continue
                if use_pil:
                    from PIL import Image

                    img = Image.open(io.BytesIO(p)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out.append(buf.getvalue())
                    continue
                from eth2dgraph_spark.functions.gif import decode_gif
                from eth2dgraph_spark.functions.jpeg import decode_jpeg
                from eth2dgraph_spark.functions.png import decode_png, encode_png

                try:
                    if p[:2] == b"\xff\xd8":
                        arr = decode_jpeg(p)
                    elif p[:4] == b"GIF8":
                        arr = decode_gif(p)
                    else:
                        arr = decode_png(p)
                    h, w = arr.shape[:2]
                    ri = (np.arange(height) * h // height).astype(np.int64)
                    ci = (np.arange(width) * w // width).astype(np.int64)
                    out.append(encode_png(arr[ri][:, ci]))
                except Exception:  # noqa: BLE001 — undecodable payload is data
                    out.append(None)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": out})

    return assets.select("asset_id", "payload").mapInPandas(kernel, schema=RESIZED_SCHEMA)


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Backwards-compatible alias for resize_images (pre-flag name)."""
    return resize_images(assets, width, height)


# ------------------------------------------------------------------ audio

def _probe_soundfile() -> None:
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "soundfile was selected on the driver but is not importable on "
            "this worker — driver/worker environment mismatch; install "
            "soundfile on every executor or pass an explicit decoder"
        ) from e


def _decode_audio_stub(payload: bytes | None) -> np.ndarray:
    """Deterministic audio fallback: 16-dim feature from the high-nibble
    byte histogram (a different projection than the image stub, so mixed
    corpora don't collide in feature space)."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / max(float(hist.sum()), 1.0)


def _decode_audio_sf(payload: bytes | None) -> np.ndarray:
    """Real audio path (requires soundfile): decode, mono-mix, 16-bin RMS
    energy envelope. Same 16-float32 contract as the stub."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    import soundfile as sf  # worker-side import; _probe_soundfile vets it

    data, _sr = sf.read(io.BytesIO(payload), dtype="float32", always_2d=True)
    from eth2dgraph_spark.functions.wav import rms_envelope

    return rms_envelope(data)


def _decode_audio_wav(payload: bytes | None) -> np.ndarray:
    """Real codec path with ZERO external dependencies: the pure-stdlib
    RIFF/WAVE PCM decoder (functions/wav.py — struct+numpy, 8/16-bit
    integer PCM, 1..8 channels). Decode, mono-mix, 16-bin RMS energy
    envelope — the exact feature math of the soundfile path (shared via
    rms_envelope). Non-WAV or out-of-scope payloads raise, so
    decode_features marks the row 'error' (data, not a crash)."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    from eth2dgraph_spark.functions.wav import decode_wav, rms_envelope

    samples, _rate = decode_wav(payload)
    return rms_envelope(samples)


def _decode_audio_stdlib(payload: bytes | None) -> np.ndarray:
    """Magic-byte dispatch over the stdlib audio codecs (the
    _decode_video_gray_stdlib pattern): RIFF -> WAV-PCM (functions/wav.py),
    fLaC -> FLAC (functions/flac.py — fixed/LPC prediction + Rice
    residuals, CRC + MD5 verified). Both decode to the same normalized
    float32 (n, ch) contract, then the shared 16-bin RMS envelope.
    Anything else raises, so decode_features marks the row 'error'."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    from eth2dgraph_spark.functions.wav import rms_envelope

    samples, _rate = _decode_audio_samples_stdlib(payload)
    return rms_envelope(samples)


def default_audio_decoder() -> tuple[Callable[[bytes | None], np.ndarray], str]:
    """soundfile when present (any libsndfile format); otherwise the
    stdlib codecs by magic-byte dispatch (WAV-PCM + FLAC) — a REAL
    container-bytes decode path in every environment, labeled 'ok' (the
    default_image_decoder discipline: the byte-histogram stub remains
    available by explicit injection)."""
    if HAS_SOUNDFILE:
        return _decode_audio_sf, "ok"
    return _decode_audio_stdlib, "ok"


def decode_audio_features(
    assets: DataFrame,
    decoder: Callable[[bytes | None], np.ndarray] | None = None,
    ok_label: str | None = None,
    probe: Callable[[], None] | None = None,
) -> DataFrame:
    """Audio analog of decode_features: same mapInPandas kernel shape, same
    DECODED_SCHEMA, soundfile feature flag instead of Pillow."""
    if decoder is None:
        decoder, ok_label = default_audio_decoder()
        if decoder is _decode_audio_sf and probe is None:
            probe = _probe_soundfile
    return decode_features(
        assets.filter(F.col("modality") == "audio"),
        decoder=decoder,
        ok_label=ok_label,
        probe=probe,
    )


# ------------------------------------------------------------------ video

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_ok", StringType(), True),
    ]
)


def _probe_av() -> None:
    try:
        import av  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "PyAV was selected on the driver but is not importable on this "
            "worker — driver/worker environment mismatch; install av on "
            "every executor or pass an explicit decoder"
        ) from e


def _decode_video_frames_stub(payload: bytes | None, ts_list: list[int]) -> list[np.ndarray]:
    """Deterministic video fallback: the image-stub histogram rotated by the
    frame index, so frames of one asset are distinct but reproducible."""
    base = _decode_image_stub(payload)
    return [np.roll(base, i % 16).astype(np.float32) for i in range(len(ts_list))]


def _decode_video_frames_av(payload: bytes | None, ts_list: list[int]) -> list[np.ndarray]:
    """Real video path (requires PyAV): open the container ONCE, seek to
    each sampled timestamp, decode forward to the target frame, pool to the
    16-dim luminance grid (same contract as the image path).

    Seek semantics matter: with `stream=stream` PyAV interprets the offset
    in STREAM TIME_BASE units (microseconds apply only when stream=None),
    so the offset is (ts_ms/1000)/time_base. `backward=True` lands on the
    keyframe at-or-before the target (the only decodable entry point —
    `any_frame=True` would start decode at a non-keyframe and return
    corrupt frames that still report decode_ok='ok'), then we decode
    FORWARD until a frame's pts reaches the target."""
    if not payload:
        return [np.zeros(16, dtype=np.float32) for _ in ts_list]
    import av  # worker-side import; _probe_av vets it

    feats: list[np.ndarray] = []
    with av.open(io.BytesIO(payload)) as container:
        stream = container.streams.video[0]
        tb = stream.time_base
        for ts_ms in ts_list:
            if tb:
                target = int(round((ts_ms / 1000.0) / float(tb)))
                container.seek(target, backward=True, stream=stream)
            else:  # no stream time_base: fall back to container-wide us seek
                target = None
                container.seek(int(ts_ms * 1000), backward=True)
            # the frame ON SCREEN at ts is the last one with pts <= target:
            # decode forward keeping the previous frame, stop once pts
            # passes the target (the first frame past it starts AFTER ts).
            # EOF before the target returns the last decoded frame — still
            # the one displayed at ts for any ts within the stream.
            frame = None
            for f in container.decode(stream):
                if (
                    frame is not None
                    and target is not None
                    and f.pts is not None
                    and f.pts > target
                ):
                    break
                frame = f
                if target is None or f.pts is None or f.pts >= target:
                    break
            if frame is None:  # EOF at/after seek point: no decodable frame
                raise ValueError(f"no frame at {ts_ms} ms")
            arr = frame.to_ndarray(format="gray").astype(np.float32) / 255.0
            h, w = arr.shape
            pooled = arr[: h - h % 4 or h, : w - w % 4 or w]
            ph, pw = pooled.shape
            pooled = pooled.reshape(4, ph // 4, 4, pw // 4).mean(axis=(1, 3))
            feats.append(pooled.reshape(16))
    return feats


def _decode_video_frames_avi(payload: bytes | None, ts_list: list[int]) -> list[np.ndarray]:
    """Real codec path with ZERO external dependencies: the pure-stdlib
    uncompressed-AVI decoder (functions/avi.py — struct+numpy, single-stream
    BI_RGB 24-bit DIB frames). The container is decoded ONCE; the frame on
    screen at each sampled ts is picked by integer frame arithmetic
    (idx = ts_ms*fps/1000, clamped to the last frame — the same
    at-or-before-ts semantics as the PyAV seek path) and pooled to the
    16-dim luminance grid shared with that path via luma_grid16. Non-AVI or
    out-of-scope payloads raise, so decode_video_frames marks every row of
    the schedule 'error' (data, not a crash)."""
    from eth2dgraph_spark.functions.avi import decode_avi, luma_grid16

    if not payload:
        return [np.zeros(16, dtype=np.float32) for _ in ts_list]
    frames, fps = decode_avi(payload)
    n = frames.shape[0]
    grids: dict[int, np.ndarray] = {}
    out = []
    for ts_ms in ts_list:
        idx = min(n - 1, int(ts_ms * fps / 1000.0))
        if idx not in grids:
            grids[idx] = luma_grid16(frames[idx]).astype(np.float32)
        out.append(grids[idx])
    return out


def default_video_decoder() -> tuple[Callable[[bytes | None, list[int]], list[np.ndarray]], str]:
    """PyAV when present (any ffmpeg container); otherwise the stdlib
    uncompressed-AVI codec — a REAL container-bytes decode path in every
    environment, labeled 'ok' (the default_audio_decoder discipline: the
    rotated-histogram stub remains available by explicit injection)."""
    if HAS_AV:
        return _decode_video_frames_av, "ok"
    return _decode_video_frames_avi, "ok"


def decode_video_frames(
    assets: DataFrame,
    every_ms: int = 1000,
    decoder: Callable[[bytes | None, list[int]], list[np.ndarray]] | None = None,
    ok_label: str | None = None,
    probe: Callable[[], None] | None = None,
) -> DataFrame:
    """Frame decode plugged into the frame_sample_plan schedule: one kernel
    row in (asset) -> many rows out (one per sampled frame). The container is
    opened ONCE per asset and all sampled frames extracted from that handle —
    the payload is never duplicated per frame the way a plan-join would.
    Emits the same frame_ts_ms schedule as frame_sample_plan (0..duration_ms
    step every_ms), so the plan view and the decoded view line up 1:1."""
    if decoder is None:
        decoder, ok_label = default_video_decoder()
        if decoder is _decode_video_frames_av and probe is None:
            probe = _probe_av
    elif ok_label is None:
        ok_label = "ok"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if probe is not None:
            probe()
        for pdf in batches:
            aid_out: list[int] = []
            ts_out: list[int] = []
            feat_out: list[list[float] | None] = []
            ok_out: list[str] = []
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # clamp to 0 like frame_sample_plan: null/negative duration
                # still samples the single ts=0 frame, keeping the plan view
                # and the decoded view 1:1 for every row
                dur_ms = 0 if dur is None or pd.isna(dur) else max(int(dur), 0)
                ts_list = list(range(0, dur_ms + 1, every_ms))
                try:
                    feats: list = [f.tolist() for f in decoder(payload, ts_list)]
                    status = ok_label
                except Exception:  # noqa: BLE001 — undecodable container is data
                    feats = [None] * len(ts_list)
                    status = "error"
                for ts, ft in zip(ts_list, feats):
                    aid_out.append(aid)
                    ts_out.append(ts)
                    feat_out.append(ft)
                    ok_out.append(status)
            yield pd.DataFrame(
                {
                    "asset_id": aid_out,
                    "frame_ts_ms": ts_out,
                    "feature": feat_out,
                    "decode_ok": ok_out,
                }
            )

    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", "payload", "duration_ms")
        .mapInPandas(kernel, schema=VIDEO_FRAME_SCHEMA)
    )


# ------------------------------------------------------- video near-dup

def _decode_video_gray_avi(payload: "bytes | None", ts_list: list[int]) -> list[np.ndarray]:
    """Full-resolution grayscale frames (float64 0..255, Rec.601 weights) at
    the sampled timestamps from the stdlib AVI codec — the perceptual-hash
    counterpart of _decode_video_frames_avi (which pools to 16 bins and
    would destroy the spatial structure pHash needs). Same frame-pick
    arithmetic: the frame on screen at ts, clamped to the last frame."""
    from eth2dgraph_spark.functions.avi import decode_avi

    if not payload:
        raise ValueError("avi: empty payload")
    frames, fps = decode_avi(payload)
    f = frames.astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    n = luma.shape[0]
    return [luma[min(n - 1, int(ts * fps / 1000.0))] for ts in ts_list]


def _decode_video_gray_gif(payload: "bytes | None", ts_list: list[int]) -> list[np.ndarray]:
    """The animated-GIF arm of the video fingerprint: stdlib
    decode_gif_frames (functions/gif.py — frame-over-frame compositing,
    per-frame GCE delays), Rec.601 luminance, frame-on-screen-at-ts via
    the CUMULATIVE delay schedule (GIF frames have variable durations,
    unlike AVI's fixed fps), clamped to the last frame."""
    from eth2dgraph_spark.functions.gif import decode_gif_frames

    if not payload:
        raise ValueError("gif: empty payload")
    frames, delays = decode_gif_frames(payload)
    f = frames.astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    starts = np.cumsum([0] + delays[:-1])
    picks = [int(np.searchsorted(starts, ts, side="right")) - 1 for ts in ts_list]
    n = luma.shape[0]
    return [luma[min(n - 1, max(0, p))] for p in picks]


def _decode_video_gray_stdlib(payload: "bytes | None", ts_list: list[int]) -> list[np.ndarray]:
    """Magic-byte dispatch for the no-pip video fingerprint chain:
    RIFF → uncompressed AVI, GIF8 → animated GIF. Anything else raises
    ValueError (the 'error'-row contract)."""
    if payload and payload[:4] == b"GIF8":
        return _decode_video_gray_gif(payload, ts_list)
    return _decode_video_gray_avi(payload, ts_list)


def _floor_partitions(df: DataFrame, min_partitions: "int | None") -> DataFrame:
    """Partition floor for Python-kernel inputs: the per-row codec work in
    a mapInPandas kernel parallelizes exactly as wide as the input split
    count, and a small parquet (or a synth UDF over one) arrives as ONE
    split — the whole decode then runs on one core (measured: the JPEG
    near-dup gate 12.4 s single-split vs 3.6 s spread; the GIF video gate
    was the last single-core holdout, r12 VERDICT). None floors at
    defaultParallelism — the engine-level default every caller inherits,
    the reference's own tasks>=CPUs operating point (src/main.rs:153-156
    sizes its rayon pool to 5x CPUs for exactly this kernel shape);
    0 disables; a positive int floors there. Already-wide inputs pass
    through untouched (no shuffle), so a well-partitioned 100 TB scan
    never pays for the floor; streaming frames skip it (getNumPartitions
    needs a materializable plan — foreachBatch callers arrive as batch
    frames and DO get the floor)."""
    if min_partitions == 0 or df.isStreaming:
        return df
    floor = (
        df.sparkSession.sparkContext.defaultParallelism
        if min_partitions is None
        else int(min_partitions)
    )
    if df.rdd.getNumPartitions() < floor:
        return df.repartition(floor)
    return df


def video_frame_phashes(
    assets: DataFrame,
    every_ms: int = 1000,
    hash_size: int = 8,
    dct_size: int = 16,
    decoder: "Callable[[bytes | None, list[int]], list[np.ndarray]] | None" = None,
    ok_label: str | None = None,
    probe: "Callable[[], None] | None" = None,
    min_partitions: "int | None" = None,
) -> DataFrame:
    """(asset_id, frame_ts_ms, phash, decode_ok): the video fingerprint —
    one 64-bit perceptual hash per sampled frame, on the frame_sample_plan
    schedule (0..duration_ms step every_ms). The decoder contract returns
    one full-res grayscale array per sampled ts; by default the pure-stdlib
    codecs by magic-byte dispatch — uncompressed AVI (functions/avi.py) or
    animated GIF (functions/gif.py, variable per-frame delays) — so REAL
    container bytes fingerprint end-to-end in every environment;
    out-of-scope payloads degrade to 'error' rows across the full
    schedule (data, not a crash). pHash
    absorbs pixel-level noise (re-encode, mild filtering), so downstream
    overlap counting can match frames EXACTLY on the hash — the property
    that makes video near-dup a postings problem instead of a pairwise
    image-distance problem at 100 TB.

    min_partitions forwards to the _floor_partitions contract (None =
    floor at defaultParallelism, 0 = off, int = explicit floor)."""
    if decoder is None:
        decoder, ok_label = _decode_video_gray_stdlib, "ok"
    elif ok_label is None:
        ok_label = "ok"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if probe is not None:
            probe()
        for pdf in batches:
            aid_out, ts_out, h_out, ok_out = [], [], [], []
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                dur_ms = 0 if dur is None or pd.isna(dur) else max(int(dur), 0)
                ts_list = list(range(0, dur_ms + 1, every_ms))
                try:
                    grays = decoder(payload, ts_list)
                    hashes = [
                        signed64(phash64(g, hash_size, dct_size)) for g in grays
                    ]
                    status = ok_label
                except Exception:  # noqa: BLE001 — undecodable container is data
                    hashes = [None] * len(ts_list)
                    status = "error"
                for ts, h in zip(ts_list, hashes):
                    aid_out.append(aid)
                    ts_out.append(ts)
                    h_out.append(h)
                    ok_out.append(status)
            # phash as dtype=object: mixed int/None batches must not
            # decay to float64 (lossy past 2^53 — see phash_features)
            yield pd.DataFrame(
                {
                    "asset_id": aid_out,
                    "frame_ts_ms": ts_out,
                    "phash": pd.Series(h_out, dtype="object"),
                    "decode_ok": ok_out,
                }
            )

    sel = _floor_partitions(
        assets.filter(F.col("modality") == "video").select(
            "asset_id", "payload", "duration_ms"
        ),
        min_partitions,
    )
    return sel.mapInPandas(
        kernel,
        schema="asset_id long, frame_ts_ms long, phash long, decode_ok string",
    )


def fingerprint_overlap_pairs(
    frame_hashes: DataFrame,
    min_shared: int = 2,
    max_posting: int = 1024,
    id_col: str = "asset_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(id_a, id_b, n_shared): asset pairs sharing >= min_shared distinct
    per-frame fingerprints — the generic near-dup postings kernel behind
    video_near_pairs (frame pHashes) and audio_near_pairs (quantized
    energy signatures). The text.winnow_overlap_pairs shape: one shuffle
    of the distinct (id, hash) frame keyed on the hash with a spillable
    count-over-window enforcing `max_posting` BEFORE the pair join (hot
    hashes — black frames, title cards, silence shared by every asset —
    would otherwise emit O(f^2) pair rows on single keys; dropped postings
    only UNDERCOUNT n_shared), then the triangular self-join on the
    surviving postings. NULL hashes ('error' frames) never post.

    The capped postings are eagerly localCheckpoint'ed before the
    triangular self-join: both join arms read the SAME frame, and without
    the cut each arm re-runs the whole upstream fingerprint chain — for
    the production callers that chain is the mapInPandas codec decode,
    i.e. the entire corpus decoded twice (r14 plan audit: two duplicate
    MapInPandas subtrees in every near-dup gate plan). The checkpoint
    holds (id, hash) longs only — the guide-§8 lightweight-proxy shape."""
    from pyspark.sql.window import Window
    from pyspark.storagelevel import StorageLevel

    fps_ = (
        frame_hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(hash_col).alias("_fh"))
        .distinct()
    )
    capped = (
        fps_.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_fh")))
        .filter((F.col("_n") > 1) & (F.col("_n") <= max_posting))
        .drop("_n")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = capped.select(F.col("id").alias("id_a"), "_fh")
    b = capped.select(F.col("id").alias("id_b"), "_fh")
    out = (
        a.join(b, "_fh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .localCheckpoint(eager=True)
    )
    capped.unpersist()
    return out


def video_overlap_pairs(
    frame_hashes: DataFrame,
    min_shared: int = 2,
    max_posting: int = 1024,
) -> DataFrame:
    """Video naming of fingerprint_overlap_pairs — pairs over (asset_id,
    phash) frame-hash rows (video_frame_phashes output)."""
    return fingerprint_overlap_pairs(frame_hashes, min_shared, max_posting)


def video_near_pairs(
    assets: DataFrame,
    every_ms: int = 1000,
    min_shared: int = 2,
    max_posting: int = 1024,
    hash_size: int = 8,
    dct_size: int = 16,
    decoder: "Callable[[bytes | None, list[int]], list[np.ndarray]] | None" = None,
) -> DataFrame:
    """End-to-end video near-dup: real container bytes -> per-frame pHash
    fingerprints -> capped postings overlap. Composition of
    video_frame_phashes and video_overlap_pairs."""
    return video_overlap_pairs(
        video_frame_phashes(assets, every_ms, hash_size, dct_size, decoder),
        min_shared=min_shared,
        max_posting=max_posting,
    )


# ------------------------------------------------------- audio near-dup

def _decode_audio_samples_stdlib(payload: "bytes | None") -> "tuple[np.ndarray, int]":
    """(samples (n, ch) float32, rate) by magic-byte dispatch over the
    stdlib codecs: RIFF -> WAV-PCM, fLaC -> FLAC. Both normalize
    identically (bps-bit signed / 2^(bps-1)), so a clip encoded in either
    container fingerprints to the SAME signature — the cross-container
    property the audio_near_dups_flac gate pins end-to-end."""
    if payload and bytes(payload[:4]) == b"fLaC":
        from eth2dgraph_spark.functions.flac import decode_flac

        return decode_flac(payload)
    return _decode_audio_samples_wav(payload)


def _decode_audio_samples_wav(payload: "bytes | None") -> "tuple[np.ndarray, int]":
    """(samples (n, ch) float32, rate) from the stdlib WAV codec — the
    fingerprint-grade decode (decode_audio_features pools the whole clip
    to one envelope; fingerprinting needs the raw timeline)."""
    from eth2dgraph_spark.functions.wav import decode_wav

    if not payload:
        raise ValueError("wav: empty payload")
    return decode_wav(payload)


def audio_fingerprints(
    assets: DataFrame,
    frame_ms: int = 1000,
    n_bins: int = 8,
    decoder: "Callable[[bytes | None], tuple[np.ndarray, int]] | None" = None,
    ok_label: str | None = None,
    probe: "Callable[[], None] | None" = None,
    min_partitions: "int | None" = None,
) -> DataFrame:
    """(asset_id, frame_idx, ahash, decode_ok): the audio fingerprint —
    one 64-bit quantized energy signature per `frame_ms` frame. Per frame
    the mono mix is split into `n_bins` (<= 8) equal segments, each
    segment's RMS is quantized to 8 bits (round(rms*255), clipped), and
    the bytes pack into one long — the shape of an acoustic fingerprint
    (coarse spectral/energy signature per time slice, matched EXACTLY so
    downstream near-dup is a postings problem, the video_frame_phashes
    contract). Decoder contract returns (samples (n, ch), rate); default
    is the pure-stdlib WAV codec, so REAL container bytes fingerprint in
    every environment. Only COMPLETE frames post (the tail partial frame
    is dropped — two clips differing only by a trailing fraction of a
    frame still share every full-frame hash); out-of-scope payloads emit
    ONE 'error' row with a NULL hash (audio has no duration-driven
    schedule to replay, unlike video's frame_sample_plan)."""
    if not 1 <= n_bins <= 8:
        raise ValueError(f"n_bins must be 1..8, got {n_bins}")
    if frame_ms < 1:
        raise ValueError(f"frame_ms must be >= 1, got {frame_ms}")
    if decoder is None:
        decoder, ok_label = _decode_audio_samples_stdlib, "ok"
    elif ok_label is None:
        ok_label = "ok"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if probe is not None:
            probe()
        for pdf in batches:
            aid_out, idx_out, h_out, ok_out = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    samples, rate = decoder(payload)
                    mono = np.asarray(samples, dtype=np.float64)
                    if mono.ndim == 2:
                        mono = mono.mean(axis=1)
                    flen = max(int(rate * frame_ms / 1000), 1)
                    n_frames = len(mono) // flen
                    for fi in range(n_frames):
                        fr = mono[fi * flen : (fi + 1) * flen]
                        h = 0
                        for b, seg in enumerate(np.array_split(fr, n_bins)):
                            rms = float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0
                            q = min(max(int(round(rms * 255.0)), 0), 255)
                            h |= q << (8 * b)
                        aid_out.append(aid)
                        idx_out.append(fi)
                        # signed64: bin 7 >= 128 would overflow Arrow int64
                        h_out.append(signed64(h))
                        ok_out.append(ok_label)
                    continue
                except Exception:  # noqa: BLE001 — undecodable bytes are data
                    aid_out.append(aid)
                    idx_out.append(0)
                    h_out.append(None)
                    ok_out.append("error")
            # ahash as dtype=object: a batch mixing valid hashes and an
            # error-row None must not decay to float64 — int64 values past
            # 2^53 would silently round to multiples of 512, making
            # identical clips in different batches hash DIFFERENTLY (found
            # by test_audio_near_pairs_end_to_end)
            yield pd.DataFrame(
                {
                    "asset_id": aid_out,
                    "frame_idx": idx_out,
                    "ahash": pd.Series(h_out, dtype="object"),
                    "decode_ok": ok_out,
                }
            )

    sel = _floor_partitions(
        assets.filter(F.col("modality") == "audio").select("asset_id", "payload"),
        min_partitions,
    )
    return sel.mapInPandas(
        kernel,
        schema="asset_id long, frame_idx long, ahash long, decode_ok string",
    )


def audio_near_pairs(
    assets: DataFrame,
    frame_ms: int = 1000,
    n_bins: int = 8,
    min_shared: int = 2,
    max_posting: int = 1024,
    decoder: "Callable[[bytes | None], tuple[np.ndarray, int]] | None" = None,
) -> DataFrame:
    """End-to-end audio near-dup: real container bytes -> per-frame
    quantized energy signatures -> capped postings overlap. Composition of
    audio_fingerprints and fingerprint_overlap_pairs — the audio member of
    the per-modality near-dup family (images: phash_near_pairs, video:
    video_near_pairs)."""
    return fingerprint_overlap_pairs(
        audio_fingerprints(assets, frame_ms, n_bins, decoder),
        min_shared=min_shared,
        max_posting=max_posting,
        hash_col="ahash",
    )


# -------------------------------------------- incremental asset near-dup

def fingerprint_cross_pairs(
    new_hashes: DataFrame,
    hist_hashes: DataFrame,
    min_shared: int = 2,
    max_posting: int = 1024,
    id_col: str = "asset_id",
    hash_col: str = "ahash",
) -> DataFrame:
    """(new_id, hist_id, n_shared): NEW assets vs an existing fingerprint
    HISTORY — the ingest-time question ("which arriving clips duplicate
    the corpus?") as a bipartite postings join, never new x new and never
    hist x hist (the dedup.minhash_cross_pairs discipline applied to
    per-frame fingerprints). The posting cap binds on the HISTORY side per
    hash — a boilerplate frame present in the whole corpus (title card,
    silence) would otherwise pair every arriving clip with f history rows
    on one key; capped hashes drop and only UNDERCOUNT n_shared. NULL
    hashes never post. History carries (id, hash) rows ONLY — payloads
    never enter the join, the fingerprint-table-not-text contract."""
    from pyspark.sql.window import Window

    nf = (
        new_hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("new_id"), F.col(hash_col).alias("_fh"))
        .distinct()
    )
    hf = (
        hist_hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("hist_id"), F.col(hash_col).alias("_fh"))
        .distinct()
    )
    capped = (
        hf.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_fh")))
        .filter(F.col("_n") <= max_posting)
        .drop("_n")
    )
    return (
        nf.join(capped, "_fh")
        .groupBy("new_id", "hist_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def fingerprint_cross_pairs_stream(
    new_assets_stream: DataFrame,
    initial_hist_hashes: DataFrame,
    work_dir: str,
    fingerprinter: "Callable[[DataFrame], DataFrame]",
    min_shared: int = 2,
    max_posting: int = 1024,
    hash_col: str = "ahash",
    timeout_s: int = 600,
) -> DataFrame:
    """PHYSICALLY-STREAMING incremental asset near-dup: per micro-batch of
    arriving assets (foreachBatch, trigger=availableNow), fingerprint the
    batch with `fingerprinter` (audio_fingerprints / video_frame_phashes —
    any callable producing (asset_id, ..., hash_col) rows), pair it
    against a fingerprint history that STARTS as `initial_hist_hashes` and
    grows by each processed batch, and append the batch's own hashes to
    the history AFTER pairing (a batch must never see itself). This is the
    multimodal sibling of dedup.minhash_cross_pairs_stream, and the shape
    a 100 TB asset ingest actually runs: the history is an append-only
    parquet table of (asset_id, hash) longs under `work_dir` — payload
    bytes are fingerprinted once on arrival and never stored or reshuffled
    — candidate pairs append to a second table, and the result is one
    batch read of it.

    Semantics (deterministic given ordered input): with batches B1..Bk
    over initial history H0,
        result = ∪_i fingerprint_cross_pairs(fp(Bi), H0 ∪ fp(B1..B(i-1))).
    The checkpoint under work_dir/ckpt makes crash replay skip committed
    batches, and BOTH sinks are idempotent per epoch: every write lands in
    a `_batch` partition keyed by the epoch id under DYNAMIC partition
    overwrite, so a replayed epoch replaces its own partition instead of
    appending a duplicate, a killed-and-resumed run keeps the history
    partitions of already-committed batches (the initial history lives in
    partition -1 and re-overwrites only itself on restart — nothing else
    is touched), and a half-written epoch's own history partition is
    excluded from its pair join on replay (a batch never sees itself,
    even mid-crash). Kill-and-resume therefore equals the uninterrupted
    run exactly — proven by
    test_fingerprint_cross_pairs_stream_kill_and_resume. Raises if the
    stream never made progress or missed the deadline (the
    execute_stream_to_batch discipline)."""
    import os

    spark = new_assets_stream.sparkSession
    hist_dir = os.path.join(work_dir, "history")
    pairs_dir = os.path.join(work_dir, "pairs")
    (
        initial_hist_hashes.select("asset_id", hash_col)
        .withColumn("_batch", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(hist_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        fh = fingerprinter(batch_df)
        # fingerprint ONCE per batch: the pair join and the history append
        # both read this frame; without the cut the mapInPandas decode
        # would run twice per batch
        fh = fh.select("asset_id", hash_col).localCheckpoint(eager=True)
        hist = (
            sess.read.parquet(hist_dir)
            .filter(F.col("_batch") != batch_id)  # crash-replay: never self
            .select("asset_id", hash_col)
        )
        pairs = fingerprint_cross_pairs(
            fh, hist, min_shared=min_shared, max_posting=max_posting,
            hash_col=hash_col,
        )
        # the pairs and history sink writes overlap (r14, guide §2.6):
        # two tiny dynamic-overwrite jobs whose scheduling floors
        # dominated the batch. "A batch never sees itself" does NOT
        # depend on their order — `hist`'s file listing was snapshotted
        # when sess.read.parquet ran above (before either write starts),
        # and the `_batch != batch_id` filter excludes this epoch's
        # history partition on crash replay regardless of which write
        # committed first (the exact states the kill-and-resume test
        # already exercises under at-least-once delivery).
        from ._overlap import overlap_jobs

        overlap_jobs(
            lambda: (
                pairs.withColumn("_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch")
                .parquet(pairs_dir)
            ),
            lambda: (
                fh.withColumn("_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch")
                .parquet(hist_dir)
            ),
        )

    q = (
        new_assets_stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise RuntimeError(f"asset ingest stream did not finish within {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
    if q.lastProgress is None:
        raise RuntimeError("asset ingest stream terminated without making progress")
    try:
        return spark.read.parquet(pairs_dir).drop("_batch")
    except Exception:  # noqa: BLE001 — every batch paired nothing: a
        # zero-row partitioned write leaves no parquet footer to infer
        # from, so rebuild the (new_id, hist_id, n_shared) schema from an
        # analysis-only probe plan (no job runs) and return it empty
        probe = fingerprint_cross_pairs(
            initial_hist_hashes.select("asset_id", hash_col),
            initial_hist_hashes.select("asset_id", hash_col),
            min_shared=min_shared, max_posting=max_posting, hash_col=hash_col,
        )
        return spark.createDataFrame([], probe.schema)


def fingerprint_overlap_pairs_hamming(
    frame_hashes: DataFrame,
    max_hamming: int = 2,
    min_shared: int = 2,
    max_posting: int = 1024,
    id_col: str = "asset_id",
    hash_col: str = "phash",
    max_bucket: "int | None" = None,
) -> DataFrame:
    """(id_a, id_b, n_shared): asset pairs whose per-frame fingerprints
    match within Hamming distance `max_hamming` — the tolerant variant of
    fingerprint_overlap_pairs for content that drifts a few pHash bits
    between copies (re-encodes, mild filtering, subtitle burns). n_shared
    counts DISTINCT matched unordered hash-value pairs, so max_hamming=0
    degenerates exactly to the equality semantics.

    Scale shape: the Hamming matching runs over DISTINCT HASH VALUES, not
    postings — dedup.simhash_near_pairs' chunk-combination banding (Manku
    WWW'07; exact recall for <= max_hamming, full-64-bit popcount
    verification) keyed on the value itself, so the near-match cost scales
    with the fingerprint vocabulary, not the corpus (MEASURED:
    tools/soak_hamming_r10.py — 100x the vocabulary costs 7.6x the
    banding wall, 100x the corpus at constant dup density costs 9.3x
    end-to-end, planted pairs recovered exactly at every scale). The value-pair table
    (symmetrized + identity) then joins the capped postings twice — two
    hash-keyed shuffles, no pairwise asset work. Unlike the exact kernel,
    singleton postings are kept (a hash posted once can still match a NEAR
    hash posted elsewhere); `max_posting` bounds hot hashes the same way.
    `max_bucket=None` leaves banding uncapped (vocabulary-sized buckets);
    pass dedup.DEFAULT_MAX_BAND_BUCKET for adversarial vocabularies.

    The capped postings are eagerly localCheckpoint'ed before the fan-out:
    FOUR consumers read this frame (vals -> ident, vals -> the banding
    kernel, and the two postings join arms), and without the cut each
    re-runs the whole upstream fingerprint chain — the mapInPandas codec
    decode for the production callers (r14 plan audit: the drift-audio
    gate plan carried 14 duplicate Python-eval subtrees). The checkpoint
    holds (id, hash) longs only."""
    from pyspark.sql.window import Window

    from .dedup import simhash_near_pairs

    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    fps_ = (
        frame_hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(hash_col).alias("_fh"))
        .distinct()
    )
    capped = (
        fps_.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_fh")))
        .filter(F.col("_n") <= max_posting)
        .drop("_n")
        .localCheckpoint(eager=True)
    )
    vals = capped.select("_fh").distinct()
    ident = vals.select(F.col("_fh").alias("_h1"), F.col("_fh").alias("_h2"))
    if max_hamming == 0:
        matches = ident
    else:
        near = simhash_near_pairs(
            vals.select(F.col("_fh").alias("id"), F.col("_fh").alias("simhash")),
            max_hamming=max_hamming,
            max_bucket=max_bucket,
        ).select(F.col("id_a").alias("_h1"), F.col("id_b").alias("_h2"))
        matches = ident.unionByName(near).unionByName(
            near.select(F.col("_h2").alias("_h1"), F.col("_h1").alias("_h2"))
        )
    a = capped.select(F.col("id").alias("id_a"), F.col("_fh").alias("_h1"))
    b = capped.select(F.col("id").alias("id_b"), F.col("_fh").alias("_h2"))
    # parallelism pins (r14, the ngram_jaccard_pairs pattern): when the
    # postings fit the broadcast threshold the planner broadcasts THEM and
    # streams the byte-tiny matches table — so the whole pair expansion +
    # n_shared aggregate runs in the stage reading the matches-union
    # exchanges, which AQE's size-based coalescing (parallelismFirst=false,
    # session.py) collapses to ~1 task (measured: video_near_frames 1.42x
    # under the flag before the pins). Pinning matches at dp spreads the
    # expansion; pinning the pair aggregate on (id_a, id_b) covers both
    # countDistinct phases (subset-clustering), replacing their
    # ENSURE_REQUIREMENTS exchanges 1:1. At scale the postings side is the
    # streamed one and already wide, and matches stays vocabulary-pair-
    # sized, so both pins cost one small-frame shuffle.
    dp = max(
        frame_hashes.sparkSession.sparkContext.defaultParallelism,
        capped.rdd.getNumPartitions(),
    )
    return (
        a.join(matches.repartition(dp, "_h1"), "_h1")
        .join(b, "_h2")
        .filter(F.col("id_a") < F.col("id_b"))
        .repartition(dp, "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(
            F.countDistinct(
                F.least("_h1", "_h2"), F.greatest("_h1", "_h2")
            ).alias("n_shared")
        )
        .filter(F.col("n_shared") >= min_shared)
    )
