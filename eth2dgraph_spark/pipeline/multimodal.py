"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Codec availability is a FEATURE FLAG: at import we attempt PIL (Pillow). On
a real cluster with Pillow installed the decode kernels run the real codec;
in this container (no codec libraries) they fall back to a deterministic
stub that preserves the full Spark-side contract — schemas, Arrow batch
shapes, mapInPandas signatures and partitioning are identical in both modes,
and `decode_ok` records which path produced each row ('ok' | 'stubbed' |
'error'). Tests cover both modes by injecting the decoder callable.
"""

from __future__ import annotations

import io
from typing import Callable, Iterator

try:  # feature flag: real codec path when Pillow exists on the workers
    from PIL import Image as _PIL_Image  # type: ignore

    HAS_PIL = True
except ImportError:
    _PIL_Image = None
    HAS_PIL = False

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


def _decode_image_pil(payload: bytes | None) -> np.ndarray:
    """Real codec path (requires Pillow): decode, grayscale, pool to a 4x4
    luminance grid -> 16-dim feature in [0, 1]. Same shape/dtype contract as
    the stub."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    img = _PIL_Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    return (np.asarray(img, dtype=np.float32) / 255.0).reshape(16)


def default_image_decoder() -> tuple[Callable[[bytes | None], np.ndarray], str]:
    """(decoder, decode_ok label) by feature flag — resolved on the DRIVER at
    plan-build time so the chosen callable is captured in the kernel closure
    (worker processes re-import modules; late-bound flags would not stick)."""
    if HAS_PIL:
        return _decode_image_pil, "ok"
    return _decode_image_stub, "stubbed"


def decode_features(
    assets: DataFrame,
    batch_hint: int = 1024,
    decoder: Callable[[bytes | None], np.ndarray] | None = None,
    ok_label: str | None = None,
) -> DataFrame:
    """mapInPandas decode/feature-extract: Arrow batches, per-partition
    iteration, column pruning of the heavy payload AFTER the kernel. The
    decode callable comes from the PIL feature flag by default; rows whose
    decode raises degrade to 'error' with a null feature instead of failing
    the task (bad bytes are data at corpus scale, not a job crash)."""
    if decoder is None:
        decoder, ok_label = default_image_decoder()
    elif ok_label is None:
        ok_label = "ok"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))),
        )
        .select("asset_id", "frame_ts_ms")
    )


RESIZED_SCHEMA = StructType(
    [StructField("asset_id", LongType()), StructField("payload", BinaryType())]
)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize behind the same feature flag: with Pillow the kernel
    decodes, resizes, and re-encodes PNG; without it the kernel raises
    NotImplementedError when EXECUTED (plan building always succeeds, so the
    API surface and schema stay stable in this container)."""
    has_pil = HAS_PIL  # captured at plan time, not worker import time

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not has_pil:
            raise NotImplementedError(
                "image resize requires Pillow (not in this container); "
                "install it on the cluster and this kernel runs as-is"
            )
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)
                    continue
                img = _PIL_Image.open(io.BytesIO(p)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": out})

    return assets.select("asset_id", "payload").mapInPandas(kernel, schema=RESIZED_SCHEMA)


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Backwards-compatible alias for resize_images (pre-flag name)."""
    return resize_images(assets, width, height)
