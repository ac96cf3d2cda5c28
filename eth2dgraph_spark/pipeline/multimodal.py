"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no codec libraries, so the decode kernels are STUBBED —
clearly marked below — behind a deterministic fake that preserves the real
Spark-side contract: schemas, Arrow batch shapes, mapInPandas signatures and
partitioning are all real and tested. Swapping `_decode_image_stub` for a
PIL/libvips call is the only change needed on a real cluster.
"""

from __future__ import annotations

from typing import Iterator

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
    """STUB: real implementation decodes via PIL/libvips (not in container).

    Deterministic fake: a 16-dim feature derived from byte histogram moments,
    so tests exercise real data flow end-to-end with stable outputs."""
    if not payload:
        return np.zeros(16, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % 16, minlength=16).astype(np.float32)
    return hist / max(float(hist.sum()), 1.0)


def decode_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode/feature-extract: the real plumbing (Arrow batches,
    per-partition iteration, column pruning of the heavy payload AFTER the
    kernel) with the decode itself stubbed."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [ _decode_image_stub(p).tolist() for p in pdf["payload"] ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "decode_ok": ["stubbed"] * len(pdf),
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


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize — raises NotImplementedError in the kernel if ever
    executed on a real payload path; exists so the API surface and schema are
    stable."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires PIL/libvips (not in this container); "
            "swap this kernel on a real cluster"
        )

    out_schema = StructType(
        [StructField("asset_id", LongType()), StructField("payload", BinaryType())]
    )
    return assets.select("asset_id", "payload").mapInPandas(kernel, schema=out_schema)
