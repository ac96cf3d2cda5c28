"""Round-10 multimodal near-dup soak: audio_near_pairs and
video_near_pairs over N synthetic assets at two scale points (default
5k / 50k), REAL container bytes end to end (stdlib WAV/AVI codecs).

Corpus shape: every asset i carries a clip whose pattern is pinned by its
GROUP; i%50==23 clips share the group of i-23 (~2% of assets have exactly
one duplicate partner), everything else is its own group. Group pins use
3 dedicated bytes (unique to 16M groups for audio), so posting sizes stay
~2 and the join is tiny — which is the point to verify: the family's cost
should be the embarrassingly-parallel codec+fingerprint MAPPER stage (the
winnow finding), with the postings shuffle a rounding error, i.e. the
shape that scales out horizontally at 100 TB.

Payloads are synthesized INSIDE the fingerprint job (mapInPandas over a
range — the soak_r10_scale discipline: no driver-side generation loop).

Usage: python tools/soak_multimodal_r10.py     (one JSON line)
  SOAK_SIZES=5000,50000  SOAK_OPS=audio,video,image,jpeg,flac to restrict.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402

SIZES = [int(x) for x in os.environ.get("SOAK_SIZES", "5000,50000").split(",")]
OPS = os.environ.get("SOAK_OPS", "audio,video").split(",")


def group_of(i: int) -> int:
    return i - 23 if (i % 50 == 23 and i > 50) else i


def audio_assets(spark, n):
    from eth2dgraph_spark.functions.wav import encode_wav

    def kernel(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["id"]:
                g = group_of(int(i))
                amps = []
                for f in range(3):
                    for b in range(8):
                        if b == 0:
                            v = g % 256
                        elif b == 1:
                            v = (g // 256) % 256
                        elif b == 2:
                            v = (g // 65536) % 256
                        elif b == 3:
                            v = f * 80
                        else:
                            v = (g * 31 + f * 16 + b * 7) % 256
                        amps.extend([v / 255.0] * 25)
                payloads.append(encode_wav(np.array(amps), 1000))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["id"].astype("int64"),
                    "modality": "audio",
                    "payload": payloads,
                }
            )

    return (
        spark.range(n)
        .repartition(64)
        .mapInPandas(kernel, "asset_id long, modality string, payload binary")
    )


def flac_assets(spark, n):
    """Round-13 FLAC arm: EXACTLY audio_assets' clip per group, FLAC-
    encoded — the codec under test is the per-row Rice decode inside
    audio_fingerprints' magic dispatch; identical fingerprints to the
    WAV arm (lossless + WAV-identical quantization), so pair counts
    must MATCH the audio arm at every n (a cross-container soak
    invariant, not just a wall-clock number)."""
    from eth2dgraph_spark.functions.flac import encode_flac

    def kernel(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["id"]:
                g = group_of(int(i))
                amps = []
                for f in range(3):
                    for b in range(8):
                        if b == 0:
                            v = g % 256
                        elif b == 1:
                            v = (g // 256) % 256
                        elif b == 2:
                            v = (g // 65536) % 256
                        elif b == 3:
                            v = f * 80
                        else:
                            v = (g * 31 + f * 16 + b * 7) % 256
                        amps.extend([v / 255.0] * 25)
                payloads.append(encode_flac(np.array(amps), 1000))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["id"].astype("int64"),
                    "modality": "audio",
                    "payload": payloads,
                }
            )

    return (
        spark.range(n)
        .repartition(64)
        .mapInPandas(kernel, "asset_id long, modality string, payload binary")
    )


def video_assets(spark, n):
    from eth2dgraph_spark.functions.avi import encode_avi

    def kernel(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["id"]:
                g = group_of(int(i))
                frames = []
                for f in range(3):
                    # xorshift-filled grid: a LINEAR ramp pattern was
                    # measured to collide catastrophically under pHash
                    # (mean-removed ramps share sign structure — 59k
                    # false pairs at 5k assets); a per-(g, f) pseudo-
                    # random grid gives pHash real texture to separate
                    s = (g * 3 + f + 1) * 2654435761 & 0xFFFFFFFFFFFFFFFF
                    vals = []
                    for _ in range(16):
                        s ^= (s << 13) & 0xFFFFFFFFFFFFFFFF
                        s ^= s >> 7
                        s ^= (s << 17) & 0xFFFFFFFFFFFFFFFF
                        vals.append(s % 256)
                    grid = np.array(vals, dtype=np.uint8).reshape(4, 4)
                    px = np.repeat(np.repeat(grid, 4, axis=0), 4, axis=1)
                    frames.append(np.repeat(px[:, :, None], 3, axis=2))
                payloads.append(encode_avi(np.stack(frames), fps=1))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["id"].astype("int64"),
                    "modality": "video",
                    "payload": payloads,
                    "duration_ms": 2500,
                }
            )

    return (
        spark.range(n)
        .repartition(64)
        .mapInPandas(
            kernel, "asset_id long, modality string, payload binary, duration_ms long"
        )
    )


def image_assets(spark, n):
    """Round-11 image arm: one 32x32 grayscale PNG per asset (stdlib
    encode_png), pattern pinned by group — the seeded-random-grid
    construction from png.synthetic_image_udf (structured grids measured
    pHash-colliding at hamming 0; random grids measured min cross-group
    hamming 22 over a 25-group sample)."""
    from eth2dgraph_spark.functions.png import synthetic_group_image

    def kernel(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["id"]:
                # the EXACT gate construction (shared helper) — a divergent
                # seed expression here would undermine the soak's claim to
                # exercise the same pattern as synthetic_image_udf
                payloads.append(synthetic_group_image(group_of(int(i))))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                }
            )

    return (
        spark.range(n)
        .repartition(64)
        .mapInPandas(kernel, "asset_id long, modality string, payload binary")
    )


def jpeg_assets(spark, n):
    """Round-12 JPEG arm: one 32x32 grayscale baseline JPEG per asset
    (stdlib encode_jpeg via the frozen synthetic_group_jpeg construction),
    pattern pinned by group — receipts the pure-Python Huffman decoder's
    per-row cost at corpus scale (the fast-table path, ~0.8 ms/image)."""
    from eth2dgraph_spark.functions.jpeg import synthetic_group_jpeg

    def kernel(batches):
        for pdf in batches:
            payloads = [synthetic_group_jpeg(group_of(int(i))) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                }
            )

    return (
        spark.range(n)
        .repartition(64)
        .mapInPandas(kernel, "asset_id long, modality string, payload binary")
    )


def main() -> None:
    from eth2dgraph_spark.pipeline.multimodal import (
        audio_near_pairs,
        phash_features,
        phash_near_pairs,
        video_near_pairs,
    )

    spark = get_spark("soak-mm")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sizes": SIZES, "arms": {}}
    for n in SIZES:
        for op in OPS:
            if op == "audio":
                assets = audio_assets(spark, n).persist()
                assets.count()
                t0 = time.time()
                pairs = audio_near_pairs(assets, frame_ms=200, min_shared=2)
                cnt = pairs.count()
            elif op == "flac":
                assets = flac_assets(spark, n).persist()
                assets.count()  # synth cost excluded: the DECODE is under test
                t0 = time.time()
                pairs = audio_near_pairs(assets, frame_ms=200, min_shared=2)
                cnt = pairs.count()
            elif op == "image":
                assets = image_assets(spark, n).persist()
                assets.count()
                t0 = time.time()
                pairs = phash_near_pairs(
                    phash_features(assets), max_hamming=2, max_bucket=None
                )  # cap-parity with the gates: group sizes reach 2000 at
                # n=50k, above the 1024 default — uncapped keeps the
                # recorded pair counts the closed-form group-pair numbers
                cnt = pairs.count()
            elif op == "jpeg":
                assets = jpeg_assets(spark, n).persist()
                assets.count()  # synth cost excluded: the DECODE is under test
                t0 = time.time()
                pairs = phash_near_pairs(
                    phash_features(assets), max_hamming=2, max_bucket=None
                )  # cap-parity with the gates: group sizes reach 2000 at
                # n=50k, above the 1024 default — uncapped keeps the
                # recorded pair counts the closed-form group-pair numbers
                cnt = pairs.count()
            else:
                assets = video_assets(spark, n).persist()
                assets.count()
                t0 = time.time()
                pairs = video_near_pairs(assets, every_ms=1000, min_shared=2)
                cnt = pairs.count()
            el = round(time.time() - t0, 2)
            assets.unpersist()
            key = f"{op}@{n}"
            out["arms"][key] = {"sec": el, "pairs": cnt}
            print(f"{key}: {out['arms'][key]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
