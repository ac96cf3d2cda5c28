"""Round-14 phase profiler for the stream gates (guide §1: measure first).

Splits image_dedup_stream / audio_dedup_stream cost into phases and A/B's
the repartition-before-synth pattern on the history side, without touching
the gates. Run isolated (clean machine), warm.

Usage: python tools/measure_r14_streams.py [image|audio|cross]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time()-t0:.2f}s")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "image"
    spark = get_spark("measure-r14-streams")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select("doc_id")
    g = F.col("doc_id") % 25

    if which == "image":
        from eth2dgraph_spark.functions.jpeg import synthetic_jpeg_udf
        from eth2dgraph_spark.pipeline.multimodal import phash_features

        img = synthetic_jpeg_udf()

        def assets(ids):
            return ids.select(
                F.col("aid").alias("asset_id"),
                F.lit("image").alias("modality"),
                img("aid").alias("payload"),
            )

        h0 = assets(d.filter(g < 20).select(F.col("doc_id").alias("aid")))
        h0_wide = assets(
            d.filter(g < 20).select(F.col("doc_id").alias("aid")).repartition(par)
        )
        # warm the python workers first
        t("warm (h0 synth only, narrow)", h0.select("payload"))
        t("hist fingerprint, CURRENT (no repartition)", phash_features(h0).select("asset_id", "phash"))
        t("hist fingerprint, repartition-before-synth", phash_features(h0_wide).select("asset_id", "phash"))
        t("hist fingerprint, repartition-before-synth (repeat)", phash_features(h0_wide).select("asset_id", "phash"))
        b2 = assets(
            d.filter((g >= 20) & (F.col("doc_id") >= 250))
            .select((F.col("doc_id") + 100000).alias("aid"))
        )
        b2_wide = assets(
            d.filter((g >= 20) & (F.col("doc_id") >= 250))
            .select((F.col("doc_id") + 100000).alias("aid"))
            .repartition(par)
        )
        import tempfile

        for label, frame, one in (
            ("b2 write coalesce(1) CURRENT", b2, "coalesce"),
            ("b2 write repartition-synth+repartition(1)", b2_wide, "repartition"),
        ):
            tmp = tempfile.mkdtemp(prefix="m14_")
            t0 = time.time()
            fr = frame.coalesce(1) if one == "coalesce" else frame.repartition(1)
            fr.write.parquet(os.path.join(tmp, "b2"))
            print(f"{label}: {time.time()-t0:.2f}s")
    elif which == "audio":
        from eth2dgraph_spark.functions.wav import synthetic_clip_udf
        from eth2dgraph_spark.pipeline.multimodal import audio_fingerprints

        clip = synthetic_clip_udf()

        def assets(ids):
            return ids.select(
                F.col("aid").alias("asset_id"),
                F.lit("audio").alias("modality"),
                clip("aid").alias("payload"),
            )

        h0 = assets(d.filter(g < 20).select(F.col("doc_id").alias("aid")))
        h0_wide = assets(
            d.filter(g < 20).select(F.col("doc_id").alias("aid")).repartition(par)
        )
        t("warm (h0 synth only, narrow)", h0.select("payload"))
        t("hist fingerprint, CURRENT (no repartition)", audio_fingerprints(h0, frame_ms=200).select("asset_id", "ahash"))
        t("hist fingerprint, repartition-before-synth", audio_fingerprints(h0_wide, frame_ms=200).select("asset_id", "ahash"))
        t("hist fingerprint, repartition-before-synth (repeat)", audio_fingerprints(h0_wide, frame_ms=200).select("asset_id", "ahash"))
    elif which == "cross":
        from eth2dgraph_spark.pipeline.dedup import minhash_cross_pairs

        hist = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
            "doc_id", "text"
        )
        b1 = hist.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzz extra token")).alias("text"),
        )
        # warm
        t("warm hist scan", hist)
        t0 = time.time()
        p = minhash_cross_pairs(
            b1, hist, k=3, num_hashes=32, num_bands=8, threshold=0.5,
            max_band_bucket=None,
        )
        print(f"minhash_cross_pairs(b1, full hist) incl. checkpoint: {time.time()-t0:.2f}s")
        t0 = time.time()
        p = minhash_cross_pairs(
            b1, hist, k=3, num_hashes=32, num_bands=8, threshold=0.5,
            max_band_bucket=None,
        )
        print(f"  (repeat): {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
