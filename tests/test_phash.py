"""DCT perceptual hash (multimodal.phash64 + Spark ops): invariance
properties on synthetic pixel arrays (shift/upscale collide, distinct
images don't), the array-column op's NULL/mis-size contract, banded
Hamming near-pairs, and the decode-seam statuses."""

from __future__ import annotations

import numpy as np
import pytest
from numpy.lib.stride_tricks import sliding_window_view
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import multimodal as mm


def _smooth(seed: int) -> np.ndarray:
    """Dense-spectrum smooth random field (312x312): blocky random grid +
    box blur. Dense spectra keep the 64 low-freq DCT coefficients well
    separated from their median, which is what makes pHash's bits stable
    under small perturbations (a sparse synthetic scene has dozens of
    near-zero coefficients whose bits are noise)."""
    rng = np.random.default_rng(seed)
    big = np.kron(rng.uniform(0, 255, (20, 20)), np.ones((16, 16)))
    return sliding_window_view(big, (9, 9)).mean(axis=(2, 3))


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_invariances():
    sm = _smooth(7)
    a = sm[0:256, 0:256]
    h_a = mm.phash64(a)
    assert mm.phash64(a.copy()) == h_a                      # deterministic
    assert _ham(h_a, mm.phash64(sm[3:259, 3:259])) <= 8     # 3px shift
    assert _ham(h_a, mm.phash64(np.kron(a, np.ones((2, 2))))) <= 2  # 2x upscale
    assert _ham(h_a, mm.phash64(a + 10.0)) <= 2             # brightness
    h_d = mm.phash64(_smooth(8)[0:256, 0:256])
    assert _ham(h_a, h_d) >= 20                             # distinct content
    assert 0 <= h_a < (1 << 64)


def test_phash_rejects_bad_shapes():
    with pytest.raises(ValueError, match="2D"):
        mm.phash64(np.zeros(64))
    with pytest.raises(ValueError, match="smaller than dct_size"):
        mm.phash64(np.zeros((16, 16)), dct_size=32)


def test_phash_from_arrays_contract(spark):
    rows = [
        (0, [float(i) for i in range(64)]),
        (1, [float(63 - i) for i in range(64)]),
        (2, None),                        # NULL pixels -> NULL hash
        (3, [1.0, 2.0]),                  # mis-sized -> NULL hash
    ]
    df = spark.createDataFrame(rows, "asset_id long, px array<double>")
    got = {
        r["asset_id"]: r["phash"]
        for r in mm.phash_from_arrays(
            df, vec_col="px", height=8, width=8, hash_size=4, dct_size=8
        ).collect()
    }
    assert got[2] is None and got[3] is None
    assert got[0] is not None and got[1] is not None and got[0] != got[1]
    # matches the driver-side kernel on the same pixels
    want = mm.signed64(mm.phash64(np.arange(64, dtype=np.float64).reshape(8, 8), 4, 8))
    assert got[0] == want


def test_phash_near_pairs_banding(spark):
    sm = _smooth(11)
    a = sm[0:256, 0:256]
    b = sm[2:258, 2:258]          # near-dup of a (measured hamming 4)
    c = _smooth(12)[0:256, 0:256]  # unrelated
    ha, hb, hc = mm.phash64(a), mm.phash64(b), mm.phash64(c)
    assert _ham(ha, hb) <= 5 < _ham(ha, hc)
    df = spark.createDataFrame(
        [(0, mm.signed64(ha)), (1, mm.signed64(hb)), (2, mm.signed64(hc)), (3, None)],
        "asset_id long, phash long",
    )
    pairs = mm.phash_near_pairs(df, max_hamming=5, num_chunks=6).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
    [p] = pairs
    assert p["hamming"] == _ham(ha, hb)


def test_phash_features_real_png_and_error(spark):
    # the default pixel path is a REAL decode in every environment (Pillow
    # if present, else the stdlib PNG codec): a genuine PNG hashes 'ok' and
    # deterministically; garbage bytes are a data error on every path
    import numpy as np

    from eth2dgraph_spark.functions.png import encode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, bytearray(encode_png(img))),
         (1, None),
         (2, bytearray(b"some image bytes here" * 50))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in mm.phash_features(df, dct_size=8).collect()}
    assert got[0]["decode_ok"] == "ok" and got[0]["phash"] is not None
    # the hash equals phash64 on the decoded luminance (grayscale PNG: the
    # pixels themselves) — the Spark kernel adds nothing to the math
    assert got[0]["phash"] == mm.signed64(
        mm.phash64(img.astype(np.float64), hash_size=8, dct_size=8)
    )
    # empty payload -> all-zero image -> still hashes (flat image)
    assert got[1]["phash"] is not None
    assert got[2]["decode_ok"] == "error" and got[2]["phash"] is None
    # an injected decoder that raises marks the row 'error', not the job
    def bad(_payload):
        raise RuntimeError("boom")

    err = {r["asset_id"]: r for r in mm.phash_features(df, pixel_decoder=bad).collect()}
    assert all(r["decode_ok"] == "error" and r["phash"] is None for r in err.values())
