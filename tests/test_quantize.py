"""Int8 affine quantization: pure-Python reference pin, the scale/2
error bound, constant-vector and clamp edges, and roundtrip shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import quantize as qz


def _ref_codes(vec):
    lo, hi = min(vec), max(vec)
    sc = (hi - lo) / 255.0
    if sc == 0.0:
        return [0] * len(vec), sc, lo
    return (
        [min(255, max(0, math.floor((x - lo) / sc + 0.5))) for x in vec],
        sc,
        lo,
    )


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [0.11, -0.52, 0.37, 0.0]),
        (1, [1.0, 1.0, 1.0, 1.0]),  # constant: scale 0
        (2, [-3.5, 2.5, 0.25, -1.125]),
        (3, [5e-8, -5e-8, 0.0, 1e-9]),  # tiny dynamic range
    ]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        rows,
    )


def test_codes_match_pure_python_reference(spark, vecs):
    df, rows = vecs
    got = {r["id"]: r for r in qz.int8_quantize(df).collect()}
    for vid, vec in rows:
        codes, sc, lo = _ref_codes(vec)
        assert list(got[vid]["codes"]) == codes, vid
        assert got[vid]["scale"] == pytest.approx(sc, abs=0.0)
        assert got[vid]["zero"] == vec[0] if sc == 0 else True
        assert got[vid]["zero"] == min(vec)


def test_error_bounded_by_half_scale(spark, vecs):
    df, rows = vecs
    for r in qz.int8_reconstruction_error(df).collect():
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-15, r["id"]


def test_extremes_hit_code_bounds_and_roundtrip(spark, vecs):
    df, rows = vecs
    q = qz.int8_quantize(df)
    got = {r["id"]: r for r in q.collect()}
    for vid, vec in rows:
        if max(vec) > min(vec):
            assert min(got[vid]["codes"]) == 0  # the min maps to 0
            assert max(got[vid]["codes"]) == 255  # the max maps to 255
    deq = {r["id"]: r["vec_approx"] for r in qz.int8_dequantize(q).collect()}
    for vid, vec in rows:
        for a, b in zip(vec, deq[vid]):
            assert abs(a - b) <= (max(vec) - min(vec)) / 255.0 / 2 + 1e-15


def test_float32_input_widens(spark):
    df = spark.createDataFrame(
        [(0, [0.5, -0.25, 0.125])], "vec_id long, embedding array<float>"
    )
    row = qz.int8_quantize(df).collect()[0]
    assert list(row["codes"]) == _ref_codes([0.5, -0.25, 0.125])[0]
