"""Int8 affine (min/max) embedding quantization — the storage-reduction
pass a 100 TB embedding corpus runs before ANN indexing: 4x smaller than
float32 (codes + two doubles per vector), with reconstruction error
bounded by scale/2 per dimension.

Per-vector affine quantization (the ONNX/PyTorch quantization scheme,
asymmetric variant): scale = (max - min) / 255, code = clamp(floor((x -
min)/scale + 0.5), 0, 255), dequant = min + code * scale. floor(x + 0.5)
instead of round() everywhere, deliberately: Spark's round is HALF_UP on
doubles while DuckDB's is nearbyint half-even, and a code that differs
by one would break the cross-engine gate — floor of identical doubles is
identical (the same defense as _r6e's tie-nudge, applied to integer
emission). Constant vectors (max == min) take scale 0 and all-zero codes
(dequant = min exactly).

Scale shape: pure per-row column math over the vector array — zero
shuffles, zero Python; codes stay an array<int> column ready for
downstream PQ (`pq.py`) or brute-force scoring over dequantized values.
Complements product quantization: int8 is the lossless-ish 4x for
storage/IO; PQ is the lossy 32-48x for in-memory ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = 255  # 8-bit affine range [0, 255]


def int8_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>, scale double, zero double) per vector;
    `zero` is the minimum (the affine offset). Input floats widen to
    double first so both engines (and any reader) see identical values."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    lo = F.array_min(v)
    scale = (F.array_max(v) - lo) / F.lit(float(LEVELS))
    codes = F.when(
        scale == F.lit(0.0), F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            v,
            lambda x: F.least(
                F.lit(LEVELS),
                F.greatest(
                    F.lit(0), F.floor((x - lo) / scale + F.lit(0.5)).cast("int")
                ),
            ),
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        codes.alias("codes"),
        scale.alias("scale"),
        lo.alias("zero"),
    )


def int8_dequantize(
    df: DataFrame,
    codes_col: str = "codes",
    scale_col: str = "scale",
    zero_col: str = "zero",
    out_col: str = "vec_approx",
) -> DataFrame:
    """Reconstruct the double vector: zero + code * scale."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(codes_col),
            lambda c: F.col(zero_col) + c.cast("double") * F.col(scale_col),
        ),
    )


def int8_reconstruction_error(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, scale, max_abs_err) — quantize + dequantize + per-vector max
    absolute error, all in-row (max is order-independent, so the fold
    carries no float-summation-order hazard)."""
    q = int8_quantize(df, vec_col=vec_col, id_col=id_col)
    orig = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    j = int8_dequantize(q.join(orig, "id"))
    err = F.array_max(
        F.zip_with(F.col("_v"), F.col("vec_approx"), lambda a, b: F.abs(a - b))
    )
    return j.select("id", "scale", err.alias("max_abs_err"))
