"""HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007).

Rounds out the sketch family next to CMS + Misra-Gries (`sketch.py`):
COUNT(DISTINCT x) [GROUP BY k] in one pass with O(m) state per key,
mergeable across partitions / days / shards — the cardinality question a
100 TB curation stack asks constantly (distinct documents per domain,
distinct users per event type, vocabulary size per source) where an
exact distinct would shuffle the full value set.

Engine-portable construction, so the oracle gate replays it in SQL:

- hash: the repo's cross-engine 60-bit md5 hash (`text.md5_60bit`) —
  uniform on [0, 2^60), identical in Spark and DuckDB.
- register j = h mod m (m = 2^p); remaining value w = h >> p, a
  (60-p)-bit field.
- rho(w) = position of the leftmost 1-bit of w within that field,
  computed EXACTLY via the bin-string length both engines share:
  rho = (61-p) - length(bin(w)) for w > 0, else 61-p (no float log2,
  whose floor() can be off-by-one at power-of-two boundaries).
- register state: groupBy(register).max(rho) — max is associative and
  commutative, so partials map-side combine and `hll_merge` is a union
  + the same groupBy (the `countmin_partials` discipline).
- estimate: the harmonic sum of 2^-rho is kept EXACT by scaling — each
  register contributes the integer 2^(61 - rho) (never-hit registers
  contribute rho=0, i.e. 2^61), summed as DECIMAL(38,0) (Spark) /
  HUGEINT (DuckDB). No float summation anywhere, so cross-engine
  accumulation order is irrelevant; the estimate is ONE double division
  of exactly-equal operands: est_raw = alpha_m * m^2 * 2^61 / S.
- small-range correction: linear counting m*ln(m/V) when est <= 2.5m
  and V (= zero registers) > 0, per the published algorithm. The 2^32
  large-range branch is unnecessary under a 60-bit hash space.

Standard error is ~1.04/sqrt(m) (6.5% at the default p=8; production
p=14 gives 0.8% with 16 KB of state per key).

Scale shape: the only shuffle is (key, register, rho) capped at m rows
per partition per key by the map-side combine; the estimate is a bounded
per-key fold. State never grows with cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import md5_60bit

_SCALE = 61  # 2^(_SCALE - rho) stays within int64 for rho in [0, 61]


def _alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper (Fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    value_col: str,
    p: int = 8,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-(key, register) max-rho state: the mergeable HLL sketch.

    NULL values are ignored (SQL COUNT(DISTINCT) semantics). Output is at
    most m = 2^p rows per key regardless of input cardinality.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    keys = list(key_cols or [])
    m = 1 << p
    wbits = 60 - p
    h = md5_60bit(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)  # h >= 0 (60-bit), arithmetic shift is unsigned here
    rho = F.when(w == F.lit(0), F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            *keys,
            F.pmod(h, F.lit(m)).cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*keys, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    *register_frames: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """OR-merge of sketches built over disjoint (or overlapping — max is
    idempotent) slices of the data: union + the same max fold."""
    keys = list(key_cols or [])
    out = register_frames[0]
    for f in register_frames[1:]:
        out = out.unionByName(f)
    return out.groupBy(*keys, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Cardinality estimate from register state.

    Columns: keys..., est_distinct (branch-corrected), est_raw (the
    uncorrected harmonic estimate, double), hit_registers,
    zero_registers. The harmonic sum is exact-integer (see module
    docstring); est_raw is a single division of exact operands, so it is
    bit-identical across engines; only the linear-counting ln() carries
    libm rounding (gates apply the repo's tie-nudged 6-dp round).
    """
    keys = list(key_cols or [])
    m = 1 << p
    # alpha * m^2 * 2^61: the * 2^61 is a pure exponent shift on the
    # double, so this Python-side constant is exact given alpha * m^2.
    numer = _alpha(m) * m * m * float(1 << _SCALE)
    term = F.expr(f"shiftleft(cast(1 as bigint), {_SCALE} - rho)")
    g = registers.groupBy(*keys).agg(
        F.sum(term.cast("decimal(38,0)")).alias("_s_hit"),
        F.count(F.lit(1)).alias("hit_registers"),
    )
    zeros = F.lit(m) - F.col("hit_registers")
    s_all = (
        F.col("_s_hit")
        + zeros.cast("decimal(38,0)")
        * F.lit(1 << _SCALE).cast("decimal(38,0)")
    ).cast("double")
    est_raw = F.lit(numer) / s_all
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((est_raw <= F.lit(2.5 * m)) & (zeros > F.lit(0)), lc).otherwise(
        est_raw
    )
    return g.select(
        *keys,
        est.alias("est_distinct"),
        est_raw.alias("est_raw"),
        F.col("hit_registers").cast("long").alias("hit_registers"),
        zeros.cast("long").alias("zero_registers"),
    )


def hll_count_distinct(
    df: DataFrame,
    value_col: str,
    p: int = 8,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """End-to-end approximate COUNT(DISTINCT value_col) [GROUP BY keys]."""
    return hll_estimate(
        hll_registers(df, value_col, p=p, key_cols=key_cols),
        p=p,
        key_cols=key_cols,
    )


class StreamingHLL:
    """Streaming accumulator over the same register construction — the
    `StreamingCountMin` pattern (sketch.py), with a STRONGER guarantee:
    register max-merge is order-insensitive AND idempotent, so the stream
    state equals the batch sketch over the union of every absorbed
    micro-batch EXACTLY (the CMS/MG candidate set is merge-order-dependent
    near the tail; HLL has no such tail). Re-delivered batches (at-least-
    once sources) cannot inflate the estimate, which makes this safe
    behind foreachBatch without exactly-once sinks.

    Driver state is m = 2^p ints, forever; each micro-batch costs ONE
    bounded collect of <= m (register, rho) rows — `hll_registers`'
    groupBy pre-merges in Spark, so driver traffic is independent of the
    batch's row or partition count."""

    def __init__(self, value_col: str = "token", p: int = 8) -> None:
        if not 4 <= p <= 16:
            raise ValueError(f"p must be in [4, 16], got {p}")
        self.value_col = value_col
        self.p = p
        self.regs = [0] * (1 << p)

    def absorb_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """foreachBatch hook: fold the micro-batch's pre-merged register
        rows into the state (element-wise max)."""
        for r in hll_registers(batch_df, self.value_col, p=self.p).collect():
            j, rho = r["register"], r["rho"]
            if rho > self.regs[j]:
                self.regs[j] = rho

    def estimate(self) -> float:
        """The hll_estimate math, mirrored exactly (exact-integer scaled
        harmonic sum in Python ints — no float summation order)."""
        import math

        m = 1 << self.p
        hit = sum(1 for r in self.regs if r > 0)
        s = sum(1 << (_SCALE - r) for r in self.regs if r > 0)
        s += (m - hit) * (1 << _SCALE)
        est = _alpha(m) * m * m * float(1 << _SCALE) / float(s)
        zeros = m - hit
        if est <= 2.5 * m and zeros > 0:
            return m * math.log(m / zeros)
        return est
