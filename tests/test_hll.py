"""HyperLogLog sketch: register state pinned against a from-scratch pure-
Python reference (same md5-60bit hash), estimate accuracy on both the
raw-harmonic and linear-counting branches, merge associativity, partition
independence, and NULL semantics."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import hll


def _ref_registers(values: list[str], p: int) -> dict[int, int]:
    m = 1 << p
    wbits = 60 - p
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        j = h % m
        w = h >> p
        rho = (wbits + 1) - w.bit_length() if w > 0 else wbits + 1
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def _ref_estimate(regs: dict[int, int], p: int) -> float:
    m = 1 << p
    s = sum(2 ** (61 - r) for r in regs.values()) + (m - len(regs)) * 2**61
    est = hll._alpha(m) * m * m * float(2**61) / float(s)
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros > 0:
        import math

        return m * math.log(m / zeros)
    return est


@pytest.fixture(scope="module")
def words(spark):
    vals = [f"tok-{i * 2654435761 % 99991}" for i in range(400)]
    return spark.createDataFrame([(v,) for v in vals], "v string"), vals


def test_registers_match_pure_python_reference(spark, words):
    df, vals = words
    got = {
        r["register"]: r["rho"]
        for r in hll.hll_registers(df, "v", p=6).collect()
    }
    assert got == _ref_registers(vals, 6)


def test_estimate_matches_reference_and_is_calibrated(spark, words):
    df, vals = words
    row = hll.hll_count_distinct(df, "v", p=8).collect()[0]
    assert row["est_distinct"] == pytest.approx(_ref_estimate(_ref_registers(vals, 8), 8))
    true_n = len(set(vals))
    # sigma ~ 1.04/sqrt(256) = 6.5%; allow 3.5 sigma
    assert abs(row["est_distinct"] - true_n) / true_n < 0.23


def test_linear_counting_branch_small_cardinality(spark):
    df = spark.range(40).select(F.concat(F.lit("u"), "id").alias("v"))
    row = hll.hll_count_distinct(df, "v", p=8).collect()[0]
    assert row["zero_registers"] > 0
    assert row["est_distinct"] != row["est_raw"]  # LC branch fired
    assert abs(row["est_distinct"] - 40) / 40 < 0.12


def test_raw_branch_large_cardinality(spark):
    df = spark.range(5000).select(F.concat(F.lit("x"), "id").alias("v"))
    row = hll.hll_count_distinct(df, "v", p=8).collect()[0]
    assert row["est_distinct"] == row["est_raw"]  # past 2.5m: no correction
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.23


def test_merge_equals_whole_and_is_idempotent(spark, words):
    df, vals = words
    half1, half2 = df.where(F.length("v") % 2 == 0), df.where(F.length("v") % 2 == 1)
    merged = hll.hll_merge(
        hll.hll_registers(half1, "v", p=7),
        hll.hll_registers(half2, "v", p=7),
        hll.hll_registers(half2, "v", p=7),  # overlap: max is idempotent
    )
    whole = hll.hll_registers(df, "v", p=7)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_partition_independence(spark, words):
    df, vals = words
    a = sorted(map(tuple, hll.hll_registers(df, "v", p=6).collect()))
    b = sorted(map(tuple, hll.hll_registers(df.repartition(7), "v", p=6).collect()))
    assert a == b


def test_nulls_ignored_and_keyed_equals_sliced(spark):
    rows = [(i % 3, f"v{i}") for i in range(90)] + [(0, None), (1, None)]
    df = spark.createDataFrame(rows, "k int, v string")
    keyed = {
        r["k"]: r["est_distinct"]
        for r in hll.hll_count_distinct(df, "v", p=8, key_cols=["k"]).collect()
    }
    assert set(keyed) == {0, 1, 2}
    for k in (0, 1, 2):
        solo = hll.hll_count_distinct(df.where(F.col("k") == k), "v", p=8).collect()[0]
        assert keyed[k] == solo["est_distinct"]


def test_bad_p_raises(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hll.hll_registers(df, "v", p=2)


def test_streaming_hll_equals_batch_exactly(spark, tmp_path):
    """A file stream absorbed one file per trigger through StreamingHLL
    lands on EXACTLY the batch estimate (register max-merge is order-
    insensitive and idempotent), and re-absorbing a batch changes
    nothing (at-least-once safety)."""
    from pyspark.sql import functions as F

    from eth2dgraph_spark.pipeline.hll import StreamingHLL, hll_count_distinct

    df = spark.range(3000).select(
        F.concat(F.lit("u"), (F.col("id") % 700).cast("string")).alias("v")
    )
    src = str(tmp_path / "hll_stream")
    df.limit(0).write.parquet(src)
    for part in df.randomSplit([0.5, 0.5], seed=3):
        part.coalesce(1).write.mode("append").parquet(src)

    acc = StreamingHLL("v", p=8)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(lambda b, bid: acc.absorb_batch(b, bid))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(180)

    batch = hll_count_distinct(spark.read.parquet(src), "v", p=8).collect()[0]
    assert acc.estimate() == batch["est_distinct"]  # exact, not approx
    # idempotence under redelivery
    before = acc.estimate()
    acc.absorb_batch(spark.read.parquet(src))
    assert acc.estimate() == before
    # and the estimate is calibrated on 700 true distincts
    assert abs(acc.estimate() - 700) / 700 < 0.23


def test_small_m_alpha_branches_match_reference(spark):
    """The piecewise alpha constants (m = 16/32/64) flow through the
    Spark estimate identically to the pure-Python mirror."""
    vals = [f"w{i*2654435761 % 9973}" for i in range(250)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    for p in (4, 5, 6):
        got = hll.hll_count_distinct(df, "v", p=p).collect()[0]
        want = _ref_estimate(_ref_registers(vals, p), p)
        assert got["est_distinct"] == pytest.approx(want, abs=0.0), p
