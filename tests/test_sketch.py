"""Count-min + Misra-Gries heavy hitters (pipeline/sketch.py): the sketch
estimate is a conservative upper bound, results are invariant to input
partitioning (element-wise sketch sums commute), and per-partition state is
bounded by cap regardless of token cardinality."""

from __future__ import annotations

import pandas as pd

from eth2dgraph_spark.pipeline import sketch


def _tokens(spark, counts: dict[str, int], partitions: int = 4):
    rows = [(t,) for t, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "token string").repartition(partitions)


def test_topk_matches_exact_on_small_input(spark):
    counts = {f"tok{i}": 5 * (40 - i) for i in range(40)}  # distinct freqs
    df = _tokens(spark, counts)
    got = sketch.countmin_topk(df, "token", k=10).collect()
    assert [r["token"] for r in got] == [f"tok{i}" for i in range(10)]
    # conservative estimate: never below the true count
    for r in got:
        assert r["cms_est"] >= counts[r["token"]]


def test_estimates_invariant_to_partitioning(spark):
    counts = {f"w{i}": (i % 7) + 1 for i in range(200)}
    a = sketch.countmin_topk(_tokens(spark, counts, 2), "token", k=15).collect()
    b = sketch.countmin_topk(_tokens(spark, counts, 13), "token", k=15).collect()
    assert sorted((r["token"], r["cms_est"]) for r in a) == sorted(
        (r["token"], r["cms_est"]) for r in b
    )


def test_partials_bounded_one_row_per_partition(spark):
    counts = {f"x{i}": 2 for i in range(500)}
    df = _tokens(spark, counts, 5)
    partials = sketch.countmin_partials(df, "token", cap=64).collect()
    assert len(partials) == 5
    for r in partials:
        assert len(r["cand_token"]) <= 64  # MG capacity respected
        assert len(r["sketch"]) == sketch.DEFAULT_DEPTH * sketch.DEFAULT_WIDTH


def test_countmin_estimate_dataframe_api(spark):
    # the point-query path: attach cms_est to an arbitrary token frame via
    # the merged sketch; hashing is in-plan (xxhash64 feeding the pandas
    # UDF), so estimates must match the driver-side topk estimates exactly
    counts = {f"tok{i}": 4 * (20 - i) for i in range(20)}
    df = _tokens(spark, counts)
    partials = sketch.countmin_partials(df, "token").persist()
    merged = sketch.merge_sketch(partials, sketch.DEFAULT_DEPTH, sketch.DEFAULT_WIDTH)
    cands = sketch.merged_candidates(partials)
    got = {
        r["token"]: r["cms_est"]
        for r in sketch.countmin_estimate(cands, merged).collect()
    }
    partials.unpersist()
    top = dict(sketch.countmin_topk(df, "token", k=20).collect())
    for tok, true_count in counts.items():
        assert got[tok] >= true_count  # conservative
        assert got[tok] == top[tok]  # same hash family as the driver path


def test_streaming_estimate_unseen_token_uses_jvm_hashes(spark):
    counts = {"alpha": 10, "beta": 3}
    acc = sketch.StreamingCountMin("token")
    acc.absorb_batch(_tokens(spark, counts, 2))
    assert acc.estimate("alpha") >= 10
    # a token never absorbed is not in the candidate hash map: the estimate
    # must come from the same JVM xxhash64 family via the captured session
    # (>=0 always; ==0 unless it collides in all rows)
    assert acc.estimate("never-seen-token") >= 0
    assert "never-seen-token" in acc.hashes  # cached after first lookup


def test_mg_batched_compaction_keeps_heavy_keys():
    # the batched Misra-Gries compaction must keep a key whose frequency
    # exceeds N/cap even under capacity pressure from a long tail
    mg: dict[str, int] = {}
    heavy = {"HEAVY": 500}
    sketch._mg_update(mg, pd.Series(heavy), cap=10)
    for start in range(0, 200, 20):
        tail = {f"t{j}": 1 for j in range(start, start + 20)}
        sketch._mg_update(mg, pd.Series(tail), cap=10)
    assert "HEAVY" in mg
    assert mg["HEAVY"] >= 500 - 200  # undercount bounded by total tail mass


def test_streaming_accumulator_equals_batch(spark, tmp_path):
    # mergeability across micro-batches: a file stream consumed one file per
    # trigger through StreamingCountMin must land on the same top-k, with
    # the same estimates, as the one-shot batch sketch — CMS cell merges are
    # exact sums regardless of how rows were batched
    counts = {f"tok{i}": 3 * (30 - i) for i in range(30)}
    df = _tokens(spark, counts, 4)
    src = str(tmp_path / "tok_stream")
    # two separate files -> two micro-batches with maxFilesPerTrigger=1
    df.limit(0).write.parquet(src)  # init dir with schema
    half = df.randomSplit([0.5, 0.5], seed=7)
    for part in half:
        part.coalesce(1).write.mode("append").parquet(src)

    acc = sketch.StreamingCountMin("token")
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

    batch_top = [(r["token"], r["cms_est"]) for r in
                 sketch.countmin_topk(spark.read.parquet(src), "token", k=10).collect()]
    assert acc.topk(10) == batch_top
    # state bound: candidates never exceed cap
    assert len(acc.mg) <= sketch.DEFAULT_CAP
