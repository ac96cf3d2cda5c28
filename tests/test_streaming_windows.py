"""Event-time streaming engine features (SURVEY §2.8 'engine features'
note): watermark + tumbling/session windows, bounded-state dedup, and the
applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eth2dgraph_spark.streaming.windows import (
    running_contract_counters,
    session_windows,
    stream_stream_join,
    streaming_dedup,
    windowed_block_stats,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _blocks(spark, n=10):
    rows = [
        (i, T0 + dt.timedelta(minutes=2 * i), 10 + i, 1_000_000 * (i + 1), 7.5 + i)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "number long, datetime timestamp, tx_count long, gas_used long, base_fee_per_gas double",
    )


def test_windowed_block_stats_batch_semantics(spark):
    # 10 blocks at 2-min spacing -> 4 tumbling 5-min windows (0,5,10,15)
    out = windowed_block_stats(_blocks(spark), window="5 minutes").orderBy("window_start")
    rows = out.collect()
    assert len(rows) == 4
    assert rows[0]["n_blocks"] == 3  # minutes 0,2,4
    assert rows[0]["n_txs"] == 10 + 11 + 12
    assert rows[1]["n_blocks"] == 2  # minutes 6,8


def test_sliding_window_variant(spark):
    out = windowed_block_stats(_blocks(spark), window="10 minutes", slide="5 minutes")
    # sliding windows overlap: every block lands in 2 windows
    assert out.agg(F.sum("n_blocks")).first()[0] == 20


def test_session_windows_gap_split(spark):
    rows = [
        ("c1", T0),
        ("c1", T0 + dt.timedelta(minutes=5)),   # same session (gap < 30m)
        ("c1", T0 + dt.timedelta(hours=2)),     # new session
        ("c2", T0),
    ]
    ev = spark.createDataFrame(rows, "contract string, ts timestamp")
    out = session_windows(ev, "contract", "ts", gap="30 minutes").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["contract"], []).append(r["n_events"])
    assert sorted(by_key["c1"]) == [1, 2]
    assert by_key["c2"] == [1]


def test_streaming_dedup_batch_semantics(spark):
    # per-KEY dedup: the same key at a DIFFERENT timestamp is still a
    # duplicate (the DashMap semantics) — the old (key, ts)-subset form
    # would have passed the 30-min-later row through
    rows = [("a", T0), ("a", T0), ("a", T0 + dt.timedelta(minutes=30)), ("b", T0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    assert streaming_dedup(df, ["k"], "ts").count() == 2


def test_streaming_dedup_across_micro_batches(spark, tmp_path):
    # real stream: the same key arriving in a LATER micro-batch (new ts)
    # must be dropped by the watermark-bounded per-key state
    import os

    landing = tmp_path / "dedup_landing"
    landing.mkdir()
    df1 = spark.createDataFrame([("a", T0), ("b", T0)], "k string, ts timestamp")
    df2 = spark.createDataFrame(
        [("a", T0 + dt.timedelta(minutes=5)), ("c", T0)], "k string, ts timestamp"
    )
    df1.coalesce(1).write.parquet(str(landing / "f1"))
    df2.coalesce(1).write.parquet(str(landing / "f2"))
    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(str(landing), "*"))
    )
    q = (
        streaming_dedup(stream, ["k"], "ts")
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .start()
    )
    assert q.awaitTermination(180)
    got = {r["k"] for r in spark.sql("SELECT k FROM dedup_sink").collect()}
    rows = spark.sql("SELECT k FROM dedup_sink").count()
    assert got == {"a", "b", "c"}
    assert rows == 3  # 'a' emitted once despite arriving in two batches


def test_running_contract_counters_stateful_stream(spark, tmp_path):
    """Real streaming run: two files arrive as separate micro-batches; the
    state must carry deploy/destroy counts across them."""
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    schema = "contract string, kind string, ts timestamp"
    batch1 = spark.createDataFrame(
        [("c1", "deploy", T0), ("c1", "destroy", T0), ("c2", "deploy", T0)], schema
    )
    batch1.coalesce(1).write.mode("append").parquet(str(landing))

    def sink(batch_df, batch_id):  # update-mode emissions -> append files
        batch_df.write.mode("append").parquet(out_dir)

    def run_once():
        stream = spark.readStream.schema(batch1.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(landing))
        q = (
            running_contract_counters(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)  # same checkpoint: state resumes
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    batch2 = spark.createDataFrame([("c1", "deploy", T0)], schema)
    batch2.coalesce(1).write.mode("append").parquet(str(landing))
    run_once()

    got = spark.read.parquet(out_dir)
    # last emission for c1 must show cumulative (2 deploys, 1 destroy)
    c1 = got.filter(F.col("contract") == "c1").orderBy(F.desc("deploy_count")).first()
    assert (c1["deploy_count"], c1["destroy_count"]) == (2, 1)
    c2 = got.filter(F.col("contract") == "c2").first()
    assert (c2["deploy_count"], c2["destroy_count"]) == (1, 0)


def test_stream_stream_join_batch_semantics(spark):
    # unified semantics: the same operator on batch frames pins the time-bound
    txs = spark.createDataFrame(
        [
            ("t1", T0),
            ("t2", T0 + dt.timedelta(minutes=30)),
            ("t3", T0 + dt.timedelta(hours=2)),
        ],
        "tx_hash string, tx_ts timestamp",
    )
    logs = spark.createDataFrame(
        [
            ("t1", T0 + dt.timedelta(minutes=2), "a"),   # within 5m of t1
            ("t1", T0 + dt.timedelta(minutes=20), "b"),  # outside ±5m -> dropped
            ("t2", T0 + dt.timedelta(minutes=27), "c"),  # within (3m before)
            ("t9", T0, "d"),                             # no matching tx
        ],
        "tx_hash string, log_ts timestamp, payload string",
    )
    out = stream_stream_join(txs, logs, "tx_hash", "tx_ts", "log_ts", within="5 minutes")
    got = sorted((r["tx_hash"], r["payload"]) for r in out.collect())
    assert got == [("t1", "a"), ("t2", "c")]
    assert "__r_tx_hash" not in out.columns


def test_stream_stream_join_real_streams(spark, tmp_path):
    # two file-source streams joined with state; results land in a parquet sink
    l_dir, r_dir = tmp_path / "l", tmp_path / "r"
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    txs = spark.createDataFrame(
        [("t1", T0), ("t2", T0 + dt.timedelta(minutes=1))],
        "tx_hash string, tx_ts timestamp",
    )
    logs = spark.createDataFrame(
        [
            ("t1", T0 + dt.timedelta(minutes=2), "a"),
            ("t2", T0 + dt.timedelta(minutes=30), "late"),  # outside ±5m
        ],
        "tx_hash string, log_ts timestamp, payload string",
    )
    txs.coalesce(1).write.parquet(str(l_dir))
    logs.coalesce(1).write.parquet(str(r_dir))

    ls = spark.readStream.schema(txs.schema).parquet(str(l_dir))
    rs = spark.readStream.schema(logs.schema).parquet(str(r_dir))
    joined = stream_stream_join(ls, rs, "tx_hash", "tx_ts", "log_ts", within="5 minutes")
    assert joined.isStreaming
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert [(r["tx_hash"], r["payload"]) for r in got.collect()] == [("t1", "a")]


def test_execute_stream_to_batch_equals_batch(spark, tmp_path):
    # the stream==batch property: the same windowed agg physically executed
    # as a stream (availableNow, complete-mode memory sink) must produce the
    # batch result — and the helper must prove the stream actually ran
    import pytest

    from eth2dgraph_spark.streaming.windows import execute_stream_to_batch

    blocks = _blocks(spark, 24)
    src = str(tmp_path / "blocks")
    blocks.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(blocks.schema).parquet(src)
    streamed = execute_stream_to_batch(
        windowed_block_stats(stream), query_name="wbs_gate_test"
    )
    batch = windowed_block_stats(blocks)
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(streamed) == key(batch)

    # an empty source still fires one (zero-row) trigger: the stream ran,
    # the result table is just empty — same as the batch agg on no rows
    empty_dir = str(tmp_path / "empty")
    import os

    os.makedirs(empty_dir)
    empty = spark.readStream.schema(blocks.schema).parquet(empty_dir)
    got = execute_stream_to_batch(windowed_block_stats(empty), query_name="wbs_gate_empty")
    assert got.count() == 0

    # a stream that fails outright must raise, not return a stale table
    with pytest.raises(Exception):
        execute_stream_to_batch(
            windowed_block_stats(
                spark.readStream.schema(blocks.schema).parquet(str(tmp_path / "missing"))
            ),
            query_name="wbs_gate_missing",
        )


def _ordered_landing(spark, tmp_path, batches, schema):
    """Write each batch as one parquet file with strictly increasing
    mtimes so the file stream source replays them in order."""
    import os
    import time

    landing = tmp_path / "landing"
    for i, rows in enumerate(batches, 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(landing / f"b{i}")
        )
    now = int(time.time())
    for i in range(1, len(batches) + 1):
        d = str(landing / f"b{i}")
        mt = now - 300 + i * 30
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (mt, mt))
    return os.path.join(str(landing), "*")


def test_append_mode_late_row_merge_vs_drop(spark, tmp_path):
    """Pin the MEASURED append-mode watermark semantics the windowed_append
    gate depends on: a late row merges into its window while that window's
    state is still live (arrives ONE batch after the watermark passed it),
    and is dropped only once the window was evicted in an earlier batch
    (arrives TWO batches after). Append mode stays exactly-once in both
    cases — the recreated-state double-emission never happens."""
    from eth2dgraph_spark.streaming.windows import execute_stream_append

    schema = "k string, ts timestamp"

    def run(batches, name):
        glob = _ordered_landing(spark, tmp_path / name, batches, schema)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(glob)
        )
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("s"), "k", "cnt")
        )
        out = execute_stream_append(
            agg,
            checkpoint_dir=str(tmp_path / name / "ckpt"),
            query_name=f"append_{name}",
        )
        return {(r["s"], r["k"]): r["cnt"] for r in out.collect()}

    h = dt.timedelta(hours=1)
    # 2 batches: late row (T0+5min) lands while window T0's state is live
    got = run(
        [
            [("x", T0), ("x", T0 + 10 * h)],
            [("x", T0 + dt.timedelta(minutes=5)), ("x", T0 + 10 * h + dt.timedelta(minutes=1))],
        ],
        "merge",
    )
    assert got[(T0, "x")] == 2  # merged, not dropped

    # 3 batches: window T0 evicted at the end of batch 2; the late row in
    # batch 3 is dropped and T0's window is NOT re-emitted
    got = run(
        [
            [("x", T0), ("x", T0 + 10 * h)],
            [("x", T0 + 20 * h)],
            [("x", T0 + dt.timedelta(minutes=5)), ("x", T0 + 30 * h)],
        ],
        "drop",
    )
    assert got[(T0, "x")] == 1  # dropped; emitted exactly once
    # holdback: the tail window (30h) is newer than max - 2h -> withheld
    assert (T0 + 30 * h, "x") not in got


def test_minhash_cross_pairs_stream_incremental_history(spark, tmp_path):
    """foreachBatch incremental near-dup: batch 2 must pair against docs
    that arrived in batch 1 (history grows per micro-batch), never against
    its own batch (no new x new), and the accumulated result must equal the
    closed-form union of per-batch BATCH runs."""
    from eth2dgraph_spark.pipeline.dedup import (
        minhash_cross_pairs,
        minhash_cross_pairs_stream,
    )

    h = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    b1 = [(101, "alpha beta gamma delta epsilon zeta eta theta")]
    # 201 is a near-dup of 101 (batch-1 doc, NOT in initial history);
    # 202/203 are near-dups of EACH OTHER only -> must produce no pair
    b2 = [
        (201, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (202, "red orange yellow green blue indigo violet"),
        (203, "red orange yellow green blue indigo violet ultraviolet"),
    ]
    glob = _ordered_landing(spark, tmp_path, [b1, b2], "doc_id long, text string")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(glob)
    )
    kw = dict(k=3, num_hashes=32, num_bands=8, threshold=0.3, max_band_bucket=None)
    got = minhash_cross_pairs_stream(
        stream, h, str(tmp_path / "work"), **kw
    )
    got_set = {(r["new_id"], r["hist_id"]) for r in got.collect()}

    b1df = spark.createDataFrame(b1, "doc_id long, text string")
    b2df = spark.createDataFrame(b2, "doc_id long, text string")
    want = minhash_cross_pairs(b1df, h, **kw).unionByName(
        minhash_cross_pairs(b2df, h.unionByName(b1df), **kw)
    )
    want_set = {(r["new_id"], r["hist_id"]) for r in want.collect()}
    assert got_set == want_set
    assert (201, 101) in got_set  # history grew: batch-2 doc paired a batch-1 doc
    assert (201, 1) in got_set  # and still pairs the original history
    assert not any(a in (202, 203) and b in (202, 203) for a, b in got_set)  # no new x new


def test_append_stream_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-resume proof for append mode: run the windowed aggregation
    over batch 1 only, stop, then restart AGAINST THE SAME CHECKPOINT with
    batch 2 landed. The union of the two runs' emissions must equal the
    uninterrupted run, with zero overlap — no duplicate and no lost window
    across the restart (the real-cluster failure the reference's
    delete-then-reinsert guards against, src/extraction/stream.rs:70-166)."""
    import os

    from eth2dgraph_spark.streaming.windows import (
        execute_stream_append,
        execute_stream_append_to_files,
    )

    rows = [
        (i, T0 + dt.timedelta(minutes=7 * i), "t%d" % (i % 2), float(i)) for i in range(40)
    ]
    schema = "event_id long, ts timestamp, event_type string, value double"
    half1, half2 = rows[:20], rows[20:]

    def agg(stream):
        return (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("v"))
            .select(F.col("w.start").alias("ws"), "event_type", "cnt", "v")
        )

    def read_landing(glob):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(glob)
        )

    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731

    # uninterrupted reference run (memory-sink helper: the established
    # semantics both sinks must agree on)
    glob_full = _ordered_landing(spark, tmp_path / "full", [half1, half2], schema)
    want = key(
        execute_stream_append(
            agg(read_landing(glob_full)),
            checkpoint_dir=str(tmp_path / "ckpt_full"),
            query_name="restart_ref",
        )
    )

    # phase 1: only batch 1 exists; availableNow drains it and STOPS
    landing2 = tmp_path / "resume"
    glob2 = _ordered_landing(spark, landing2, [half1], schema)
    ckpt = str(tmp_path / "ckpt_resume")
    out = str(tmp_path / "out_resume")
    p1 = key(execute_stream_append_to_files(agg(read_landing(glob2)), out, ckpt))
    assert len(p1) > 0  # batch 1 closed at least one window before the stop

    # phase 2: batch 2 lands; restart from the SAME checkpoint + sink
    import time

    b2dir = landing2 / "landing" / "b2"
    spark.createDataFrame(half2, schema).coalesce(1).write.parquet(str(b2dir))
    mt = int(time.time())
    for fn in os.listdir(str(b2dir)):
        os.utime(os.path.join(str(b2dir), fn), (mt, mt))
    merged = key(execute_stream_append_to_files(agg(read_landing(glob2)), out, ckpt))

    assert merged == want  # exactly-once across the restart: no dup, no loss
    assert set(p1) <= set(merged)  # phase-1 emissions survived the restart
    # idempotent re-resume with NO new data: nothing is re-emitted
    again = key(execute_stream_append_to_files(agg(read_landing(glob2)), out, ckpt))
    assert again == merged


def test_fingerprint_cross_pairs_stream_incremental_history(spark, tmp_path):
    """Multimodal ingest near-dup: batch-2 clips must pair against clips
    that arrived in batch 1 (fingerprint history grows per micro-batch),
    never against their own batch, and the accumulated result must equal
    the closed-form union of per-batch BATCH runs. Real WAV bytes end to
    end — the history stores only (asset_id, ahash) longs."""
    from tests.test_pipeline import _wav_group_clip

    from eth2dgraph_spark.pipeline.multimodal import (
        ASSET_SCHEMA,
        audio_fingerprints,
        fingerprint_cross_pairs,
        fingerprint_cross_pairs_stream,
    )

    def asset(aid, g):
        return (aid, "audio", "audio/wav", bytearray(_wav_group_clip(g)), None, None, None)

    h_rows = [asset(1, 0), asset(2, 1)]
    b1 = [asset(101, 7)]          # group 7: NOT in initial history
    b2 = [
        asset(201, 7),            # pairs ONLY if history grew with 101
        asset(202, 0),            # pairs the original history (asset 1)
        asset(203, 9), asset(204, 9),  # same-batch dup: must NOT pair
    ]
    h = spark.createDataFrame(h_rows, ASSET_SCHEMA)
    hist_hashes = audio_fingerprints(h, frame_ms=200).select("asset_id", "ahash")
    glob = _ordered_landing(
        spark, tmp_path, [b1, b2], ASSET_SCHEMA
    )
    stream = (
        spark.readStream.schema(ASSET_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(glob)
    )
    fp = lambda df: audio_fingerprints(df, frame_ms=200)  # noqa: E731
    got = fingerprint_cross_pairs_stream(
        stream, hist_hashes, str(tmp_path / "work"), fingerprinter=fp, min_shared=2
    )
    got_set = {(r["new_id"], r["hist_id"], r["n_shared"]) for r in got.collect()}

    b1df = spark.createDataFrame(b1, ASSET_SCHEMA)
    b2df = spark.createDataFrame(b2, ASSET_SCHEMA)
    want = fingerprint_cross_pairs(fp(b1df), hist_hashes, min_shared=2).unionByName(
        fingerprint_cross_pairs(
            fp(b2df), hist_hashes.unionByName(fp(b1df).select("asset_id", "ahash")),
            min_shared=2,
        )
    )
    want_set = {(r["new_id"], r["hist_id"], r["n_shared"]) for r in want.collect()}
    assert got_set == want_set
    assert (201, 101, 3) in got_set  # history grew across micro-batches
    assert (202, 1, 3) in got_set  # original history still pairs
    assert not any(a in (203, 204) or b == 203 for a, b, _ in got_set)  # no new x new


def test_fingerprint_cross_pairs_stream_video_fingerprinter(spark, tmp_path):
    """The ingest stream is fingerprinter-generic: plugging
    video_frame_phashes (hash_col='phash') in place of audio works
    unchanged — real AVI bytes, history grows across micro-batches."""
    import numpy as np

    from eth2dgraph_spark.functions.avi import encode_avi
    from eth2dgraph_spark.pipeline.multimodal import (
        ASSET_SCHEMA,
        fingerprint_cross_pairs_stream,
        video_frame_phashes,
    )

    def clip(seed):
        rng = np.random.default_rng(seed)
        return encode_avi(
            rng.integers(0, 256, size=(3, 16, 16, 3), dtype=np.uint8), fps=1
        )

    def asset(aid, seed):
        return (aid, "video", "video/avi", bytearray(clip(seed)), None, None, 2500)

    h = spark.createDataFrame([asset(1, 11)], ASSET_SCHEMA)
    fp = lambda df: video_frame_phashes(df, every_ms=1000)  # noqa: E731
    hist_hashes = fp(h).select("asset_id", "phash")
    b1 = [asset(101, 77)]                 # new clip, not in history
    b2 = [asset(201, 77), asset(202, 11)]  # dup of b1's 101 AND of history's 1
    glob = _ordered_landing(spark, tmp_path, [b1, b2], ASSET_SCHEMA)
    stream = (
        spark.readStream.schema(ASSET_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(glob)
    )
    got = fingerprint_cross_pairs_stream(
        stream, hist_hashes, str(tmp_path / "work"),
        fingerprinter=fp, min_shared=2, hash_col="phash",
    )
    got_set = {(r["new_id"], r["hist_id"], r["n_shared"]) for r in got.collect()}
    assert got_set == {(201, 101, 3), (202, 1, 3)}


def test_fingerprint_cross_pairs_stream_image_jpeg_fingerprinter(spark, tmp_path):
    """The image arm of the generic ingest stream (the image_dedup_stream
    gate's kernel): phash_features as the fingerprinter over REAL
    baseline-JPEG container bytes (stdlib decode), ONE hash per image so
    min_shared=1. History must grow across micro-batches."""
    from eth2dgraph_spark.functions.jpeg import synthetic_group_jpeg
    from eth2dgraph_spark.pipeline.multimodal import (
        ASSET_SCHEMA,
        fingerprint_cross_pairs_stream,
        phash_features,
    )

    def asset(aid, group):
        return (
            aid, "image", "image/jpeg",
            bytearray(synthetic_group_jpeg(group)), 32, 32, None,
        )

    h = spark.createDataFrame([asset(1, 11)], ASSET_SCHEMA)
    hist_hashes = phash_features(h).select("asset_id", "phash")
    b1 = [asset(101, 7)]                  # new group, not in history
    b2 = [asset(201, 7), asset(202, 11)]  # dup of b1's 101 AND of history's 1
    glob = _ordered_landing(spark, tmp_path, [b1, b2], ASSET_SCHEMA)
    stream = (
        spark.readStream.schema(ASSET_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(glob)
    )
    got = fingerprint_cross_pairs_stream(
        stream, hist_hashes, str(tmp_path / "work"),
        fingerprinter=phash_features, min_shared=1, hash_col="phash",
    )
    got_set = {(r["new_id"], r["hist_id"], r["n_shared"]) for r in got.collect()}
    assert got_set == {(201, 101, 1), (202, 1, 1)}


def _land_later_batch(spark, landing, name, rows, schema):
    """Land one more parquet batch with a NOW mtime so a resumed file
    stream sees it after everything already processed."""
    import os
    import time

    d = landing / "landing" / name
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d))
    mt = int(time.time())
    for fn in os.listdir(str(d)):
        os.utime(os.path.join(str(d), fn), (mt, mt))


def test_minhash_cross_pairs_stream_kill_and_resume(spark, tmp_path):
    """Kill-and-resume proof for the HISTORY-TABLE stream: drain batch 1
    (availableNow stops the query), land batch 2, re-invoke against the
    SAME work_dir (checkpoint + history + pairs). The resumed run must not
    re-pair batch 1 (no duplicates), must not lose it (batch 2 pairs
    against batch-1 docs via the history that survived the restart), and
    must not wipe the grown history back to the initial corpus — the
    resume bug the _batch-partitioned dynamic-overwrite sinks fix."""
    from eth2dgraph_spark.pipeline.dedup import (
        minhash_cross_pairs,
        minhash_cross_pairs_stream,
    )

    schema = "doc_id long, text string"
    h = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta")], schema
    )
    b1 = [(101, "alpha beta gamma delta epsilon zeta eta theta")]
    b2 = [(201, "alpha beta gamma delta epsilon zeta eta theta iota")]
    kw = dict(k=3, num_hashes=32, num_bands=8, threshold=0.3, max_band_bucket=None)

    def read_landing(glob):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(glob)
        )

    # uninterrupted reference run over both batches
    glob_full = _ordered_landing(spark, tmp_path / "full", [b1, b2], schema)
    want = minhash_cross_pairs_stream(
        read_landing(glob_full), h, str(tmp_path / "work_full"), **kw
    )
    want_set = sorted(map(tuple, want.collect()))
    assert (201, 101) in {(a, b) for a, b, *_ in want_set}  # cross-batch pair

    # phase 1: only batch 1 exists; availableNow drains it and stops
    glob = _ordered_landing(spark, tmp_path / "res", [b1], schema)
    work = str(tmp_path / "work_res")
    p1 = minhash_cross_pairs_stream(read_landing(glob), h, work, **kw)
    p1_set = sorted(map(tuple, p1.collect()))
    assert {(a, b) for a, b, *_ in p1_set} == {(101, 1)}

    # phase 2: batch 2 lands; resume against the same checkpoint + tables
    _land_later_batch(spark, tmp_path / "res", "b2", b2, schema)
    merged = minhash_cross_pairs_stream(read_landing(glob), h, work, **kw)
    assert sorted(map(tuple, merged.collect())) == want_set

    # idempotent re-resume with NO new data: nothing is re-emitted
    again = minhash_cross_pairs_stream(read_landing(glob), h, work, **kw)
    assert sorted(map(tuple, again.collect())) == want_set


def test_fingerprint_cross_pairs_stream_kill_and_resume(spark, tmp_path):
    """Same kill-and-resume contract for the multimodal ingest stream:
    fingerprints of committed batches survive the restart in the history
    table, committed pair partitions are not re-appended, and the resumed
    total equals the uninterrupted run exactly."""
    from tests.test_pipeline import _wav_group_clip

    from eth2dgraph_spark.pipeline.multimodal import (
        ASSET_SCHEMA,
        audio_fingerprints,
        fingerprint_cross_pairs_stream,
    )

    def asset(aid, g):
        return (aid, "audio", "audio/wav", bytearray(_wav_group_clip(g)), None, None, None)

    h = spark.createDataFrame([asset(1, 0)], ASSET_SCHEMA)
    hist_hashes = audio_fingerprints(h, frame_ms=200).select("asset_id", "ahash")
    b1 = [asset(101, 7)]
    b2 = [asset(201, 7), asset(202, 0)]  # 201 pairs batch-1's 101; 202 pairs 1

    def read_landing(glob):
        return (
            spark.readStream.schema(ASSET_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(glob)
        )

    fp = lambda df: audio_fingerprints(df, frame_ms=200)  # noqa: E731

    glob_full = _ordered_landing(spark, tmp_path / "full", [b1, b2], ASSET_SCHEMA)
    want = fingerprint_cross_pairs_stream(
        read_landing(glob_full), hist_hashes, str(tmp_path / "work_full"),
        fingerprinter=fp, min_shared=2,
    )
    want_set = sorted(map(tuple, want.collect()))
    assert (201, 101, 3) in want_set  # cross-batch pair exists in the reference

    glob = _ordered_landing(spark, tmp_path / "res", [b1], ASSET_SCHEMA)
    work = str(tmp_path / "work_res")
    p1 = fingerprint_cross_pairs_stream(
        read_landing(glob), hist_hashes, work, fingerprinter=fp, min_shared=2
    )
    assert sorted(map(tuple, p1.collect())) == []  # group 7 unseen so far

    _land_later_batch(spark, tmp_path / "res", "b2", b2, ASSET_SCHEMA)
    merged = fingerprint_cross_pairs_stream(
        read_landing(glob), hist_hashes, work, fingerprinter=fp, min_shared=2
    )
    assert sorted(map(tuple, merged.collect())) == want_set

    again = fingerprint_cross_pairs_stream(
        read_landing(glob), hist_hashes, work, fingerprinter=fp, min_shared=2
    )
    assert sorted(map(tuple, again.collect())) == want_set
