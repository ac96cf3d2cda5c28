"""Sequence packing (pipeline/pack.py): deterministic shard-parallel
concat-then-chunk; offsets bounded by budget; overflow only from the
boundary-straddling document."""

from __future__ import annotations

import pytest

from eth2dgraph_spark.pipeline.pack import greedy_pack, pack_stats


def _docs(spark, n=60, partitions=3):
    rows = [(i, "w " * ((i % 9) + 1)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(partitions)
    from eth2dgraph_spark.pipeline.text import token_count

    return token_count(df)


def test_pack_deterministic_and_partition_invariant(spark):
    a = greedy_pack(_docs(spark, partitions=2), budget=16, num_shards=3).collect()
    b = greedy_pack(_docs(spark, partitions=7), budget=16, num_shards=3).collect()
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(a) == key(b)


def test_pack_offsets_and_chunk_semantics(spark):
    budget = 16
    packed = greedy_pack(_docs(spark), budget=budget, num_shards=3)
    rows = packed.collect()
    # first-token offset always inside the chunk
    assert all(0 <= r["pack_offset"] < budget for r in rows)
    # within a pack, docs tile contiguously: offsets + lengths chain,
    # except the last doc may straddle into the next chunk
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, docs in by_pack.items():
        docs.sort(key=lambda r: r["pack_offset"])
        for prev, nxt in zip(docs, docs[1:]):
            assert prev["pack_offset"] + prev["n_tokens"] == nxt["pack_offset"]
    # every pack except possibly the last one per shard is filled to at
    # least the budget (counting the straddling doc's spill)
    stats = {r["pack_id"]: r for r in pack_stats(packed, budget).collect()}
    last_per_shard = {}
    for pid in stats:
        shard = pid // (1 << 40)
        last_per_shard[shard] = max(last_per_shard.get(shard, -1), pid)
    for pid, s in stats.items():
        docs = by_pack[pid]
        end = max(r["pack_offset"] + r["n_tokens"] for r in docs)
        if pid != last_per_shard[pid // (1 << 40)]:
            assert end >= budget  # chunk full (straddler included)


def test_pack_null_and_zero_tokens_clamped(spark):
    # null / zero token counts clamp to 1 so pack offsets stay unique
    # (ADVICE round 4: a zero-width doc would share its offset with the
    # next doc and make materialize_packs' within-pack order ambiguous)
    rows = [(1, None), (2, 0), (3, 5), (4, -2)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    packed = greedy_pack(df, token_col="n", budget=8, num_shards=1).collect()
    assert all(r["n_tokens"] >= 1 for r in packed)
    offs = [(r["pack_id"], r["pack_offset"]) for r in packed]
    assert len(offs) == len(set(offs))  # unique offsets within packs


def test_pack_default_shards_scale_with_input_and_windows_parallelize(spark):
    docs = _docs(spark, n=200, partitions=8)
    # default num_shards tracks the input's partition count — and warns,
    # because that makes pack assignment depend on physical file layout
    with pytest.warns(UserWarning, match="auto"):
        packed = greedy_pack(docs, budget=16)
    shards = {r["shard"] for r in packed.select("shard").distinct().collect()}
    assert len(shards) > 1 and max(shards) < 8
    # the window is partitioned by shard (parallel sorts), never a single
    # global-sort partition
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        packed.explain("formatted")
    plan = buf.getvalue()
    assert "partitionspec: [shard" in plan.lower().replace(" ", "").replace(
        "partitionspec:[shard", "partitionspec: [shard"
    ) or "hashpartitioning(shard" in plan.lower()


def test_materialize_packs_ordered_concat(spark):
    from eth2dgraph_spark.pipeline.pack import materialize_packs

    docs = _docs(spark, n=30)
    packed = greedy_pack(docs, budget=16, num_shards=2)
    seqs = {r["pack_id"]: r for r in materialize_packs(docs, packed).collect()}
    # reconstruct expected order from pack assignments
    by_pack: dict = {}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in packed.collect():
        by_pack.setdefault(r["pack_id"], []).append((r["pack_offset"], r["doc_id"]))
    for pid, members in by_pack.items():
        want = " ".join(texts[d] for _, d in sorted(members))
        assert seqs[pid]["text"] == want
        assert seqs[pid]["n_docs"] == len(members)
