"""Deterministic split operators (pipeline/split.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline.split import hash_split, sample_fraction, stratified_split
from eth2dgraph_spark.sources.testdata import read_table

SF = "/root/testdata/sf0.01"


def test_hash_split_partitions_all_rows(spark):
    d = read_table(spark, SF, "documents")
    out = hash_split(d)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = d.count()
    assert sum(counts.values()) == total  # every row labeled, none duplicated
    # ~90/5/5 within loose tolerance (hash is uniform, n=~500)
    assert counts["train"] / total > 0.8
    assert 0 < counts.get("val", 0) < total * 0.15
    assert 0 < counts.get("test", 0) < total * 0.15


def test_hash_split_deterministic_and_append_stable(spark):
    d = read_table(spark, SF, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(d).select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d.repartition(7)).select("doc_id", "split").collect()}
    assert a == b  # invariant to partitioning / rerun
    # appending rows must not move existing assignments
    half = d.filter(F.col("doc_id") % 2 == 0)
    c = {r["doc_id"]: r["split"] for r in hash_split(half).select("doc_id", "split").collect()}
    assert all(a[k] == v for k, v in c.items())


def test_hash_split_salt_changes_assignment(spark):
    d = read_table(spark, SF, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(d).select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d, salt="v2").select("doc_id", "split").collect()}
    assert a != b


def test_sample_fraction_subset_semantics(spark):
    d = read_table(spark, SF, "documents")
    s10 = {r["doc_id"] for r in sample_fraction(d, 0.1).select("doc_id").collect()}
    s20 = {r["doc_id"] for r in sample_fraction(d, 0.2).select("doc_id").collect()}
    assert s10 <= s20  # threshold sampling nests: smaller fraction ⊂ larger
    n = d.count()
    assert 0.03 * n < len(s10) < 0.2 * n


def test_stratified_split_exact_proportions(spark):
    d = read_table(spark, SF, "documents")
    out = stratified_split(d, "lang")
    per = (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("tr"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("va"),
        )
        .collect()
    )
    import math

    for r in per:
        assert r["tr"] == math.ceil(r["n"] * 0.9)  # exact cut per stratum
        assert r["va"] == math.ceil(r["n"] * 0.95) - math.ceil(r["n"] * 0.9)


def test_split_rejects_bad_fractions(spark):
    d = read_table(spark, SF, "documents")
    import pytest

    with pytest.raises(ValueError):
        hash_split(d, fractions={"train": 0.5, "val": 0.1})


def test_sample_by_source_nested_and_deterministic(spark):
    from eth2dgraph_spark.pipeline.split import sample_by_source

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    half = {r["doc_id"] for r in sample_by_source(d, "lang", {"de": 0.5}).collect()}
    quarter = {r["doc_id"] for r in sample_by_source(d, "lang", {"de": 0.25}).collect()}
    # en untouched at default 1.0; de downsampled
    assert {i for i in range(400) if i % 2 == 0} <= half
    n_de_half = sum(1 for i in half if i % 2 == 1)
    assert 60 <= n_de_half <= 140  # ~100 of 200 at rate 0.5
    # nested thresholds: the 0.25 kept set is a subset of the 0.5 kept set
    assert quarter <= half
    # deterministic across runs
    again = {r["doc_id"] for r in sample_by_source(d, "lang", {"de": 0.5}).collect()}
    assert again == half
    import pytest

    with pytest.raises(ValueError):
        sample_by_source(d, "lang", {"de": 1.5})


def test_stratified_split_exact_quota_at_float_boundary(spark):
    # 60 * (0.9 + 0.05) = 57.00000000000001 in accumulated doubles: a naive
    # ceil put 58 rows in train+val (4 val, 2 test) instead of the exact
    # 54/3/3 quota the function documents — the rounded boundary fixes it
    from collections import Counter

    from eth2dgraph_spark.pipeline.split import stratified_split

    rows = [(i, "en") for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    got = Counter(r["split"] for r in stratified_split(d, "lang").collect())
    assert got == {"train": 54, "val": 3, "test": 3}


def test_split_null_id_fails_loud(spark):
    # a null id would silently land ALL malformed rows in the last label
    # (hash comparisons are null -> otherwise-branch) — it must raise
    import pytest

    from eth2dgraph_spark.pipeline.split import hash_split, sample_fraction

    d = spark.createDataFrame([(None,), (1,)], "doc_id long")
    with pytest.raises(Exception, match="null doc_id"):
        hash_split(d).collect()
    with pytest.raises(Exception, match="null doc_id"):
        sample_fraction(d, 0.5).collect()


def test_temperature_mix_rates_reference_and_sample(spark):
    """alpha<1 upweights rare sources; budget solves rates; the composed
    sample respects per-source nested thresholds."""
    import pytest

    from eth2dgraph_spark.pipeline.split import temperature_mix_rates, temperature_sample

    rows = (
        [(i, "big") for i in range(80)]
        + [(i + 100, "mid") for i in range(15)]
        + [(i + 200, "small") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    alpha, budget = 0.5, 40
    got = {
        r["source"]: (r["n_docs"], r["p"], r["mix_weight"], r["sample_rate"])
        for r in temperature_mix_rates(df, "source", alpha, budget).collect()
    }
    n = {"big": 80, "mid": 15, "small": 5}
    N = 100
    Z = sum((c / N) ** alpha for c in n.values())
    for s, c in n.items():
        q = (c / N) ** alpha / Z
        assert got[s][0] == c
        assert got[s][1] == pytest.approx(c / N, rel=1e-12)
        assert got[s][2] == pytest.approx(q, rel=1e-12)
        assert got[s][3] == pytest.approx(min(1.0, budget * q / c), rel=1e-12)
    # rare sources get a HIGHER sampling rate than common ones
    assert got["small"][3] > got["mid"][3] > got["big"][3]
    kept = temperature_sample(df, "source", alpha, budget).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # nested: doubling the budget only ADDS rows per source
    kept2 = temperature_sample(df, "source", alpha, budget * 2).collect()
    by_src2 = {}
    for r in kept2:
        by_src2.setdefault(r["source"], set()).add(r["doc_id"])
    for s in by_src:
        assert by_src[s] <= by_src2.get(s, set()), s


def test_cap_per_key_reference_and_determinism(spark):
    """cap_per_key keeps exactly the k smallest md5(id||salt) rows per key
    (pure-Python pin), caps at population when the key is small, and is
    invariant to partitioning and to appends of higher-hash rows."""
    import hashlib

    from eth2dgraph_spark.pipeline.split import cap_per_key

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(60)] + [(100, "d")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    k = 5
    got = {
        (r["k"], r["doc_id"])
        for r in cap_per_key(df, ["k"], k=k, id_col="doc_id").collect()
    }

    by_key: dict[str, list[tuple[str, int]]] = {}
    for i, key in rows:
        h = hashlib.md5(f"{i}:cap-v1".encode()).hexdigest()
        by_key.setdefault(key, []).append((h, i))
    want = {
        (key, i)
        for key, hs in by_key.items()
        for _, i in sorted(hs)[:k]
    }
    assert got == want
    assert sum(1 for key, _ in got if key == "d") == 1  # population < k: keep all

    got7 = {
        (r["k"], r["doc_id"])
        for r in cap_per_key(df.repartition(7), ["k"], k=k, id_col="doc_id").collect()
    }
    assert got7 == got

    # reservoir semantics: appending rows can only displace members whose
    # hash is larger — recompute over the union and check prior members
    # that survive are exactly the bottom-k of the union
    extra = spark.createDataFrame([(i, ["a", "b", "c"][i % 3]) for i in range(60, 90)],
                                  "doc_id long, k string")
    got_u = {
        (r["k"], r["doc_id"])
        for r in cap_per_key(df.unionByName(extra), ["k"], k=k, id_col="doc_id").collect()
    }
    for i, key in [(i, key) for i in range(60, 90) for key in [["a", "b", "c"][i % 3]]]:
        h = hashlib.md5(f"{i}:cap-v1".encode()).hexdigest()
        by_key.setdefault(key, []).append((h, i))
    want_u = {
        (key, i)
        for key, hs in by_key.items()
        for _, i in sorted(hs)[:k]
    }
    assert got_u == want_u

    import pytest as _pt

    with _pt.raises(ValueError):
        cap_per_key(df, ["k"], k=0)


def test_shard_assign_reference_and_stability(spark):
    """Shard/pos match a pure-Python replay of the double-hash layout;
    partitioning-invariant; appending rows never reorders the relative
    positions of surviving earlier rows within a shard."""
    import hashlib

    from eth2dgraph_spark.pipeline.split import shard_assign

    df = spark.createDataFrame([(i,) for i in range(120)], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"])
        for r in shard_assign(df, n_shards=4).collect()
    }

    def h8(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    by_shard: dict[int, list[tuple[str, int]]] = {}
    for i in range(120):
        sh = h8(f"{i}:shard-v1") % 4
        by_shard.setdefault(sh, []).append(
            (hashlib.md5(f"{i}:shard-v1:pos".encode()).hexdigest(), i)
        )
    want = {}
    for sh, lst in by_shard.items():
        for pos, (_, i) in enumerate(sorted(lst), start=1):
            want[i] = (sh, pos)
    assert got == want

    got7 = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"])
        for r in shard_assign(df.repartition(7), n_shards=4).collect()
    }
    assert got7 == got

    bigger = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    got_b = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"])
        for r in shard_assign(bigger, n_shards=4).collect()
    }
    for sh in range(4):
        old_order = [
            i for i, (s, p) in sorted(got.items(), key=lambda kv: kv[1][1]) if s == sh
        ]
        new_order = [
            i
            for i, (s, p) in sorted(got_b.items(), key=lambda kv: kv[1][1])
            if s == sh and i < 120
        ]
        assert old_order == new_order, sh

    import pytest as _pt

    with _pt.raises(ValueError):
        shard_assign(df, n_shards=0)


def test_token_budget_mix_prefix_math_and_nesting(spark):
    """Known-values prefix math (each source overshoots by at most one
    doc), zero-weight sources dropped, budget NESTING (kept(B) is a
    subset of kept(B')), token_col override, and determinism under
    repartitioning."""
    from eth2dgraph_spark.pipeline.split import token_budget_mix

    rows = [
        # (doc_id, source, text with known ws-token counts)
        (1, "a", "w1 w2 w3"),          # 3 tokens
        (2, "a", "w1 w2 w3 w4"),       # 4
        (3, "a", "w1 w2"),             # 2
        (4, "b", "x1 x2 x3 x4 x5"),    # 5
        (5, "b", "x1"),                # 1
        (6, "c", "y1 y2 y3"),          # dropped: no weight
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def kept(budget, weights={"a": 0.5, "b": 0.5}):
        out = token_budget_mix(df, weights, budget)
        return {(r["doc_id"], r["n_tokens_ws"]) for r in out.collect()}

    # reference: replay the hash order in python
    import hashlib

    def order(ids):
        return sorted(ids, key=lambda i: (hashlib.md5(f"{i}:tokmix-v1".encode()).hexdigest(), i))

    toks = {1: 3, 2: 4, 3: 2, 4: 5, 5: 1}

    def ref(budget_per_source, ids):
        out, cum = set(), 0
        for i in order(ids):
            if cum < budget_per_source:
                out.add((i, toks[i]))
            cum += toks[i]
        return out

    for b in (0, 2, 5, 8, 100):
        want = ref(b / 2, [1, 2, 3]) | ref(b / 2, [4, 5])
        assert kept(b) == want, b
    # zero-weight source never appears
    assert all(i not in {6} for i, _ in kept(100))
    # nesting: kept(4) subset of kept(8) subset of kept(100)
    assert kept(4) <= kept(8) <= kept(100)
    # token_col override: constant 1 token per doc -> budget counts docs
    df1 = df.withColumn("nt", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1))
    out = token_budget_mix(df1, {"a": 1.0}, 2, token_col="nt")
    assert out.count() == 2
    # token_col NULL convention: a NULL count coalesces to 0 (rides free),
    # it does NOT silently drop the row (NULL < budget would filter false)
    from pyspark.sql import functions as F

    dfn = df.withColumn(
        "nt", F.when(F.col("doc_id") == 1, F.lit(None)).otherwise(F.lit(3)).cast("long")
    )
    got = {r["doc_id"] for r in token_budget_mix(dfn, {"a": 1.0}, 3, token_col="nt").collect()}
    # hash order is [1, 3, 2]; doc 1 costs 0 so the prefix sums run
    # 0 (keep 1), 0 < 3 (keep 3), 3 !< 3 (drop 2) -> exactly {1, 3}.
    # Under the old NULL-drop behavior doc 1 vanished entirely -> {3}.
    assert got == {1, 3}
    # determinism under repartitioning
    a = kept(8)
    b_ = {
        (r["doc_id"], r["n_tokens_ws"])
        for r in token_budget_mix(df.repartition(7), {"a": 0.5, "b": 0.5}, 8).collect()
    }
    assert a == b_

    import pytest as _pytest

    with _pytest.raises(ValueError):
        token_budget_mix(df, {"a": 1.0}, -1)
    with _pytest.raises(ValueError):
        token_budget_mix(df, {}, 10)
