"""Importance-scoring pipeline tests: DSIR hashed-ngram weights,
Gumbel-top-k selection, bigram-LM perplexity scoring, SemDeDup pruning."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import importance, similarity_search


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "code code code function return", "src_code"),
        (2, "code function return value type", "src_code"),
        (3, "the cat sat on the mat", "src_prose"),
        (4, "the dog sat on the rug", "src_prose"),
        (5, "code the function the return", "src_mixed"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hashed_ngram_features_counts(spark, corpus):
    feats = importance.hashed_ngram_features(corpus, num_buckets=64)
    per_doc = {
        r["id"]: r["n"]
        for r in feats.groupBy("id").agg(F.sum("cnt").alias("n")).collect()
    }
    # every doc has 5 tokens -> 5 unigrams + 4 bigrams = 9 grams (doc 3/4
    # have 6 tokens -> 11)
    assert per_doc == {1: 9, 2: 9, 3: 11, 4: 11, 5: 9}


def test_dsir_weights_favor_target_like_docs(spark, corpus):
    target = corpus.filter(F.col("source") == "src_code")
    w = {
        r["id"]: r["log_weight"]
        for r in importance.dsir_logweights(corpus, target, num_buckets=256).collect()
    }
    assert set(w) == {1, 2, 3, 4, 5}
    # code-like docs must outscore prose docs under a code-trained target
    assert min(w[1], w[2]) > max(w[3], w[4])
    # the mixed doc sits strictly between the two blocks
    assert max(w[3], w[4]) < w[5] < min(w[1], w[2])


def test_dsir_select_is_deterministic_and_weight_biased(spark, corpus):
    target = corpus.filter(F.col("source") == "src_code")
    w = importance.dsir_logweights(corpus, target, num_buckets=256)
    a = sorted(r["id"] for r in importance.dsir_select(w, 2).collect())
    b = sorted(r["id"] for r in importance.dsir_select(w, 2).collect())
    assert a == b  # md5-derived Gumbel noise: no RNG, stable across runs
    # with weights this far apart the Gumbel noise cannot flip the order:
    # the two code docs win
    assert a == [1, 2]


def test_dsir_select_plan_is_take_ordered(spark, corpus):
    """Top-n must compile to TakeOrderedAndProject (per-partition top-n +
    driver merge), never a global single-reducer sort."""
    target = corpus.filter(F.col("source") == "src_code")
    w = importance.dsir_logweights(corpus, target, num_buckets=256)
    plan = importance.dsir_select(w, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_null_text_semantics(spark):
    """NULL-text docs: absent from DSIR weights (no grams), present in LM
    scores with n_bigrams=0 and NULL score (explode_outer keeps the row)."""
    docs = spark.createDataFrame(
        [(1, "a b a b", "s"), (2, None, "s")], "doc_id long, text string, source string"
    )
    w_ids = {r["id"] for r in importance.dsir_logweights(docs, docs).collect()}
    assert w_ids == {1}
    lm = {r["id"]: r for r in importance.bigram_lm_scores(docs).collect()}
    assert set(lm) == {1, 2}
    assert lm[2]["n_bigrams"] == 0 and lm[2]["avg_logp"] is None


def test_empty_text_yields_no_grams(spark):
    """Empty/whitespace-only docs contribute NO unigrams: they are absent
    from DSIR weights and score n_bigrams=0/NULL in the LM — the phantom
    ''-token regression (split('') == ['']) stays dead."""
    docs = spark.createDataFrame(
        [(1, "a b a b", "s"), (2, "", "s"), (3, "   ", "s")],
        "doc_id long, text string, source string",
    )
    feats = importance.hashed_ngram_features(docs)
    assert {r["id"] for r in feats.select("id").distinct().collect()} == {1}
    w_ids = {r["id"] for r in importance.dsir_logweights(docs, docs).collect()}
    assert w_ids == {1}
    lm = {r["id"]: r for r in importance.bigram_lm_scores(docs).collect()}
    assert set(lm) == {1, 2, 3}
    for i in (2, 3):
        assert lm[i]["n_bigrams"] == 0 and lm[i]["avg_logp"] is None


def test_dsir_empty_target_uses_closed_form_zero(spark):
    """An empty target corpus must NOT silently NULL every log_weight:
    t_zero coalesces to the closed form ln(alpha/(0+alpha*B)) = -ln(B),
    i.e. the uniform smoothed model."""
    docs = spark.createDataFrame(
        [(1, "a b a", "s"), (2, "c d", "s")], "doc_id long, text string, source string"
    )
    empty_target = docs.filter(F.col("doc_id") < 0)
    B = 64
    out = {
        r["id"]: r["log_weight"]
        for r in importance.dsir_logweights(docs, empty_target, num_buckets=B).collect()
    }
    assert set(out) == {1, 2}
    assert all(v is not None and math.isfinite(v) for v in out.values())
    # closed form check for doc 2 ('c d' -> grams c, d, 'c d', counts all 1,
    # assuming no bucket collisions among this corpus's 8 grams):
    # logp_t = -ln(B) per gram; logp_r = ln((c_b+1)/(T+B)) with T=8 total
    feats = {
        (r["id"], r["bucket"]): r["cnt"]
        for r in importance.hashed_ngram_features(docs, num_buckets=B).collect()
    }
    T = sum(feats.values())
    want = sum(
        cnt * (-math.log(B) - math.log((cnt_b + 1.0) / (T + B)))
        for (i, bkt), cnt in feats.items()
        if i == 2
        for cnt_b in [sum(c for (j, b2), c in feats.items() if b2 == bkt)]
    )
    assert out[2] == pytest.approx(want)


def test_bigram_lm_scores_known_values(spark):
    # reference corpus "a b a b": bigrams a b (x2), b a (x1); vocab {a, b}
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "b b"), (4, "a")],
        "doc_id long, text string",
    )
    ref = docs.filter(F.col("doc_id") == 1)
    out = {r["id"]: r for r in importance.bigram_lm_scores(docs, ref).collect()}
    # P(b|a) = (2+1)/(2+2) = 3/4 ; P(a|b) = (1+1)/(1+2) = 2/3 ; P(b|b) = (0+1)/(1+2) = 1/3
    expected_doc1 = (math.log(3 / 4) * 2 + math.log(2 / 3)) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logp"] == pytest.approx(expected_doc1)
    assert out[2]["avg_logp"] == pytest.approx(math.log(3 / 4))
    assert out[3]["avg_logp"] == pytest.approx(math.log(1 / 3))
    # higher-probability doc -> lower perplexity
    assert out[2]["ppl"] < out[3]["ppl"]
    # one-token doc: no bigrams, NULL score (caller decides, no fake value)
    assert out[4]["n_bigrams"] == 0 and out[4]["avg_logp"] is None and out[4]["ppl"] is None


def test_ngram_lm_trigram_known_values(spark):
    # reference "a b c a b c": trigrams 'a b c' x2, 'b c a' x1, 'c a b' x1;
    # contexts 'a b' x2, 'b c' x1, 'c a' x1; vocab {a,b,c} -> V=3
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c"), (3, "a b"), (4, "x y z")],
        "doc_id long, text string",
    )
    ref = docs.filter(F.col("doc_id") == 1)
    out = {r["id"]: r for r in importance.ngram_lm_scores(docs, ref, n=3).collect()}
    # P('a b c') = (2+1)/(2+3); P('b c a') = (1+1)/(1+3); P('c a b') = (1+1)/(1+3)
    expected_doc1 = (
        2 * math.log(3 / 5) + math.log(2 / 4) + math.log(2 / 4)
    ) / 4
    assert out[1]["n_bigrams"] == 4
    assert out[1]["avg_logp"] == pytest.approx(expected_doc1)
    assert out[2]["n_bigrams"] == 1 and out[2]["avg_logp"] == pytest.approx(
        math.log(3 / 5)
    )
    # < n tokens: zero grams, NULL score
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_logp"] is None
    # fully unseen trigram AND context: (0+1)/(0+3)
    assert out[4]["avg_logp"] == pytest.approx(math.log(1 / 3))


def test_with_ngrams_matches_python_sliding_windows(spark):
    """Property: the column-side window builder equals Python slicing on
    randomized token counts, including the under-n empty case."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(30):
        toks = [rng.choice("pqr") for _ in range(rng.randint(0, 6))]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 3, 4):
        got = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id",
                importance._with_ngrams(importance._norm_tokens("text"), n).alias("g"),
            ).collect()
        }
        for i, text in rows:
            # mirror _norm_tokens: whitespace split with empty tokens
            # dropped — an empty text yields [] (no phantom '' token)
            t = text.split()
            want = [" ".join(t[j : j + n]) for j in range(len(t) - n + 1)]
            assert got[i] == want, (i, n, t, got[i])


def test_ngram_lm_n2_equals_bigram_wrapper(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
    )
    a = {r["id"]: (r["n_bigrams"], r["avg_logp"]) for r in importance.bigram_lm_scores(docs).collect()}
    b = {r["id"]: (r["n_bigrams"], r["avg_logp"]) for r in importance.ngram_lm_scores(docs, n=2).collect()}
    assert a == b


def test_curate_corpus_ppl_filter(spark):
    """The optional LM-perplexity stage: reference-likely docs survive,
    the out-of-distribution doc dies, unscorable (too-short) docs are
    kept, and the stage requires an explicit reference corpus."""
    from eth2dgraph_spark.pipeline import corpus

    docs = spark.createDataFrame(
        [
            (1, "aa bb aa bb aa bb aa bb"),
            (2, "aa bb aa bb aa bb cc dd"),
            (3, "zz yy xx ww vv uu tt ss"),  # nothing the reference ever saw
            (4, "aa"),  # 1 token: unscorable, must survive the ppl stage
        ],
        "doc_id long, text string",
    )
    ref = docs.filter(F.col("doc_id") == 1)
    base = {r["doc_id"] for r in corpus.curate_corpus(docs, min_quality=0.0).collect()}
    assert base == {1, 2, 3, 4}
    scores = {
        r["id"]: r["ppl"] for r in importance.bigram_lm_scores(docs, ref).collect()
    }
    cutoff = (scores[2] + scores[3]) / 2  # between in-dist and OOD
    got = {
        r["doc_id"]
        for r in corpus.curate_corpus(
            docs, min_quality=0.0, max_ppl=cutoff, lm_reference=ref
        ).collect()
    }
    assert got == {1, 2, 4}
    with pytest.raises(ValueError, match="lm_reference"):
        corpus.curate_corpus(docs, min_quality=0.0, max_ppl=10.0)


def test_bigram_lm_self_scored_default(spark):
    docs = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    row = importance.bigram_lm_scores(docs).collect()[0]
    assert row["n_bigrams"] == 3 and row["ppl"] == pytest.approx(
        math.exp(-row["avg_logp"])
    )


@pytest.fixture()
def clustered_vecs(spark):
    # two well-separated clusters on orthogonal axes + one lone vector;
    # within-cluster cosine ~1, across ~0
    rows = [
        (0, [1.0, 0.01, 0.0]),
        (1, [1.0, 0.02, 0.0]),
        (2, [0.99, 0.0, 0.01]),
        (10, [0.0, 1.0, 0.01]),
        (11, [0.01, 1.0, 0.0]),
        (20, [0.5, 0.5, 0.7]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_multi_cluster(spark, clustered_vecs):
    cents = similarity_search.ivf_index(clustered_vecs, nlist=3, iters=3)
    out = {r["id"]: r for r in similarity_search.semantic_dedup(
        clustered_vecs, cents, threshold=0.95
    ).collect()}
    # min-id greedy: 0 survives its cluster, 1/2 drop; 10 survives, 11 drops
    assert out[0]["kept"] and not out[1]["kept"] and not out[2]["kept"]
    assert out[10]["kept"] and not out[11]["kept"]
    assert out[20]["kept"]  # lone vector: no near-dup neighbor
    assert out[1]["n_dup_neighbors"] >= 1 and out[20]["n_dup_neighbors"] == 0


def test_semantic_dedup_pairs_stay_within_clusters(spark, clustered_vecs):
    """Pairs never cross cluster boundaries even when the global cosine
    would qualify — the paper's recall trade for the scale win."""
    cents = similarity_search.ivf_index(clustered_vecs, nlist=3, iters=3)
    pairs = similarity_search.semantic_dedup_pairs(
        clustered_vecs, cents, threshold=0.0  # every in-cluster pair qualifies
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    # cross-cluster pairs (e.g. 0-10) must be absent despite threshold 0
    assert all(not (a < 10 <= b) for a, b in ids)


def test_blocked_cosine_pairs_exactly_once(spark):
    """The blocked GEMM kernel emits every unordered in-bucket pair
    EXACTLY once with the right cosine, with tiny block_rows forcing real
    multi-block paths (cross-block, same-block, replicated rows)."""
    import math

    rows = [
        (b, i, [math.cos(i * 0.37 + b), math.sin(i * 0.37 + b)])
        for b in (0, 1)
        for i in range(b * 100, b * 100 + 13)
    ]
    df = spark.createDataFrame(rows, "bkt int, id long, v array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity_search._blocked_cosine_pairs(
            df, "bkt", threshold=-2.0, block_rows=3
        ).collect()
    }
    want = {
        (a, b)
        for bkt in (0, 1)
        for a in range(bkt * 100, bkt * 100 + 13)
        for b in range(a + 1, bkt * 100 + 13)
    }
    assert set(got) == want
    # unit vectors at angles: cosine must be cos(delta-angle)
    for (a, b), c in got.items():
        assert c == pytest.approx(math.cos((b - a) * 0.37), abs=1e-12)


def test_blocked_cosine_pairs_matches_numpy_brute_force(spark):
    """Randomized pin: the kernel's (pairs, cosines) equal a per-bucket
    numpy brute force, at a block_rows that forces many block-pair keys."""
    import numpy as np

    rng = np.random.RandomState(1729)
    vecs = rng.randn(120, 8)
    buckets = [int(i % 3) for i in range(120)]
    rows = [(buckets[i], i, [float(x) for x in vecs[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "bkt int, id long, v array<double>")
    thr = 0.3
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity_search._blocked_cosine_pairs(
            similarity_search._with_unit_vec(df), "bkt", threshold=thr, block_rows=7
        ).collect()
    }
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = {}
    for a in range(120):
        for b in range(a + 1, 120):
            if buckets[a] == buckets[b]:
                c = float(unit[a] @ unit[b])
                if c >= thr:
                    want[(a, b)] = c
    assert set(got) == set(want)
    for k, c in want.items():
        assert got[k] == pytest.approx(c, abs=1e-12)


def test_semantic_dedup_cluster_cap_drops_mega_cluster(spark):
    """Over-cap clusters are excluded before the O(f^2) expansion (the
    degenerate-bucket defense); their members survive with 0 neighbors."""
    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(20)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity_search.ivf_index(vecs, nlist=1, iters=1)
    capped = similarity_search.semantic_dedup(
        vecs, cents, threshold=0.9, max_cluster_size=10
    )
    assert all(r["kept"] for r in capped.collect())
    uncapped = similarity_search.semantic_dedup(vecs, cents, threshold=0.9)
    assert sum(1 for r in uncapped.collect() if r["kept"]) == 1


def test_source_divergence_matches_full_grid_reference(spark):
    """The grid-free decomposition equals a brute-force pure-Python KL over
    the full (source x vocab) grid; KL >= 0 with equality iff the source
    matches the corpus distribution; disjoint-vocabulary sources diverge
    most."""
    import math

    from eth2dgraph_spark.pipeline.importance import source_divergence

    rows = [
        (1, "a", "red blue red green"),
        (2, "a", "red red blue"),
        (3, "b", "gamma delta gamma gamma epsilon"),
        (4, "b", "delta delta gamma"),
        (5, "c", "red blue green gamma delta epsilon"),
        (6, "c", ""),  # empty doc: contributes nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = 0.5
    got = {
        r["source"]: r
        for r in source_divergence(df, group_col="source", alpha=a).collect()
    }

    corpus: dict[str, int] = {}
    per_src: dict[str, dict[str, int]] = {}
    for _, s, text in rows:
        for w in text.split():
            corpus[w] = corpus.get(w, 0) + 1
            per_src.setdefault(s, {})[w] = per_src.setdefault(s, {}).get(w, 0) + 1
    V = len(corpus)
    T = sum(corpus.values())
    for s, cs in per_src.items():
        Ts = sum(cs.values())
        kl = xent = 0.0
        for w in corpus:  # FULL grid, including words absent from s
            p_s = (cs.get(w, 0) + a) / (Ts + a * V)
            p_c = (corpus[w] + a) / (T + a * V)
            kl += p_s * math.log(p_s / p_c)
            xent -= p_s * math.log(p_c)
        assert got[s]["n_tokens"] == Ts
        assert got[s]["n_types"] == len(cs)
        assert got[s]["kl_from_corpus"] == pytest.approx(kl, abs=1e-10)
        assert got[s]["cross_entropy"] == pytest.approx(xent, abs=1e-10)
    assert got["b"]["kl_from_corpus"] > got["c"]["kl_from_corpus"] >= 0
    assert all(r["kl_from_corpus"] >= -1e-12 for r in got.values())


def test_ppl_buckets_thirds_and_ordering(spark):
    """Buckets partition the scored docs into near-thirds; every head ppl
    <= every middle ppl <= every tail ppl; an unscorable doc (no bigrams)
    gets 'unscored'."""
    from eth2dgraph_spark.pipeline.importance import ppl_buckets

    texts = [
        "red blue red blue red blue",      # very reference-like under self-LM
        "red blue red blue green",
        "red green blue red",
        "gamma delta epsilon zeta eta",
        "gamma delta gamma delta",
        "one two three four five six",
        "red gamma one blue delta two",
        "blue red blue red blue",
        "zeta eta gamma",
    ]
    rows = [(i, t) for i, t in enumerate(texts)] + [(99, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = ppl_buckets(df).collect()
    by_bucket: dict[str, list[float]] = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r["ppl"])
    assert [r["bucket"] for r in got if r["id"] == 99] == ["unscored"]
    n_scored = len(texts)
    assert abs(len(by_bucket["head"]) - n_scored / 3) <= 1
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    assert len(by_bucket["head"]) + len(by_bucket["middle"]) + len(by_bucket["tail"]) == n_scored
