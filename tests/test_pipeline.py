"""Training-data pipeline operator tests: dedup family, similarity search,
text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import dedup, multimodal, similarity_search, text


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "THE  quick   Brown fox jumps over the lazy dog"),  # norm dup of 1
        (4, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (5, "completely different words entirely unrelated content here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 3
    assert groups[0]["doc_ids"] == [1, 2, 3]


def test_duplicate_group_member_lists_are_bounded(spark):
    """The mega-group defense: dup_count stays exact while doc_ids holds
    only the max_ids smallest members — a 10^8-member identical-text group
    must never materialize its full id array in one collect_list buffer."""
    docs = spark.createDataFrame(
        [(i, "same exact text body") for i in range(30)], "doc_id long, text string"
    )
    g = dedup.exact_duplicates(docs, max_ids=10).collect()
    assert len(g) == 1 and g[0]["dup_count"] == 30 and g[0]["doc_ids"] == list(range(10))
    # default cap binds only past 1024 members: small groups are unchanged
    full = dedup.exact_duplicates(docs).collect()
    assert full[0]["doc_ids"] == list(range(30))
    sigs = spark.createDataFrame([(i, 42) for i in range(30)], "id long, simhash long")
    sg = dedup.simhash_duplicate_groups(sigs, max_ids=7).collect()
    assert len(sg) == 1 and sg[0]["dup_count"] == 30 and sg[0]["doc_ids"] == list(range(7))


def test_dedup_exact_keeps_min(spark, docs):
    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(docs).collect())
    assert kept == [1, 4, 5]


def test_ngram_jaccard_pairs(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got  # identical shingle sets
    assert (1, 4) in got  # near dup shares most shingles
    assert not any(5 in p for p in got)


def test_ngram_jaccard_stop_shingle_cap(spark):
    # doc 1/2 share only the hot shingle "a b c" that EVERY doc contains;
    # docs 10/11 are honest near-dups sharing rare shingles. Capping the
    # posting length drops the hot-shingle evidence (pair 1-2 vanishes) but
    # leaves the rare-shingle pair exact.
    hot = "a b c"
    rows = [(i, hot + f" filler{i} x{i} y{i} z{i}") for i in range(1, 9)]
    rows += [(10, "rare shingle words match here closely"),
             (11, "rare shingle words match here closely too")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.05,
                                           max_shingle_docs=None).collect()
    }
    capped_pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.05,
                                             max_shingle_docs=4)
    capped = {(r["id_a"], r["id_b"]) for r in capped_pairs.collect()}
    assert (1, 2) in uncapped and (10, 11) in uncapped
    assert (1, 2) not in capped  # hot-shingle-only evidence dropped
    assert (10, 11) in capped  # rare-shingle pair untouched, still exact
    dropped = dedup.stop_shingle_postings(docs, k=3, max_shingle_docs=4).collect()
    assert len(dropped) == 1 and dropped[0]["doc_count"] == 8  # the hot shingle


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = dedup.minhash_dedup_pairs(docs, k=3, num_hashes=32, num_bands=8, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical signatures always collide
    assert not any(5 in p for p in got)


def test_minhash_signature_identical_for_dups(spark, docs):
    sigs = {r["id"]: r["sig"] for r in dedup.minhash_signatures(docs, num_hashes=8).collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    assert sigs[1] != sigs[5]


def test_simhash(spark, docs):
    sigs = {r["id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    # near-dup should be close in Hamming distance, far doc far
    ham_near = bin(sigs[1] ^ sigs[4]).count("1")
    ham_far = bin(sigs[1] ^ sigs[5]).count("1")
    assert ham_near < ham_far
    groups = dedup.simhash_duplicate_groups(
        spark.createDataFrame([(k, v) for k, v in sigs.items()], "id long, simhash long")
    ).collect()
    assert any(g["dup_count"] == 3 for g in groups)


def test_simhash_near_pairs_banding_complete(spark):
    """Pigeonhole banding must surface EVERY pair within max_hamming — check
    against the brute-force answer on crafted signatures."""
    sig_base = 0b1010_1100_1110_0001_1111_0000_1010_0101
    rows = [
        (1, sig_base),
        (2, sig_base ^ 0b1),            # hamming 1
        (3, sig_base ^ 0b111),          # hamming 3 from 1
        (4, sig_base ^ (0b1111 << 20)), # hamming 4 from 1 -> excluded
        (5, 0),                          # far away
    ]
    sigs = spark.createDataFrame(rows, "id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(sigs, max_hamming=3).collect()
    }
    expect = {}
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            h = bin(sa ^ sb).count("1")
            if h <= 3:
                expect[(ia, ib)] = h
    assert got == expect
    assert (1, 2) in got and got[(1, 2)] == 1
    assert (1, 4) not in got


def test_simhash_band_keys_carry_30_bits(spark):
    # the scale property round-5 review demanded: band keys must carry >= 30
    # bits so expected bucket size shrinks as n/2^30, not n/2^15
    subsets = dedup.simhash_band_keys(max_hamming=3, num_chunks=6)
    assert len(subsets) == 20  # C(6,3)
    assert all(len(s) == 3 for s in subsets)  # 3 chunks x 10 bits = 30-bit keys
    sigs = spark.createDataFrame([(1, (1 << 60) - 1)], "id long, simhash long")
    keys = [r["chunk"] for r in dedup.simhash_banded(sigs).collect()]
    assert len(keys) == 20
    assert all(k == (1 << 30) - 1 for k in keys)  # all-ones sig -> all-ones 30-bit key


def test_simhash_near_pairs_adversarial_chunk_placement(spark):
    """Exact recall when the flips land in 3 DIFFERENT chunks — the case a
    contiguous-band scheme is weakest at and combinations must still catch."""
    base = 0x5A5A5A5A5A5A5A5 & ((1 << 60) - 1)
    flips = (1 << 5) | (1 << 25) | (1 << 45)  # chunks 0, 2, 4
    rows = [(1, base), (2, base ^ flips)]
    sigs = spark.createDataFrame(rows, "id long, simhash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_near_pairs(sigs).collect()}
    assert got == {(1, 2): 3}


def test_simhash_near_pairs_star_cap(spark):
    # an identical-signature mega-bucket collides in EVERY table; over the
    # cap it must emit O(f) star pairs (vs f(f-1)/2), all verified hamming 0
    f = 8
    sigs = spark.createDataFrame([(i, 12345) for i in range(f)], "id long, simhash long")
    capped = dedup.simhash_near_pairs(sigs, max_bucket=3).collect()
    assert len(capped) == f - 1
    assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in capped)
    uncapped = dedup.simhash_near_pairs(sigs, max_bucket=None).collect()
    assert len(uncapped) == f * (f - 1) // 2
    # a cap that doesn't bind changes nothing
    large = {(r["id_a"], r["id_b"]) for r in dedup.simhash_near_pairs(sigs, max_bucket=100).collect()}
    assert large == {(r["id_a"], r["id_b"]) for r in uncapped}


def test_minhash_lsh_star_cap_bounds_mega_cluster(spark):
    """The round-5 scale hazard: f near-identical docs collide in every band
    and would emit O(f^2) candidate pairs on single band keys. Over the cap
    the candidate set must be the O(f) star, and the downstream CC dedup must
    still keep exactly one representative of the cluster."""
    from eth2dgraph_spark.graph import dedup_by_clusters

    f = 200
    sig = list(range(100, 132))  # one identical 32-long signature for all
    sigs = spark.createDataFrame([(i, sig) for i in range(f)], "id long, sig array<long>")
    capped = dedup.minhash_lsh_candidates(sigs, max_bucket=10).collect()
    assert len(capped) == f - 1  # star, not f*(f-1)/2 = 19900
    assert all(r["id_a"] == 0 for r in capped)
    # uncapped on a small slice stays the exact all-pairs set
    small = sigs.filter(F.col("id") < 6)
    uncapped = dedup.minhash_lsh_candidates(small, max_bucket=None).collect()
    assert len(uncapped) == 15
    got = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(small, max_bucket=1024).collect()}
    assert got == {(r["id_a"], r["id_b"]) for r in uncapped}  # non-binding cap: identical
    # end-to-end: identical TEXTS through the full pipeline with a binding
    # cap -> star pairs verify at jaccard 1.0 and dedup keeps ONE doc
    docs = spark.createDataFrame(
        [(i, "the exact same templated page body repeated") for i in range(50)],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.8, max_band_bucket=5)
    assert pairs.count() == 49
    kept = dedup_by_clusters(docs, pairs).collect()
    assert len(kept) == 1 and kept[0]["doc_id"] == 0


def test_dedup_functions_release_cached_frames(spark):
    """The materialize-then-release contract: the pair/candidate functions
    persist wide intermediates internally but must leave NOTHING in the
    cache manager when they return — a long-lived session (notebook,
    streaming driver) must not accumulate pinned executor storage."""
    from eth2dgraph_spark.graph import triangle_count

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"some words number {i} plus shared boilerplate text") for i in range(20)],
        "doc_id long, text string",
    )
    dedup.ngram_jaccard_pairs(docs, threshold=0.1).count()
    dedup.minhash_dedup_pairs(docs, threshold=0.5).count()
    sigs = spark.createDataFrame([(i, i * 7919) for i in range(20)], "id long, simhash long")
    dedup.simhash_near_pairs(sigs).count()
    dedup.minhash_lsh_candidates(
        spark.createDataFrame([(i, list(range(8))) for i in range(5)], "id long, sig array<long>")
    ).count()
    edges = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    triangle_count(edges).collect()
    assert cm.isEmpty()


def test_simhash_near_pairs_randomized_exact_recall(spark):
    """Seeded randomized brute-force pin: over 300 signatures (uniform plus
    planted mutations at Hamming 1..6 of shared bases), the banded output
    must equal the exact popcount-filtered pair set — every hamming<=3 pair
    found (the pigeonhole recall claim on arbitrary bit placements, not
    just the single adversarial case), every hamming>3 pair excluded, for
    BOTH chunkings (6x10-bit tables and the 4-chunk degenerate)."""
    import itertools
    import random

    rng = random.Random(0xC0FFEE)
    sigs = [rng.getrandbits(60) for _ in range(200)]
    for _ in range(50):  # planted near/far pairs off shared bases
        base = rng.choice(sigs)
        flips = rng.sample(range(60), rng.randint(1, 6))
        mut = base
        for b in flips:
            mut ^= 1 << b
        sigs.append(mut)
    rows = [(i, s) for i, s in enumerate(sigs)]
    expected = {
        (a, b): bin(sa ^ sb).count("1")
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if bin(sa ^ sb).count("1") <= 3
    }
    df = spark.createDataFrame(rows, "id long, simhash long")
    for chunks in (6, 4):
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup.simhash_near_pairs(df, num_chunks=chunks).collect()
        }
        assert got == expected


def test_lsh_capped_candidates_subset_of_uncapped(spark):
    """Star edges pair a bucket member with the bucket-min, which shares
    that bucket — so the capped candidate set must always be a SUBSET of
    the uncapped one (exact-or-underestimated, never invented), here on a
    mix of identical-signature clusters and singletons."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(120):
        if i < 60:  # three 20-member identical-signature clusters
            sig = [1000 + 100 * (i // 20) + j for j in range(8)]
        else:
            sig = [rng.getrandbits(30) for _ in range(8)]
        rows.append((i, sig))
    df = spark.createDataFrame(rows, "id long, sig array<long>")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(df, num_bands=2, rows_per_band=4, max_bucket=None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(df, num_bands=2, rows_per_band=4, max_bucket=5).collect()
    }
    assert capped <= uncapped
    # and the star still covers every cluster member through its min
    members = {x for p in capped for x in p}
    assert set(range(60)) <= members


@pytest.fixture()
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),  # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity_search.brute_force_topk(vectors, q, k=2).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert ranked[0]["vec_id"] == 0  # self, cosine 1.0
    assert ranked[1]["vec_id"] == 1


def test_lsh_bucket_deterministic(spark, vectors):
    b1 = {r["vec_id"]: r["lsh_bucket"] for r in similarity_search.lsh_bucket(vectors, dim=4).collect()}
    b2 = {r["vec_id"]: r["lsh_bucket"] for r in similarity_search.lsh_bucket(vectors, dim=4).collect()}
    assert b1 == b2  # seeded hyperplanes: stable across runs
    assert b1[0] != b1[3]  # opposite vectors land in different buckets


def test_embedding_near_dup_pairs(spark, vectors):
    pairs = similarity_search.embedding_near_dup_pairs(vectors, threshold=0.9, dim=4, num_planes=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got


def test_zero_vector_cosine_is_null_not_crash(spark):
    # the multimodal stubs emit all-zero vectors for empty payloads; under
    # ANSI mode a plain division would kill the job with DIVIDE_BY_ZERO —
    # try_divide makes the cosine null (ranked last, dropped by thresholds)
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity_search.brute_force_topk(df, q, k=2).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[0]["cosine"] == pytest.approx(1.0)
    assert by_id[1]["cosine"] is None  # zero vector: null, ranked last
    assert by_id[1]["rank"] == 2
    # near-dup path: the zero vector contributes no pair and no crash
    pairs = similarity_search.embedding_near_dup_pairs(
        df, threshold=0.5, dim=2, num_planes=2
    ).collect()
    assert all({r["id_a"], r["id_b"]} != {0, 1} for r in pairs)


def test_lsh_bucket_dim_mismatch_raises(spark):
    # a wrong dim would null-pad the dot and silently send EVERY vector to
    # bucket 0 (degenerating the bucketed join to O(n^2)) — it must fail loud
    rows = [(0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])]  # length 8, dim=4
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="embedding length"):
        similarity_search.lsh_bucket(df, dim=4).collect()


def test_lsh_bucket_null_vector_tolerated(spark):
    # a NULL embedding is data, not an env error: it gets a null bucket
    # (every inner join on lsh_bucket then drops it) instead of killing the
    # job with an unreadable null-message raise_error
    rows = [(0, [1.0, 0.0]), (1, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["lsh_bucket"] for r in similarity_search.lsh_bucket(df, dim=2, num_planes=2).collect()}
    assert got[1] is None and got[0] is not None
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity_search.lsh_topk(df, q, k=5, dim=2, num_planes=2).collect()
    assert {r["vec_id"] for r in out} == {0}  # the null row never surfaces
    pairs = similarity_search.embedding_near_dup_pairs(df, threshold=0.5, dim=2, num_planes=2)
    assert pairs.count() == 0


def test_near_dup_bucket_cap_drops_hot_bucket(spark):
    # a bucket over max_bucket_size is excluded from the O(f^2) expansion
    rows = [(i, [1.0, 0.0]) for i in range(6)]  # all identical -> one bucket
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = similarity_search.embedding_near_dup_pairs(
        df, threshold=0.9, dim=2, num_planes=2, max_bucket_size=5
    )
    assert capped.count() == 0  # hot bucket dropped
    uncapped = similarity_search.embedding_near_dup_pairs(
        df, threshold=0.9, dim=2, num_planes=2, max_bucket_size=None
    )
    assert uncapped.count() == 15  # 6 choose 2


def test_ivf_exhaustive_probe_equals_brute_force(spark, vectors):
    """nprobe == nlist means every list is probed — results must be
    IDENTICAL to exact brute force."""
    from eth2dgraph_spark.pipeline import similarity_search as ss

    q = vectors.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = ss.ivf_index(vectors, nlist=4, iters=2)
    assert cents.count() == 4
    ivf = ss.ivf_topk(vectors, q, cents, k=5, nprobe=4)
    bf = ss.brute_force_topk(vectors, q, k=5)
    key = lambda r: (r["query_id"], r["rank"])
    got = {key(r): r["vec_id"] for r in ivf.collect()}
    want = {key(r): r["vec_id"] for r in bf.collect()}
    assert got == want


def test_ivf_partial_probe_recall(spark, vectors):
    """nprobe=1 still finds each query's own vector (it lives in the probed
    nearest list) at rank 1 with cosine ~1."""
    from eth2dgraph_spark.pipeline import similarity_search as ss

    q = vectors.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = ss.ivf_index(vectors, nlist=4, iters=2)
    got = ss.ivf_topk(vectors, q, cents, k=3, nprobe=1).filter(F.col("rank") == 1).collect()
    assert {r["query_id"] for r in got} == {r["vec_id"] for r in got}
    assert all(abs(r["cosine"] - 1.0) < 1e-9 for r in got)


def test_text_quality_and_tokens(spark):
    d = spark.createDataFrame(
        [(1, "the cat and the dog went to the park"), (2, "x!!! ???")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in text.quality_score(d).collect()}
    assert q[1]["quality_score"] > 0.5
    assert q[2]["quality_score"] == 0.0  # < 5 words
    t = {r["doc_id"]: r for r in text.token_count(d).collect()}
    assert t[1]["n_tokens_ws"] == 9


def test_lang_id(spark):
    d = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "der hund und die katze ist da"),
            (3, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(d).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "und"


def test_fingerprint_stable(spark):
    d = spark.createDataFrame([(1, "A  b C"), (2, "a b c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.fingerprint(d).collect()}
    assert got[1]["fingerprint"] == got[2]["fingerprint"]  # normalization
    assert got[1]["fingerprint64"] == got[2]["fingerprint64"]


def test_multimodal_decode_plumbing(spark):
    # the default image path is a REAL codec in every environment (Pillow
    # if present, else the stdlib PNG decoder): a genuine PNG payload
    # decodes 'ok', garbage payloads are data errors on every path
    import numpy as np

    from eth2dgraph_spark.functions.png import encode_png

    png_bytes = bytearray(encode_png(np.full((8, 8), 128, dtype=np.uint8)))
    rows = [(1, "image", "image/png", png_bytes, 8, 8, None),
            (2, "video", "video/mp4", bytearray(b"\x00mp4 fake"), None, None, 3500),
            (3, "image", "image/png", bytearray(b"\x89PNG fake"), 2, 2, None)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in multimodal.decode_features(assets).collect()}
    assert got[1]["decode_ok"] == "ok"
    # flat 128-gray image pools to 128/255 in all 16 cells
    assert got[1]["feature"] == pytest.approx([128.0 / 255.0] * 16)
    assert got[2]["decode_ok"] == "error" and got[2]["feature"] is None
    assert got[3]["decode_ok"] == "error" and got[3]["feature"] is None
    # deterministic: same payloads -> same features on a re-run
    again = {r["asset_id"]: r for r in multimodal.decode_features(assets).collect()}
    assert got[1]["feature"] == again[1]["feature"]


def test_multimodal_injected_codec_mode(spark):
    # both modes are testable regardless of what the container ships: the
    # decoder callable is resolved at plan time and captured in the closure,
    # so injecting a fake "real" codec exercises the ok/error paths
    import numpy as np

    def fake_codec(payload):
        if payload and bytes(payload).startswith(b"\x89PNG"):
            return np.full(16, 0.5, dtype=np.float32)
        raise ValueError("undecodable")

    rows = [(1, "image", "image/png", bytearray(b"\x89PNG ok"), 2, 2, None),
            (2, "image", "image/png", bytearray(b"garbage"), None, None, None)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in
           multimodal.decode_features(assets, decoder=fake_codec).collect()}
    assert got[1]["decode_ok"] == "ok" and got[1]["feature"] == [0.5] * 16
    assert got[2]["decode_ok"] == "error" and got[2]["feature"] is None


def test_frame_sample_plan(spark):
    rows = [(2, "video", "video/mp4", None, None, None, 3500)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    plan = multimodal.frame_sample_plan(assets, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in plan] == [0, 1000, 2000, 3000]


def test_codec_probe_mismatch_fails_loudly(spark):
    # a worker missing the codec the driver planned for must FAIL the task
    # (env mismatch is not data) — not degrade every row to 'error'
    import numpy as np

    def boom():
        raise RuntimeError("driver/worker environment mismatch")

    rows = [(1, "image", "image/png", bytearray(b"x"), 1, 1, None)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    df = multimodal.decode_features(
        assets, decoder=lambda p: np.zeros(16, dtype=np.float32), probe=boom
    )
    with pytest.raises(Exception, match="environment mismatch"):
        df.collect()


def test_audio_decode_default_real_codec(spark):
    # the DEFAULT audio path decodes real container bytes in every
    # environment (soundfile if present, else the stdlib WAV-PCM codec):
    # a genuine WAV decodes 'ok', RIFF-prefixed garbage degrades to
    # 'error' (data, not a crash), images are filtered, empty -> zeros
    import numpy as np

    from eth2dgraph_spark.functions.wav import encode_wav

    wav = encode_wav(np.full(1600, 0.5, dtype=np.float64), 8000)
    rows = [
        (1, "audio", "audio/wav", bytearray(wav), None, None, 200),
        (2, "image", "image/png", bytearray(b"\x89PNG"), 2, 2, None),  # filtered out
        (3, "audio", "audio/wav", None, None, None, 0),
        (4, "audio", "audio/wav", bytearray(b"RIFF fake audio"), None, None, 2000),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in multimodal.decode_audio_features(assets).collect()}
    assert set(got) == {1, 3, 4}  # modality filter applied
    assert got[1]["decode_ok"] == "ok"
    # constant 0.5 signal -> every RMS bin is 0.5 (16-bit quantized)
    assert got[1]["feature"] == pytest.approx([0.5] * 16, abs=1e-3)
    assert got[4]["decode_ok"] == "error" and got[4]["feature"] is None
    assert got[3]["feature"] == [0.0] * 16  # empty payload -> zeros
    # deterministic: same payload -> same feature on a re-run
    again = {r["asset_id"]: r for r in multimodal.decode_audio_features(assets).collect()}
    assert got[1]["feature"] == again[1]["feature"]


def test_audio_injected_codec(spark):
    import numpy as np

    def fake_codec(payload):
        if payload and bytes(payload).startswith(b"RIFF"):
            return np.full(16, 0.25, dtype=np.float32)
        raise ValueError("undecodable")

    rows = [
        (1, "audio", "audio/wav", bytearray(b"RIFF ok"), None, None, 1000),
        (2, "audio", "audio/wav", bytearray(b"garbage"), None, None, 1000),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {
        r["asset_id"]: r
        for r in multimodal.decode_audio_features(assets, decoder=fake_codec).collect()
    }
    assert got[1]["decode_ok"] == "ok" and got[1]["feature"] == [0.25] * 16
    assert got[2]["decode_ok"] == "error" and got[2]["feature"] is None


def test_video_frame_decode_matches_plan_schedule(spark):
    rows = [
        (2, "video", "video/mp4", bytearray(b"\x00mp4 fake"), None, None, 3500),
        (9, "image", "image/png", bytearray(b"x"), 1, 1, None),  # filtered out
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    frames = multimodal.decode_video_frames(assets, every_ms=1000).collect()
    plan = multimodal.frame_sample_plan(assets, every_ms=1000).collect()
    # decoded view and plan view line up 1:1 on (asset_id, frame_ts_ms)
    assert sorted((r["asset_id"], r["frame_ts_ms"]) for r in frames) == sorted(
        (r["asset_id"], r["frame_ts_ms"]) for r in plan
    )
    if not multimodal.HAS_AV:
        # default path is now the REAL stdlib AVI codec (functions/avi.py):
        # a fake mp4 payload is undecodable data — every scheduled row is
        # emitted with decode_ok='error' and a null feature, never a crash
        assert all(r["decode_ok"] == "error" and r["feature"] is None for r in frames)
        # the rotated-histogram stub is still available by explicit injection
        stub = multimodal.decode_video_frames(
            assets,
            every_ms=1000,
            decoder=multimodal._decode_video_frames_stub,
            ok_label="stubbed",
        ).collect()
        by_ts = {r["frame_ts_ms"]: r for r in stub}
        assert all(r["decode_ok"] == "stubbed" for r in stub)
        assert all(len(r["feature"]) == 16 for r in stub)
        assert by_ts[0]["feature"] != by_ts[1000]["feature"]


def test_video_injected_codec_error_path(spark):
    def bad_codec(payload, ts_list):
        raise ValueError("corrupt container")

    rows = [(5, "video", "video/mp4", bytearray(b"zz"), None, None, 2500)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    frames = multimodal.decode_video_frames(assets, every_ms=1000, decoder=bad_codec).collect()
    # error still emits the full schedule, with null features
    assert [r["frame_ts_ms"] for r in sorted(frames, key=lambda r: r["frame_ts_ms"])] == [
        0,
        1000,
        2000,
    ]
    assert all(r["decode_ok"] == "error" and r["feature"] is None for r in frames)


def test_resize_behavior_by_flag(spark):
    rows = [(1, "image", "image/png", bytearray(b"x"), 1, 1, None)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    if multimodal.HAS_PIL:
        with pytest.raises(Exception):  # garbage bytes: codec error surfaces
            multimodal.resize_images(assets, 64, 64).collect()
    else:
        # stdlib path: garbage bytes degrade to a NULL payload, never crash
        [r] = multimodal.resize_images(assets, 64, 64).collect()
        assert r["payload"] is None
    with pytest.raises(ValueError, match="resize target"):
        multimodal.resize_images(assets, 0, 4)


def test_resize_stdlib_png_roundtrip(spark):
    """The zero-dep resize path: real PNG in, nearest-neighbor resized
    real PNG out — decodable by the same codec with the exact picked
    pixels. A 1-px NULL-payload row passes through as NULL."""
    if multimodal.HAS_PIL:
        pytest.skip("stdlib path only runs without Pillow")
    import numpy as np

    from eth2dgraph_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(42)
    src = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    rows = [
        (1, "image", "image/png", bytearray(encode_png(src)), 6, 8, None),
        (2, "image", "image/png", None, None, None, None),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in multimodal.resize_images(assets, 3, 4).collect()}
    out = decode_png(bytes(got[1]["payload"]))
    assert out.shape == (4, 3, 3)
    ri = (np.arange(4) * 8 // 4).astype(int)
    ci = (np.arange(3) * 6 // 3).astype(int)
    assert (out == src[ri][:, ci]).all()  # exact nearest-neighbor picks
    assert got[2]["payload"] is None


def test_resize_stdlib_jpeg_input(spark):
    """The zero-dep resize path dispatches on magic bytes: a baseline
    JPEG input (constant-block, quality=100 — decodes to the exact
    pixels) resizes by the same nearest-neighbor picks and re-encodes
    PNG; garbage degrades to NULL."""
    if multimodal.HAS_PIL:
        pytest.skip("stdlib path only runs without Pillow")
    import numpy as np

    from eth2dgraph_spark.functions.jpeg import encode_jpeg
    from eth2dgraph_spark.functions.png import decode_png

    rng = np.random.default_rng(7)
    grid = rng.integers(0, 256, size=(2, 2), dtype=np.uint8)
    src = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)  # 16x16 gray
    rows = [
        (1, "image", "image/jpeg", bytearray(encode_jpeg(src, quality=100)), 16, 16, None),
        (2, "image", None, b"\x00 not an image", None, None, None),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in multimodal.resize_images(assets, 4, 4).collect()}
    out = decode_png(bytes(got[1]["payload"]))
    assert out.shape == (4, 4)
    ri = (np.arange(4) * 16 // 4).astype(int)
    assert (out == src[ri][:, ri]).all()
    assert got[2]["payload"] is None


@pytest.mark.skipif(not multimodal.HAS_PIL, reason="Pillow not installed")
def test_resize_real_roundtrip(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(buf, format="PNG")
    rows = [(1, "image", "image/png", bytearray(buf.getvalue()), 8, 8, None)]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    out = multimodal.resize_images(assets, 4, 4).collect()
    resized = Image.open(io.BytesIO(bytes(out[0]["payload"])))
    assert resized.size == (4, 4)


def test_curate_corpus_end_to_end(spark):
    from eth2dgraph_spark.pipeline.corpus import corpus_report, curate_corpus

    rows = [
        (1, "the cat and the dog of a house sat on the mat", "en"),
        (2, "the cat and the dog of a house sat on the mat", "en"),  # exact dup of 1
        (3, "The cat and the dog of a house sat on the mat  ", "en"),  # dup after norm
        (4, "tiny", "und"),  # < 5 words -> quality 0.0, dropped
        (5, "der hund und die katze ist da heute wieder einmal", "de"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cur = curate_corpus(d)
    got = {r["doc_id"]: r for r in cur.collect()}
    assert set(got) == {1, 5}  # min-id dedup winner kept; low-quality dropped
    assert got[1]["lang_pred"] == "en" and got[5]["lang_pred"] == "de"
    assert got[1]["n_tokens_ws"] == 12
    assert all(r["split"] in ("train", "val", "test") for r in got.values())
    # deterministic: same input -> identical curated frame
    again = {r["doc_id"]: r for r in curate_corpus(d).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {k: tuple(v) for k, v in again.items()}
    rep = corpus_report(cur).collect()
    assert sum(r["n_docs"] for r in rep) == 2


def test_redact_pii_classes_and_null(spark):
    rows = [
        (1, "mail a.b-c@x-corp.io and +1 (555) 123-4567 now"),
        (2, "card 4111 1111 1111 1111 from 192.168.0.1"),
        (3, None),
        (4, "clean text with no pii at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.redact_pii(d).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "<EMAIL>" in got[1]["text_redacted"] and "<PHONE>" in got[1]["text_redacted"]
    assert "a.b-c@x-corp.io" not in got[1]["text_redacted"]
    assert got[2]["n_card"] == 1 and got[2]["n_ipv4"] == 1
    assert "<CARD>" in got[2]["text_redacted"] and "<IPV4>" in got[2]["text_redacted"]
    assert got[3]["n_pii_total"] == 0 and got[3]["text_redacted"] is None
    assert got[4]["n_pii_total"] == 0
    assert got[4]["text_redacted"] == "clean text with no pii at all"


def test_phone_pattern_does_not_eat_longer_digit_runs(spark):
    # without digit-run lookarounds, the phone class matched the first
    # 11-13 digits INSIDE a 16-digit card or a long numeric id — leaking
    # partial card digits past redaction and corrupting non-PII numbers
    rows = [
        (1, "card 4111111111111111 here"),  # bare 16-digit card
        (2, "order id 20260814103045 shipped"),  # long numeric id
        (3, "call +1 (555) 123-4567 today"),  # real phone still caught
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.redact_pii(d).collect()}
    assert got[1]["n_phone"] == 0 and got[1]["n_card"] == 1
    assert "<CARD>" in got[1]["text_redacted"]
    assert "111" not in got[1]["text_redacted"].replace("4111", "")
    assert got[2]["n_phone"] == 0 and got[2]["n_card"] == 0
    assert "20260814103045" in got[2]["text_redacted"]  # untouched
    assert got[3]["n_phone"] == 1 and "<PHONE>" in got[3]["text_redacted"]


def test_quality_score_unicode_letters_not_punctuation(spark):
    # Java \w is ASCII-only: with [^\w\s] a clean Cyrillic document counted
    # every letter as punctuation, scored 0.2, and was silently dropped by
    # the corpus quality floor — \p{L}\p{N} fixes the class
    rows = [(1, "Привет мир как дела сегодня друзья мои"), (2, "hello world how are you today friends")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.quality_score(d).collect()}
    assert got[1]["punct_ratio"] == 0.0  # letters are letters
    assert got[2]["punct_ratio"] == 0.0


def test_frame_plan_negative_duration_clamped(spark):
    from eth2dgraph_spark.pipeline import multimodal

    rows = [
        (1, "video", "video/mp4", bytearray(b"x"), None, None, -5),
        (2, "video", "video/mp4", bytearray(b"y"), None, None, 2500),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    plan = multimodal.frame_sample_plan(assets, every_ms=1000).collect()
    frames = multimodal.decode_video_frames(assets, every_ms=1000).collect()
    by_asset_plan = {}
    for r in plan:
        by_asset_plan.setdefault(r["asset_id"], []).append(r["frame_ts_ms"])
    by_asset_dec = {}
    for r in frames:
        by_asset_dec.setdefault(r["asset_id"], []).append(r["frame_ts_ms"])
    # negative duration: both views emit the single ts=0 sample (no crash,
    # no silent drop) and stay 1:1
    assert sorted(by_asset_plan[1]) == [0] == sorted(by_asset_dec[1])
    assert sorted(by_asset_plan[2]) == [0, 1000, 2000] == sorted(by_asset_dec[2])


def test_contamination_pairs_broadcast_semantics(spark):
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # contains bench 1
            (11, "the quick brown cat sleeps"),  # 1 shared shingle only
            (12, "completely unrelated words here entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "quick brown fox jumps over")], "doc_id long, text string"
    )
    pairs = dedup.contamination_pairs(corpus, bench, k=3, min_overlap=2)
    got = {(r["id"], r["bench_id"]): r["n_shared_shingles"] for r in pairs.collect()}
    assert set(got) == {(10, 1)}
    assert got[(10, 1)] == 3  # 'quick brown fox','brown fox jumps','fox jumps over'
    # scale shape: the benchmark side must be broadcast
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_repetition_stats(spark):
    rows = [
        (1, "spam spam spam spam"),  # all one word
        (2, "all words here are distinct"),
        (3, "the cat and the dog"),  # 'the' twice
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.repetition_stats(d).collect()}
    assert got[1]["dup_word_ratio"] == 0.75 and got[1]["top_word_ratio"] == 1.0
    assert got[2]["dup_word_ratio"] == 0.0 and got[2]["top_word_ratio"] == 0.2
    assert got[3]["dup_word_ratio"] == 0.2 and got[3]["top_word_ratio"] == 0.4


def test_repetition_stats_randomized_equals_python_reference(spark):
    # the longest-run fold must equal max word multiplicity on arbitrary
    # inputs: 200 seeded-random docs (varying vocab, length, duplication,
    # repeated runs, single-word docs) checked against a Python reference
    # in one job
    import random
    from collections import Counter

    rng = random.Random(20260814)
    rows = []
    for i in range(200):
        vocab = [f"v{j}" for j in range(rng.randint(1, 30))]
        n = rng.randint(1, 120)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.3:  # inject a hot run
            words[: rng.randint(1, n)] = [words[0]] * rng.randint(1, n)
        rows.append((i, " ".join(words)))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.repetition_stats(d).collect()}
    for i, doc in rows:
        ws = doc.split()
        c = Counter(ws)
        assert got[i]["top_word_ratio"] == round(max(c.values()) / len(ws), 6), i
        assert got[i]["dup_word_ratio"] == round((len(ws) - len(c)) / len(ws), 6), i


def test_repetition_stats_long_document_linear(spark):
    # the per-row kernel must be near-linear: a single 100k-word document
    # (the realistic long-document case at corpus scale) completes in
    # bounded time — the old O(words^2) transform x filter form would need
    # ~10^10 comparisons here and effectively hang
    import time

    import math

    n, vocab = 100_000, 14_285
    doc = " ".join(f"w{i % vocab}" for i in range(n))
    d = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    t0 = time.time()
    row = text.repetition_stats(d).collect()[0]
    assert time.time() - t0 < 60
    assert row["top_word_ratio"] == round(math.ceil(n / vocab) / n, 6)
    assert row["dup_word_ratio"] == round((n - vocab) / n, 6)


def test_curate_increment_append_equivalence(spark):
    from eth2dgraph_spark.pipeline.corpus import curate_corpus, curate_increment

    batch1 = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house sat on the mat"),
            (2, "der hund und die katze ist da heute wieder einmal"),
        ],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [
            (10, "the cat and the dog of a house sat on the mat"),  # dup of 1
            (11, "le chat et la maison des les amis sont ici"),
            (12, "le chat et la maison des les amis sont ici"),  # dup within batch
        ],
        "doc_id long, text string",
    )
    # one-shot over everything
    one_shot = {r["doc_id"] for r in curate_corpus(batch1.unionByName(batch2)).collect()}
    # incremental: batch1 curated, then batch2 against batch1's fingerprints
    from eth2dgraph_spark.pipeline.text import fingerprint

    first = {r["doc_id"] for r in curate_corpus(batch1).collect()}
    seen = fingerprint(batch1).select("fingerprint")
    second = {r["doc_id"] for r in curate_increment(batch2, seen).collect()}
    assert first | second == one_shot
    assert 10 not in second  # cross-batch dup dropped
    assert 12 not in second and 11 in second  # within-batch dedup keeps min id


def test_audio_real_path_with_fake_soundfile(monkeypatch):
    # execute _decode_audio_sf's actual mono-mix + RMS-binning math by
    # injecting a fake soundfile module (the real lib isn't shipped here)
    import sys
    import types

    import numpy as np

    def read(buf, dtype="float32", always_2d=True):
        # 32 stereo samples, constant 0.5 -> RMS 0.5 in every bin
        return np.full((32, 2), 0.5, dtype=np.float32), 16000

    monkeypatch.setitem(sys.modules, "soundfile", types.SimpleNamespace(read=read))
    from eth2dgraph_spark.pipeline.multimodal import _decode_audio_sf

    feat = _decode_audio_sf(b"RIFF fake")
    assert feat.shape == (16,) and feat.dtype == np.float32
    assert np.allclose(feat, 0.5)
    assert np.allclose(_decode_audio_sf(None), 0.0)  # empty payload -> zeros


def test_video_real_path_with_fake_av(monkeypatch):
    # execute _decode_video_frames_av's container-once/seek-per-frame flow
    # and 4x4 luminance pooling with a fake av module. The fake models a
    # 90 kHz stream with keyframes every 45000 ticks (0.5 s) and a frame
    # every 3000 ticks, and asserts PyAV's actual seek contract: with
    # stream=..., offsets are in stream.time_base units, backward=True
    # lands on the preceding keyframe, and the caller must decode FORWARD
    # to the target pts (any_frame=True would return corrupt frames).
    import sys
    import types
    from fractions import Fraction

    import numpy as np

    TB = Fraction(1, 90_000)
    KEYFRAME_EVERY = 45_000  # ticks
    FRAME_EVERY = 3_000  # ticks

    class FakeFrame:
        def __init__(self, pts):
            self.pts = pts

        def to_ndarray(self, format):
            assert format == "gray"
            return np.full((8, 8), 128, dtype=np.uint8)

    class FakeContainer:
        def __init__(self):
            self.seeks = []
            self.pos = 0
            self.stream = types.SimpleNamespace(time_base=TB)
            self.streams = types.SimpleNamespace(video=[self.stream])

        def seek(self, offset, backward=False, any_frame=False, stream=None):
            assert stream is self.stream  # stream-relative seek
            assert backward and not any_frame  # keyframe-at-or-before only
            self.seeks.append(offset)
            self.pos = (offset // KEYFRAME_EVERY) * KEYFRAME_EVERY

        def decode(self, stream):
            while True:
                yield FakeFrame(self.pos)
                self.pos += FRAME_EVERY

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    container = FakeContainer()
    monkeypatch.setitem(
        sys.modules, "av", types.SimpleNamespace(open=lambda buf: container)
    )
    from eth2dgraph_spark.pipeline.multimodal import _decode_video_frames_av

    feats = _decode_video_frames_av(b"mp4 fake", [0, 1000, 2000])
    assert len(feats) == 3
    # ms -> stream time_base ticks (90 kHz), NOT microseconds
    assert container.seeks == [0, 90_000, 180_000]
    for f in feats:
        assert f.shape == (16,)
        assert np.allclose(f, 128 / 255.0)


def test_video_av_decodes_forward_from_keyframe(monkeypatch):
    # a target between keyframes must be reached by forward decode: seek
    # lands on the 0.5 s keyframe, then frames advance until pts >= target
    import sys
    import types
    from fractions import Fraction

    import numpy as np

    decoded_pts = []

    class FakeFrame:
        def __init__(self, pts):
            self.pts = pts

        def to_ndarray(self, format):
            return np.full((8, 8), min(self.pts // 3000, 255), dtype=np.uint8)

    class FakeContainer:
        def __init__(self):
            self.pos = 0
            self.stream = types.SimpleNamespace(time_base=Fraction(1, 90_000))
            self.streams = types.SimpleNamespace(video=[self.stream])

        def seek(self, offset, backward=False, any_frame=False, stream=None):
            self.pos = (offset // 45_000) * 45_000

        def decode(self, stream):
            while True:
                decoded_pts.append(self.pos)
                yield FakeFrame(self.pos)
                self.pos += 3_000

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setitem(
        sys.modules, "av", types.SimpleNamespace(open=lambda buf: FakeContainer())
    )
    from eth2dgraph_spark.pipeline.multimodal import _decode_video_frames_av

    # 700 ms = 63000 ticks: keyframe at 45000, frames every 3000 -> the
    # returned frame must be the one ON SCREEN at 700 ms, pts == 63000
    feats = _decode_video_frames_av(b"mp4 fake", [700])
    assert decoded_pts[0] == 45_000  # started at the keyframe
    assert decoded_pts[-1] == 63_000  # walked forward to the target
    assert np.allclose(feats[0], (63_000 // 3000) / 255.0)

    # 710 ms = 63900 ticks falls BETWEEN frames 63000 and 66000: the frame
    # on screen at 710 ms is the one displayed since 700 ms (pts 63000) —
    # the last pts <= target, not the first past it
    decoded_pts.clear()
    feats = _decode_video_frames_av(b"mp4 fake", [710])
    assert decoded_pts[-1] == 66_000  # decode walked one frame past
    assert np.allclose(feats[0], (63_000 // 3000) / 255.0)  # returned 63000


def test_image_real_path_with_fake_pil(monkeypatch):
    import sys
    import types

    import numpy as np

    class FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size):
            assert size == (4, 4)
            return self

        def __array__(self, dtype=None, copy=None):
            return np.full((4, 4), 51.0, dtype=np.float32)

    fake_image_mod = types.SimpleNamespace(open=lambda b: FakeImg())
    monkeypatch.setitem(sys.modules, "PIL", types.SimpleNamespace(Image=fake_image_mod))
    from eth2dgraph_spark.pipeline import multimodal

    feat = multimodal._decode_image_pil(b"\x89PNG fake")
    assert feat.shape == (16,)
    assert np.allclose(feat, 51.0 / 255.0)


def test_probe_raises_when_codec_absent():
    from eth2dgraph_spark.pipeline import multimodal

    for probe, flag in [
        (multimodal._probe_pil, multimodal.HAS_PIL),
        (multimodal._probe_soundfile, multimodal.HAS_SOUNDFILE),
        (multimodal._probe_av, multimodal.HAS_AV),
    ]:
        if flag:
            probe()  # codec present: silent
        else:
            with pytest.raises(RuntimeError, match="environment mismatch"):
                probe()


def test_star_cap_cc_composition_randomized(spark):
    """End-to-end property (VERDICT r6 item 6): on randomized near-dup
    corpora where every in-group pair verifies, the capped pipeline
    (star-expanded hot buckets) and the uncapped pipeline feed
    connected-components into IDENTICAL final cluster sets — the
    exact-or-underestimated star contract composed through CC, beyond the
    single engineered f=5k unit pin."""
    import random

    from eth2dgraph_spark.graph import duplicate_clusters

    rng = random.Random(74207281)

    def clusters(pairs):
        rows = duplicate_clusters(pairs).collect()
        comp = {}
        for r in rows:
            comp.setdefault(r["component"], set()).add(r["node"])
        return {frozenset(v) for v in comp.values()}

    for trial in range(3):
        # groups of near-identical docs over per-group disjoint vocabs:
        # one-word perturbations keep in-group shingle Jaccard ~0.8+, far
        # above the 0.5 verify threshold, so every star edge verifies;
        # disjoint vocabs keep cross-group band collisions impossible in
        # practice (a collision would need 4 simultaneous minhash ties)
        rows, gid = [], 0
        for g in range(rng.randint(3, 6)):
            vocab = [f"g{g}w{j}" for j in range(40)]
            base = [rng.choice(vocab) for _ in range(30)]
            for m in range(rng.randint(4, 8)):
                words = list(base)
                if m and rng.random() < 0.7:
                    words[rng.randrange(len(words))] = rng.choice(vocab)
                rows.append((gid, " ".join(words)))
                gid += 1
        # singletons that belong to no cluster
        for _ in range(5):
            rows.append((gid, " ".join(f"solo{gid}x{j}" for j in range(25))))
            gid += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for cap in (None, 2):
            pairs = dedup.minhash_dedup_pairs(
                docs, threshold=0.5, max_band_bucket=cap
            )
            got[cap] = clusters(pairs)
        assert got[2] == got[None], (trial, got)


def test_contamination_stats_known_values(spark):
    """Per-doc contaminated fraction vs a benchmark: distinct-shingle
    counting, zero rows for clean docs, the under-k fallback shingle."""
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),      # shares shingles with bench doc
            (2, "p q r s"),        # clean
            (3, "a b c"),          # exactly one shingle, contaminated
            (4, "x"),              # under-k fallback shingle, clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, "a b c d")], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contaminated_frac"])
        for r in dedup.contamination_stats(corpus, bench, k=3).collect()
    }
    # doc 1 shingles: 'a b c','b c d','c d e' -> 2 of 3 in bench ('a b c','b c d')
    assert got[1] == (3, 2, pytest.approx(2 / 3))
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (1, 1, 1.0)
    assert got[4] == (1, 0, 0.0)


def test_ngram_repetition_fractions_reference(spark):
    """Pure-Python pin of the Gopher top-n-gram / duplicated-n-gram
    character fractions, including the lexicographic argmax tie-break,
    under-n documents (fraction 0), and the per-occurrence duplicated
    counting convention."""
    from eth2dgraph_spark.pipeline.text import ngram_repetition_fractions

    rows = [
        (1, "a b a b a b c"),          # heavy 2-gram repetition
        (2, "x y z x y z x y z w w"),  # repeated 3-grams + a tie candidate
        (3, "one two"),                # fewer than 5 words: dup5/6 = 0
        (4, "q"),                      # 1 word: every n-gram fraction 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: r
        for r in ngram_repetition_fractions(
            df, top_ns=(2, 3), dup_ns=(2, 5)
        ).collect()
    }

    def ref(text, n):
        ws = text.split()
        grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        total = sum(len(w) for w in ws)
        if not grams:
            return 0.0, 0.0, total
        cnt = {}
        for g in grams:
            cnt[g] = cnt.get(g, 0) + 1
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        topchars = best[1] * len(best[0].replace(" ", ""))
        dupchars = sum(
            c * len(g.replace(" ", "")) for g, c in cnt.items() if c >= 2
        )
        return topchars / max(total, 1), dupchars / max(total, 1), total

    for doc_id, text in rows:
        t2, d2, total = ref(text, 2)
        t3, _, _ = ref(text, 3)
        _, d5, _ = ref(text, 5)
        r = got[doc_id]
        assert r["n_chars"] == total
        assert r["top2_frac"] == pytest.approx(t2, abs=1e-12)
        assert r["top3_frac"] == pytest.approx(t3, abs=1e-12)
        assert r["dup2_frac"] == pytest.approx(d2, abs=1e-12)
        assert r["dup5_frac"] == pytest.approx(d5, abs=1e-12)
    assert got[4]["top2_frac"] == 0.0 and got[4]["dup5_frac"] == 0.0
    assert got[1]["top2_frac"] > 0.4  # 'a b' dominates doc 1


def test_curate_corpus_gopher_ngram_cuts(spark):
    """max_top_ngram_fracs / max_dup_ngram_fracs drop the degenerate
    repetitive document, keep clean ones, preserve the output schema, and
    stay append-equivalent through curate_increment's **filters path."""
    from eth2dgraph_spark.pipeline import corpus as cp

    clean = "the quick brown fox jumps over a lazy dog and keeps running far away today"
    rows = [
        (1, clean),
        (2, "spam ham " * 12 + "spam ham"),  # top-2-gram dominates
        (3, clean.replace("quick", "rapid")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cuts = {"max_top_ngram_fracs": {2: 0.5}, "max_dup_ngram_fracs": {5: 2.0}}
    base = cp.curate_corpus(df, min_quality=0.0)
    cut = cp.curate_corpus(df, min_quality=0.0, **cuts)
    assert {r["doc_id"] for r in base.collect()} == {1, 2, 3}
    assert {r["doc_id"] for r in cut.collect()} == {1, 3}
    assert base.columns == cut.columns  # frac columns dropped after filtering

    # append-equivalence with the cuts active: one-shot == increments
    first = df.where(F.col("doc_id") <= 1)
    rest = df.where(F.col("doc_id") > 1)
    one_shot = {tuple(r) for r in cut.collect()}
    import pyspark.sql.functions as _F

    seen0 = spark.createDataFrame([], "fingerprint string")
    inc1 = cp.curate_increment(first, seen0, min_quality=0.0, **cuts)
    from eth2dgraph_spark.pipeline.text import norm_ws

    seen1 = seen0.unionByName(
        first.select(_F.md5(norm_ws("text")).alias("fingerprint"))
    )
    inc2 = cp.curate_increment(rest, seen1, min_quality=0.0, **cuts)
    incremental = {tuple(r) for r in inc1.unionByName(inc2).collect()}
    assert incremental == one_shot


def test_script_profile_known_values(spark):
    """Hand-counted mixed-script strings: exact per-script char counts
    over non-whitespace chars, digits as script Common, punctuation in
    'other', empty/NULL docs all-zero with frac 0."""
    rows = [
        (1, "hello мир 中文 123!"),      # 5 latin, 3 cyr, 2 han, 3 digit, 1 other
        (2, "αβγ 쓰기 עברית"),            # 3 greek, 2 hangul, 5 hebrew
        (3, "مرحبا"),                    # 5 arabic
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in text.script_profile(df).collect()}
    r1 = got[1]
    assert (r1["n_chars"], r1["latin_chars"], r1["cyrillic_chars"],
            r1["han_chars"], r1["digit_chars"], r1["other_chars"]) == (14, 5, 3, 2, 3, 1)
    assert r1["latin_frac"] == pytest.approx(5 / 14)
    r2 = got[2]
    assert (r2["greek_chars"], r2["hangul_chars"], r2["hebrew_chars"]) == (3, 2, 5)
    assert got[3]["arabic_chars"] == 5 and got[3]["arabic_frac"] == pytest.approx(1.0)
    for i in (4, 5):
        assert got[i]["n_chars"] == 0 and got[i]["other_frac"] == 0.0
    # counts partition n_chars exactly (no overlap, no residue)
    for r in got.values():
        total = sum(r[f"{s}_chars"] for s in
                    ("latin", "cyrillic", "han", "greek", "arabic",
                     "hangul", "hebrew", "digit", "other"))
        assert total == r["n_chars"]


def test_entropy_profile_known_values(spark):
    """Hand-computed entropies: uniform 4-char doc = 2 bits; single
    repeated char = 0 bits; 'ab' split 2/1... H = log2(3) - (2*1+1*0)/3;
    empty/NULL keep zero rows; word entropy over token multiset."""
    import math

    rows = [
        (1, "abcd"),            # 4 distinct chars -> 2 bits
        (2, "aaaa"),            # 0 bits
        (3, "aab"),             # log2(3) - 2/3
        (4, "x y x"),           # words: {x:2, y:1}; chars: {x:2, y:1}
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in text.entropy_profile(df).collect()}
    assert got[1]["char_entropy"] == pytest.approx(2.0)
    assert got[1]["n_chars"] == 4 and got[1]["n_words"] == 1
    assert got[2]["char_entropy"] == pytest.approx(0.0)
    assert got[2]["word_entropy"] == pytest.approx(0.0)  # one word
    assert got[3]["char_entropy"] == pytest.approx(math.log2(3) - 2 / 3)
    h_21 = math.log2(3) - (2 * math.log2(2)) / 3
    assert got[4]["word_entropy"] == pytest.approx(h_21)
    assert got[4]["char_entropy"] == pytest.approx(h_21)  # same 2/1 split
    for i in (5, 6):
        assert (got[i]["n_chars"], got[i]["n_words"]) == (0, 0)
        assert got[i]["char_entropy"] == 0.0 and got[i]["word_entropy"] == 0.0


def test_minhash_cross_pairs_bipartite_and_star_cap(spark):
    """Cross-corpus near-dup: finds (new, hist) matches, never pairs
    new x new or hist x hist even for identical in-corpus texts, and the
    history-side hot-bucket cap degrades to the bucket-min representative
    (flagging preserved, partner degraded — never invented)."""
    hist = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),  # in-hist dup
         (3, "completely different unrelated words here entirely")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),   # matches 1,2
         (11, "the quick brown fox jumps over the lazy dog"),   # in-new dup
         (12, "zzz qqq www vvv uuu ttt sss rrr ppp ooo")],      # no match
        "doc_id long, text string",
    )
    got = {(r["new_id"], r["hist_id"]) for r in
           dedup.minhash_cross_pairs(new, hist, k=3, threshold=0.8).collect()}
    assert got == {(10, 1), (10, 2), (11, 1), (11, 2)}  # bipartite only
    # history-side star cap: identical texts collide in EVERY band; with
    # cap 1 each colliding new doc pairs with the bucket-min hist id only
    hist_hot = spark.createDataFrame(
        [(i, "same exact text body repeated everywhere") for i in range(1, 6)],
        "doc_id long, text string",
    )
    new_hot = spark.createDataFrame(
        [(100, "same exact text body repeated everywhere")],
        "doc_id long, text string",
    )
    capped = {(r["new_id"], r["hist_id"]) for r in dedup.minhash_cross_pairs(
        new_hot, hist_hot, k=3, threshold=0.8, max_band_bucket=1).collect()}
    assert capped == {(100, 1)}  # flagged, partner = representative
    uncapped = {(r["new_id"], r["hist_id"]) for r in dedup.minhash_cross_pairs(
        new_hot, hist_hot, k=3, threshold=0.8, max_band_bucket=None).collect()}
    assert uncapped == {(100, i) for i in range(1, 6)}


def test_minhash_cross_pairs_from_features_equivalence(spark):
    """The feature-table path (minhash_doc_features +
    minhash_cross_pairs_from_features — what the r14 stream history
    stores) must reproduce the text path ROW FOR ROW, jaccard included,
    under both the capped and uncapped band-bucket modes, including
    after a parquet roundtrip of the feature rows (the history-table
    lifecycle). This is the equivalence that lets the streaming history
    stop re-shingling its full text per batch."""
    hist = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different unrelated words here entirely"),
         (4, "the quick brown fox jumps over the hazy dog")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),
         (11, "the quick brown fox jumps over the lazy cat"),
         (12, "zzz qqq www vvv uuu ttt sss rrr ppp ooo")],
        "doc_id long, text string",
    )
    for cap in (None, 1):
        want = sorted(
            (r["new_id"], r["hist_id"], round(r["jaccard"], 9))
            for r in dedup.minhash_cross_pairs(
                new, hist, k=3, threshold=0.3, max_band_bucket=cap
            ).collect()
        )
        nf = dedup.minhash_doc_features(new, k=3)
        hf = dedup.minhash_doc_features(hist, k=3)
        got = sorted(
            (r["new_id"], r["hist_id"], round(r["jaccard"], 9))
            for r in dedup.minhash_cross_pairs_from_features(
                nf, hf, threshold=0.3, max_band_bucket=cap
            ).collect()
        )
        assert got == want and len(want) > 0


def test_minhash_doc_features_parquet_roundtrip(spark, tmp_path):
    """Feature rows surviving the history table's parquet write/read must
    band and verify identically (exact longs through the roundtrip)."""
    hist = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different unrelated words here entirely")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    hf = dedup.minhash_doc_features(hist, k=3)
    p = str(tmp_path / "feats")
    hf.write.parquet(p)
    hf2 = spark.read.parquet(p).select("id", "sig", "hs")
    nf = dedup.minhash_doc_features(new, k=3)
    got = {(r["new_id"], r["hist_id"]) for r in
           dedup.minhash_cross_pairs_from_features(nf, hf2, threshold=0.8).collect()}
    assert got == {(10, 1)}


def test_line_profile_known_values(spark):
    """Hand-computed line-level signals; blank lines dropped; NULL/empty
    docs emit zeros, never NULLs or division errors."""
    from eth2dgraph_spark.pipeline.text import line_profile

    rows = [
        (1, "Hello world.\n- bullet one\n* bullet two\nNAV MENU\nHello world.\n\n  \nlast line?"),
        (2, None),
        (3, ""),
        (4, "single line no punct"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in line_profile(d).collect()}
    r1 = got[1]
    # 6 non-blank lines; ".", ".", "?" endings; 2 bullets; 1 all-caps;
    # "Hello world." twice -> 1 dup; mean len (12+12+12+8+12+10)/6 = 11
    assert r1["n_lines"] == 6
    assert r1["mean_line_len"] == pytest.approx(11.0)
    assert r1["frac_lines_end_punct"] == pytest.approx(3 / 6)
    assert r1["frac_lines_bullet"] == pytest.approx(2 / 6)
    assert r1["frac_lines_upper"] == pytest.approx(1 / 6)
    assert r1["frac_dup_lines"] == pytest.approx(1 / 6)
    for i in (2, 3):
        assert got[i]["n_lines"] == 0
        assert got[i]["frac_dup_lines"] == 0.0 and got[i]["mean_line_len"] == 0.0
    assert got[4]["n_lines"] == 1 and got[4]["frac_lines_end_punct"] == 0.0
    # unicode bullets and all-caps-with-digits both count; lowercase Greek
    # is NOT upper (the \p{Ll} class, not ASCII)
    d2 = spark.createDataFrame(
        [(9, "• dot bullet\nHEADER 42\nαβγ line")], "doc_id long, text string"
    )
    r9 = {r["id"]: r for r in line_profile(d2).collect()}[9]
    assert r9["frac_lines_bullet"] == pytest.approx(1 / 3)
    assert r9["frac_lines_upper"] == pytest.approx(1 / 3)


def _wav_group_clip(g, n_frames=3, n_bins=8, rate=1000, frame_ms=200):
    import numpy as np

    from eth2dgraph_spark.functions.wav import encode_wav

    flen = rate * frame_ms // 1000
    seg = flen // n_bins
    amps = []
    for f in range(n_frames):
        for b in range(n_bins):
            v = g * 10 if b == 0 else (f * 80 if b == 1 else (g * 31 + f * 16 + b * 7) % 256)
            amps.extend([v / 255.0] * seg)
    return encode_wav(np.array(amps), rate)


def test_audio_fingerprints_exact_and_error_rows(spark):
    """Real WAV bytes -> per-frame packed energy signatures, EXACT through
    the 16-bit PCM quantization roundtrip; identical clips share every
    hash; undecodable payloads emit one 'error' row with a NULL hash."""
    from eth2dgraph_spark.pipeline import multimodal

    rows = [
        (1, "audio", "audio/wav", bytearray(_wav_group_clip(0)), None, None, None),
        (2, "audio", "audio/wav", bytearray(_wav_group_clip(0)), None, None, None),
        (3, "audio", "audio/wav", bytearray(b"junk"), None, None, None),
        (9, "image", "image/png", bytearray(b"x"), 1, 1, None),  # filtered out
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = multimodal.audio_fingerprints(assets, frame_ms=200).collect()
    by = {}
    for r in got:
        by.setdefault(r["asset_id"], []).append((r["frame_idx"], r["ahash"], r["decode_ok"]))
    assert set(by) == {1, 2, 3}

    def want(g, f):
        h = 0
        for b in range(8):
            v = g * 10 if b == 0 else (f * 80 if b == 1 else (g * 31 + f * 16 + b * 7) % 256)
            h |= v << (8 * b)
        return multimodal.signed64(h)

    assert sorted(h for _, h, _ in by[1]) == sorted(want(0, f) for f in range(3))
    assert sorted(by[1]) == sorted(by[2])  # bit-identical clips
    assert by[3] == [(0, None, "error")]
    # partial trailing frame is dropped: 2.5-frame clip posts 2 hashes
    import numpy as np

    from eth2dgraph_spark.functions.wav import encode_wav

    half = spark.createDataFrame(
        [(5, "audio", "audio/wav",
          bytearray(encode_wav(np.full(500, 0.25), 1000)), None, None, None)],
        multimodal.ASSET_SCHEMA,
    )
    fh = multimodal.audio_fingerprints(half, frame_ms=200).collect()
    assert len(fh) == 2  # 500 samples @ 200ms frames = 2 full + dropped tail
    with pytest.raises(ValueError, match="n_bins"):
        multimodal.audio_fingerprints(assets, n_bins=9)


def test_audio_near_pairs_end_to_end(spark):
    from eth2dgraph_spark.pipeline import multimodal

    rows = [
        (1, "audio", "audio/wav", bytearray(_wav_group_clip(0)), None, None, None),
        (2, "audio", "audio/wav", bytearray(_wav_group_clip(0)), None, None, None),
        (3, "audio", "audio/wav", bytearray(_wav_group_clip(5)), None, None, None),
        (4, "audio", "audio/wav", bytearray(_wav_group_clip(5)), None, None, None),
        (5, "audio", "audio/wav", bytearray(b"junk"), None, None, None),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in multimodal.audio_near_pairs(assets, frame_ms=200).collect()}
    assert got == {(1, 2): 3, (3, 4): 3}


def test_image_near_pairs_end_to_end(spark):
    """Real PNG bytes -> stdlib decode -> pHash -> banded Hamming pairs:
    same-group images (synthetic_image_udf is bit-identical per group)
    pair at hamming 0; the measured min cross-group margin is 22 bits
    (see the UDF docstring), so max_hamming=2 emits same-group pairs
    only. Closes the image side of the per-modality near-dup family
    (video/audio got their e2e tests in round 10)."""
    from eth2dgraph_spark.functions.png import synthetic_image_udf
    from eth2dgraph_spark.pipeline import multimodal

    img = synthetic_image_udf()
    d = spark.createDataFrame([(i,) for i in (0, 25, 50, 3, 28, 7)], "doc_id long")
    assets = d.select(
        F.col("doc_id").alias("asset_id"), img("doc_id").alias("payload")
    )
    hashes = multimodal.phash_features(assets)
    assert {r["decode_ok"] for r in hashes.collect()} == {"ok"}
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.phash_near_pairs(hashes, max_hamming=2).collect()
    }
    assert got == {(0, 25): 0, (0, 50): 0, (25, 50): 0, (3, 28): 0}


def test_audio_near_frames_drift_matching(spark):
    """The drifted clip (doc % 4 == 0: one quantization step in segment 2,
    exactly bit 16 of the packed signature) pairs with its undrifted
    group-mates ONLY under hamming-tolerant matching — exact matching
    (max_hamming=0) misses it, which is the whole point of the kernel."""
    from eth2dgraph_spark.functions.wav import synthetic_drift_clip_udf
    from eth2dgraph_spark.pipeline import multimodal

    clip = synthetic_drift_clip_udf()
    # 4 and 29: group 4, doc 4 drifted (4 % 4 == 0); 7 and 57: group 7,
    # neither drifted (7 % 4 == 3, 57 % 4 == 1)
    d = spark.createDataFrame([(4,), (29,), (7,), (57,)], "doc_id long")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("modality"),
        clip("doc_id").alias("payload"),
    )
    fh = multimodal.audio_fingerprints(assets, frame_ms=200)
    tolerant = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in multimodal.fingerprint_overlap_pairs_hamming(
            fh, max_hamming=1, min_shared=2, hash_col="ahash", max_bucket=None
        ).collect()
    }
    assert tolerant == {(4, 29): 2, (7, 57): 2}
    exact = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in multimodal.fingerprint_overlap_pairs_hamming(
            fh, max_hamming=0, min_shared=2, hash_col="ahash", max_bucket=None
        ).collect()
    }
    assert exact == {(7, 57): 2}  # the drifted pair (4, 29) is missed
