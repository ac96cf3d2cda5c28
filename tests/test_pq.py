"""Product-quantization (pq.py) tests: pure-Python reference pin for the
trainer, the m=1/full-codebook exact-equivalence property (ADC == exact
squared L2), encode determinism, recall vs brute force, and the
collect-free Lloyd path of ivf_index (equality + loop-independent driver
collect count)."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import pq, similarity_search


def _vecs(n: int, dim: int):
    """Deterministic pseudo-random vectors (xorshift, no RNG seed state
    shared with the library's hyperplanes)."""
    state = 123456789
    out = []
    for i in range(n):
        row = []
        for _ in range(dim):
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((state % 1999) / 999.0) - 1.0)
        out.append((i, row))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(_vecs(40, 8), "vec_id long, embedding array<double>")


def _pq_train_local(rows, dim, m, ksub, iters):
    """Pure-Python replica of pq_train: first-ksub-by-string-id init,
    squared-L2 argmin with code tie-break, per-dimension mean update,
    empty codes keep the previous centroid."""
    dsub = dim // m
    by_id = sorted(rows, key=lambda r: str(r[0]))
    cb = {
        (s, i): list(v[s * dsub : (s + 1) * dsub])
        for s in range(m)
        for i, (_, v) in enumerate(by_id[:ksub])
    }
    for _ in range(iters):
        groups: dict[tuple[int, int], list[list[float]]] = {}
        for _, v in rows:
            for s in range(m):
                sv = v[s * dsub : (s + 1) * dsub]
                best = min(
                    range(ksub),
                    key=lambda c: (
                        sum((a - b) * (a - b) for a, b in zip(sv, cb[(s, c)])),
                        c,
                    ),
                )
                groups.setdefault((s, best), []).append(sv)
        for key, members in groups.items():
            cb[key] = [sum(col) / len(members) for col in zip(*members)]
    return cb


def test_pq_train_matches_local_reference(spark, emb):
    rows = [(r[0], r[1]) for r in _vecs(40, 8)]
    ref = _pq_train_local(rows, dim=8, m=2, ksub=4, iters=3)
    got = {
        (r["sub"], r["code"]): r["c"]
        for r in pq.pq_train(emb, dim=8, m=2, ksub=4, iters=3).collect()
    }
    assert set(got) == set(ref)
    for key in ref:
        assert got[key] == pytest.approx(ref[key], abs=1e-12)


def test_pq_iters0_is_first_ksub_init(spark, emb):
    """iters=0 returns exactly the first-ksub subvector init — the pinned
    mode the cross-engine gate replays in SQL."""
    rows = sorted(_vecs(40, 8), key=lambda r: str(r[0]))
    got = {
        (r["sub"], r["code"]): r["c"]
        for r in pq.pq_train(emb, dim=8, m=4, ksub=3, iters=0).collect()
    }
    for s in range(4):
        for c in range(3):
            assert got[(s, c)] == pytest.approx(rows[c][1][s * 2 : s * 2 + 2], abs=0)


def test_pq_full_codebook_is_exact(spark, emb):
    """m=1, ksub=n, iters=0: the codebook IS the corpus, so every vector
    encodes losslessly and ADC == exact squared L2 — pq_topk must equal
    the brute-force L2 ranking."""
    rows = _vecs(40, 8)
    cb = pq.pq_train(emb, dim=8, m=1, ksub=40, iters=0)
    q = spark.createDataFrame(
        [(i, v) for i, v in rows[:3]], "query_id long, query_vec array<double>"
    )
    got = pq.pq_topk(emb, q, cb, k=5, dim=8, m=1).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qv in rows[:3]:
        d2 = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, v)), i) for i, v in rows
        )
        want = [i for _, i in d2[:5]]
        rs = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rs] == want
        for r, (dist, _) in zip(rs, d2):
            assert r["adc_d2"] == pytest.approx(dist, abs=1e-9)


def test_pq_encode_codes_shape(spark, emb):
    codes = pq.pq_encode(emb, pq.pq_train(emb, dim=8, m=4, ksub=4, iters=1), dim=8, m=4)
    rows = codes.collect()
    assert len(rows) == 40
    for r in rows:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 4 for c in r["codes"])


def test_pq_recall_vs_exact(spark, emb):
    """Trained PQ at m=4/ksub=8 on 40 vectors: recall@5 against the exact
    L2 top-5 must clear a conservative floor (quantized search is
    approximate; the floor catches broken encode/ADC wiring, not tuning)."""
    rows = _vecs(40, 8)
    cb = pq.pq_train(emb, dim=8, m=4, ksub=8, iters=3)
    q = spark.createDataFrame(
        [(i, v) for i, v in rows[:5]], "query_id long, query_vec array<double>"
    )
    got = pq.pq_topk(emb, q, cb, k=5, dim=8, m=4).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qid, qv in rows[:5]:
        d2 = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, v)), i) for i, v in rows
        )
        want = {i for _, i in d2[:5]}
        hits += len(want & by_q[qid])
        total += 5
    assert hits / total >= 0.5


def test_pq_dim_not_divisible_raises(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(emb, dim=8, m=3)
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_encode(emb, pq.pq_train(emb, dim=8, m=2, iters=0), dim=8, m=3)


def test_ivf_collect_free_equals_collect_path(spark, emb):
    """Forcing the over-cap path (max_collect_centroid_values=1) must give
    the identical centroid table as the collect path: same algebra, same
    init, same empty-list rule."""
    a = similarity_search.ivf_index(emb, nlist=4, iters=2, train_fraction=1.0)
    b = similarity_search.ivf_index(
        emb, nlist=4, iters=2, train_fraction=1.0, max_collect_centroid_values=1
    )
    ra = {r["list_id"]: r["c"] for r in a.collect()}
    rb = {r["list_id"]: r["c"] for r in b.collect()}
    assert set(ra) == set(rb)
    for lid in ra:
        assert ra[lid] == pytest.approx(rb[lid], abs=1e-12)


def test_ivf_collect_free_driver_collects_loop_independent(spark, emb, monkeypatch):
    """Over the cap, the number of driver collects must NOT grow with the
    Lloyd iteration count (the 100 TB contract: no per-round centroid
    round-trip). Counted by patching the CONCRETE DataFrame class's
    collect (PySpark 4: pyspark.sql.DataFrame is an ABC whose subclass
    overrides collect; patching the base intercepts nothing — the final
    sanity assert below guards exactly that)."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # older layout: one concrete class
        _DF = DataFrame
    counts = []
    orig = _DF.collect

    def run(iters):
        n = [0]

        def counting(self):
            n[0] += 1
            return orig(self)

        monkeypatch.setattr(_DF, "collect", counting)
        try:
            out = similarity_search.ivf_index(
                emb, nlist=4, iters=iters, train_fraction=1.0,
                max_collect_centroid_values=1,
            )
            orig(out)  # materialize OUTSIDE the counter
        finally:
            monkeypatch.setattr(_DF, "collect", orig)
        counts.append(n[0])

    run(1)
    run(3)
    assert counts[0] == counts[1]
    # and the collect path DOES collect per round (sanity of the counter)
    n = [0]

    def counting(self):
        n[0] += 1
        return orig(self)

    monkeypatch.setattr(_DF, "collect", counting)
    try:
        similarity_search.ivf_index(emb, nlist=4, iters=3, train_fraction=1.0)
    finally:
        monkeypatch.setattr(_DF, "collect", orig)
    assert n[0] > counts[0]
