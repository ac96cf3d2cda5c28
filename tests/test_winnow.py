"""Winnowing fingerprints (Schleimer et al. SIGMOD'03): pure-Python
reference pin, the w+k-1 shared-run guarantee, density sanity, and the
short-document branch."""

from __future__ import annotations

import hashlib

import pytest

from eth2dgraph_spark.pipeline import text as T


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _ref(doc: str, k: int, w: int) -> set[tuple[int, int]]:
    toks = [t for t in " ".join(doc.lower().strip().split()).split(" ") if t]
    hs = [
        (_h(" ".join(toks[i : i + k])), i) for i in range(len(toks) - k + 1)
    ]
    if not hs:
        return set()
    sel = set()
    if len(hs) < w:
        best = min(hs, key=lambda e: (e[0], -e[1]))
        sel.add(best)
    else:
        for s in range(len(hs) - w + 1):
            best = min(hs[s : s + w], key=lambda e: (e[0], -e[1]))
            sel.add(best)
    return {(p, h) for h, p in sel}


def test_matches_python_reference_randomized(spark):
    import random

    rng = random.Random(104729)
    vocab = [f"tok{j}" for j in range(15)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, w in ((4, 5), (2, 3), (3, 1)):
        got = {}
        for r in T.winnow_fingerprints(df, k=k, w=w).collect():
            got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
        for i, doc in rows:
            assert got.get(i, set()) == _ref(doc, k, w), (k, w, i, doc)


def test_shared_run_guarantee(spark):
    """Any shared token run of length >= w + k - 1 must share at least one
    selected fingerprint HASH between the two documents."""
    import random

    rng = random.Random(31337)
    k, w = 4, 5
    shared = " ".join(rng.choice("abcdefgh") for _ in range(k + w - 1))
    rows = []
    for i in range(20):
        pre = " ".join(rng.choice("qrstuv") + str(i) for _ in range(rng.randint(0, 12)))
        post = " ".join(rng.choice("wxyz") + str(i) for _ in range(rng.randint(0, 12)))
        rows.append((i, f"{pre} {shared} {post}".strip()))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in T.winnow_fingerprints(df, k=k, w=w).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    base = fps[0]
    for i in range(1, 20):
        assert fps[i] & base, i


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b"), (3, ""), (4, None), (5, "a b c d")],
        "doc_id long, text string",
    )
    # k=4: doc 1 has 2 grams (< w=5) -> exactly one global-min fingerprint;
    # doc 5 has exactly 1 gram -> one fingerprint; 2/3/4 have none
    got = {}
    for r in T.winnow_fingerprints(df, k=4, w=5).collect():
        got.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    assert set(got) == {1, 5}
    assert len(got[1]) == 1 and len(got[5]) == 1
    assert got[5][0][0] == 0


def test_density(spark):
    """Expected selected density is ~2/(w+1); allow a loose band."""
    import random

    rng = random.Random(7)
    doc = " ".join(rng.choice("abcdefghijklmnop") + str(rng.randint(0, 99)) for _ in range(2000))
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    n = T.winnow_fingerprints(df, k=4, w=8).count()
    frac = n / (2000 - 4 + 1)
    assert 0.1 < frac < 0.4, frac


def test_pmi_collocations_known_values(spark):
    """Reference comparison on a hand-sized corpus; min_count cut; NULL
    and empty docs contribute nothing."""
    import math

    docs = {
        1: "a b a b a b",
        2: "a b c",
        3: "c c c c",
        4: "",
        5: None,
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    toks = {i: (t or "").split() for i, t in docs.items()}
    uni, pairs, n_tok, n_bi = {}, {}, 0, 0
    for t in toks.values():
        n_tok += len(t)
        n_bi += max(len(t) - 1, 0)
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(t, t[1:]):
            pairs[(x, y)] = pairs.get((x, y), 0) + 1
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi"], r["phrase_score"])
        for r in T.pmi_collocations(df, min_count=3).collect()
    }
    want = {k: c for k, c in pairs.items() if c >= 3}
    assert set(got) == set(want)
    for (x, y), c in want.items():
        pmi = math.log((c / n_bi) / ((uni[x] / n_tok) * (uni[y] / n_tok)))
        ps = c * n_tok / (uni[x] * uni[y])
        assert got[(x, y)][0] == c
        assert got[(x, y)][1] == pytest.approx(pmi, rel=1e-12)
        assert got[(x, y)][2] == pytest.approx(ps, rel=1e-12)


def test_winnow_overlap_pairs_reference_and_cap(spark):
    """Pairs sharing >= m fingerprints vs a reference built on the
    _ref() sets; a universal fingerprint over the cap contributes
    nothing (undercount-only contract)."""
    import random

    rng = random.Random(271828)
    shared = " ".join(rng.choice("abcdef") for _ in range(10))
    rows = []
    for i in range(12):
        noise = " ".join(rng.choice("uvwxyz") + str(i) for _ in range(8))
        rows.append((i, f"{shared} {noise}"))
    rows.append((50, " ".join(rng.choice("mnopqr") + "x" for _ in range(12))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 3, 4
    fps = {i: {h for _, h in _ref(t, k, w)} for i, t in rows}
    want = {}
    ids = sorted(fps)
    for a in ids:
        for b in ids:
            if a < b:
                m = len(fps[a] & fps[b])
                if m >= 2:
                    want[(a, b)] = m
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in T.winnow_overlap_pairs(df, k=k, w=w, min_shared=2).collect()
    }
    assert got == want
    # every fingerprint here is shared by all 12 near-dup docs; a cap of
    # 8 postings drops those hot fingerprints entirely -> no pairs, never
    # an error (underreport, the similarity cap contract)
    capped = T.winnow_overlap_pairs(df, k=k, w=w, min_shared=2, max_posting=8).collect()
    assert capped == []


def test_shared_run_guarantee_holds_under_xxhash64(spark):
    """hash64='xxhash64' (the measured 100 TB option — 48.9 -> 38.3 s on
    the 500k soak, BASELINE.md round-10) selects a DIFFERENT fingerprint
    sample, but the winnowing guarantee is hash-independent: any shared
    w+k-1 run still shares a fingerprint, and overlap pairs still surface."""
    import random

    rng = random.Random(777)
    k, w = 4, 5
    shared = " ".join(rng.choice("abcdefgh") for _ in range(k + w - 1))
    rows = []
    for i in range(12):
        pre = " ".join(rng.choice("qrstuv") + str(i) for _ in range(rng.randint(0, 12)))
        rows.append((i, f"{pre} {shared}".strip()))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in T.winnow_fingerprints(df, k=k, w=w, hash64="xxhash64").collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    base = fps[0]
    for i in range(1, 12):
        assert fps[i] & base, i
    # the sample genuinely differs from the md5 sample (different hash order)
    md5_fps = {r["fp"] for r in T.winnow_fingerprints(df, k=k, w=w).collect()}
    assert md5_fps != set().union(*fps.values())
    # and the overlap-pair op threads the option through
    pairs = T.winnow_overlap_pairs(df, k=k, w=w, min_shared=1, hash64="xxhash64")
    assert pairs.count() == 12 * 11 / 2  # every doc pair shares the run
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hash64"):
        T.winnow_fingerprints(df, hash64="sha1")
