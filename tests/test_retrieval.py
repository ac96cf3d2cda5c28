"""BM25 lexical retrieval: hand-computed known values, qtf=1 rule,
tie-break determinism, non-matching/empty docs excluded, top-k cut, and
a randomized pure-Python reference comparison."""

from __future__ import annotations

import math

import pytest

from eth2dgraph_spark.pipeline import retrieval


def _bm25_ref(docs, queries, k1=1.2, b=0.75):
    """From-scratch reference: same Lucene idf and qtf=1 rule."""
    toks = {i: t.lower().split() for i, t in docs.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n if n else 0.0
    out = {}
    for qid, qt in queries.items():
        scores = {}
        for term in set(qt.lower().split()):
            df = sum(1 for t in toks.values() if term in t)
            if not df:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for i, t in toks.items():
                tf = t.count(term)
                if tf:
                    scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / (
                        tf + k1 * (1 - b + b * len(t) / avgdl)
                    )
        out[qid] = scores
    return out


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "spark join hash join merge"),
        (2, "hash table scan filter"),
        (3, "window stream batch window window"),
        (4, ""),
        (5, "sort order group"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_known_values_and_membership(spark, corpus):
    q = spark.createDataFrame(
        [(1, "hash join"), (2, "window"), (3, "nosuchterm")],
        "query_id long, query_text string",
    )
    got = retrieval.bm25_topk(corpus, q, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = (r["score"], r["rank"])
    want = _bm25_ref(
        {1: "spark join hash join merge", 2: "hash table scan filter",
         3: "window stream batch window window", 4: "", 5: "sort order group"},
        {1: "hash join", 2: "window", 3: "nosuchterm"},
    )
    # query 3 matches nothing; empty doc 4 and termless doc 5 never appear
    assert set(by_q) == {1, 2}
    assert set(by_q[1]) == {1, 2} and set(by_q[2]) == {3}
    for qid, docs in by_q.items():
        for d, (s, _) in docs.items():
            assert s == pytest.approx(want[qid][d], rel=1e-12), (qid, d)
    # doc 1 has both terms + double 'join' tf: must outrank doc 2
    assert by_q[1][1][1] == 1 and by_q[1][2][1] == 2


def test_qtf_one_rule(spark, corpus):
    """Repeated query terms count once: 'join join join' == 'join'."""
    q = spark.createDataFrame(
        [(1, "join join join"), (2, "join")], "query_id long, query_text string"
    )
    got = {}
    for r in retrieval.bm25_topk(corpus, q, k=10).collect():
        got.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    assert got[1] == got[2]


def test_topk_cut_and_tiebreak(spark):
    """Identical docs are exact ties: rank must follow ascending doc_id,
    and k cuts the list deterministically."""
    rows = [(i, "alpha beta") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(1, "alpha")], "query_id long, query_text string")
    got = retrieval.bm25_topk(docs, q, k=3, score_dp=6).collect()
    assert [(r["doc_id"], r["rank"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (0, 1), (1, 2), (2, 3)
    ]


def test_matches_reference_randomized(spark):
    import random

    rng = random.Random(8191)
    vocab = [f"w{j}" for j in range(12)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        for i in range(40)
    }
    queries = {
        j: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
        for j in range(6)
    }
    ddf = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    qdf = spark.createDataFrame(
        list(queries.items()), "query_id long, query_text string"
    )
    got = {}
    for r in retrieval.bm25_topk(ddf, qdf, k=1000).collect():
        got.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    want = _bm25_ref(docs, queries)
    want = {q: s for q, s in want.items() if s}
    assert set(got) == set(want)
    for qid in want:
        assert set(got[qid]) == set(want[qid]), qid
        for d in want[qid]:
            assert got[qid][d] == pytest.approx(want[qid][d], rel=1e-12), (qid, d)


def test_tfidf_topk_terms(spark):
    """Known values vs a from-scratch reference; rank ties by term."""
    docs = {
        1: "apple apple banana cherry",
        2: "banana banana banana date",
        3: "cherry date elder elder elder",
        4: "",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    dfreq = {}
    for t in toks.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1
    want = {}
    for i, t in toks.items():
        scores = {
            term: t.count(term) * (math.log((n + 1) / (dfreq[term] + 1)) + 1)
            for term in set(t)
        }
        want[i] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = {}
    for r in retrieval.tfidf_topk_terms(df, k=3).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    assert set(got) == {1, 2, 3}  # empty doc absent
    for i in got:
        ordered = [(t, s) for _, t, s in sorted(got[i])]
        assert [t for t, _ in ordered] == [t for t, _ in want[i]], i
        for (gt, gs), (wt, ws) in zip(ordered, want[i]):
            assert gs == pytest.approx(ws, rel=1e-12), (i, gt)


def test_rrf_fuse_known_values(spark):
    """Hand-computable fusion: overlap sums both reciprocal ranks,
    single-list items keep one term, ties break by item id."""
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)], "query_id long, doc_id long, rank long"
    )
    got = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in retrieval.rrf_fuse(a, b, k=60.0, topk=10).collect()
    }
    want = {
        10: 1 / 61 + 1 / 63,
        11: 1 / 62 + 1 / 61,
        12: 1 / 63,
        13: 1 / 62,
    }
    for d, s in want.items():
        assert got[d][0] == pytest.approx(s, rel=0, abs=0), d  # exact doubles
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert order == [11, 10, 13, 12]  # 13 beats 12 (1/62 > 1/63)
