"""Substring-level exact dedup (Lee et al. ACL'22 ExactSubstr): known
values, keep-first semantics, boundary cases, a randomized pure-Python
reference comparison, and the rebuild-identity property."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import substring as ss


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "a b c d e X Y Z a b c d e"),  # 'a b c d e' twice within one doc
        (2, "p q r s t u v w"),  # fully unique
        (3, "m m a b c d e n n"),  # shares the span with doc 1
        (4, ""),  # empty
        (5, "one two"),  # under-window
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_known_values(spark, corpus):
    out = {r["doc_id"]: r for r in ss.substring_drop_stats(corpus, window=5).collect()}
    assert (out[1]["n_tokens"], out[1]["n_windows"], out[1]["n_dup_windows"]) == (13, 9, 2)
    assert out[1]["n_dropped_tokens"] == 10  # both copies of the 5-token span
    assert out[3]["n_dup_windows"] == 1 and out[3]["n_dropped_tokens"] == 5
    assert out[2]["n_dup_windows"] == 0 and out[2]["n_dropped_tokens"] == 0
    # empty and under-window docs: no windows, nothing dropped
    assert out[4]["n_tokens"] == 0 and out[4]["n_windows"] == 0
    assert out[5]["n_windows"] == 0 and out[5]["n_dropped_tokens"] == 0


def test_clean_drop_all(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in ss.drop_duplicate_substrings(corpus, window=5).collect()
    }
    assert out[1]["text_clean"] == "X Y Z" and out[1]["n_tokens_dropped"] == 10
    assert out[3]["text_clean"] == "m m n n" and out[3]["n_tokens_dropped"] == 5
    assert out[2]["text_clean"] == "p q r s t u v w"
    assert out[4]["text_clean"] == "" and out[5]["text_clean"] == "one two"


def test_clean_keep_first(spark, corpus):
    """keep_first exempts the globally smallest (id, off) occurrence: doc
    1's first copy survives, its second copy and doc 3's copy still drop."""
    out = {
        r["doc_id"]: r
        for r in ss.drop_duplicate_substrings(corpus, window=5, keep_first=True).collect()
    }
    assert out[1]["text_clean"] == "a b c d e X Y Z"
    assert out[1]["n_tokens_dropped"] == 5
    assert out[3]["text_clean"] == "m m n n"


def test_overlapping_spans_merge(spark):
    """Two overlapping duplicated windows merge into ONE span — dropped
    token count must not double-count the overlap."""
    # 'a b c d e f' is shared; with window=5 both 'a b c d e' and
    # 'b c d e f' are duplicated, offsets 0 and 1 -> one merged [0, 6) span
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "z z a b c d e f z z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ss.substring_drop_stats(docs, window=5).collect()}
    assert out[1]["n_dup_windows"] == 2 and out[1]["n_dropped_tokens"] == 6
    assert out[2]["n_dup_windows"] == 2 and out[2]["n_dropped_tokens"] == 6
    clean = {
        r["doc_id"]: r["text_clean"]
        for r in ss.drop_duplicate_substrings(docs, window=5).collect()
    }
    assert clean[1] == "" and clean[2] == "z z z z"


def _ref(docs: dict[int, str], w: int, min_count: int = 2, keep_first: bool = False):
    """Pure-Python reference: window counting on token tuples, global
    first-occurrence exemption, span merge, rebuild."""
    toks = {i: t.split() for i, t in docs.items()}
    cnt: Counter = Counter()
    first: dict[tuple, tuple] = {}
    for i in sorted(toks):
        ts = toks[i]
        for o in range(len(ts) - w + 1):
            key = tuple(ts[o : o + w])
            cnt[key] += 1
            first.setdefault(key, (i, o))
    out = {}
    for i in sorted(toks):
        ts = toks[i]
        offs = []
        for o in range(len(ts) - w + 1):
            key = tuple(ts[o : o + w])
            if cnt[key] >= min_count and not (keep_first and first[key] == (i, o)):
                offs.append(o)
        spans: list[list[int]] = []
        for o in offs:
            if spans and o <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], o + w)
            else:
                spans.append([o, o + w])
        covered = set()
        for s, e in spans:
            covered.update(range(s, e))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (" ".join(kept), sum(e - s for s, e in spans))
    return out


def test_matches_python_reference_randomized(spark):
    """Randomized pin vs the from-scratch reference on a small-vocab
    corpus engineered to contain real cross-doc and within-doc repeats."""
    import random

    rng = random.Random(1729)
    shared = [" ".join(rng.choice("abcdefg") for _ in range(6)) for _ in range(4)]
    docs = {}
    for i in range(40):
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.5:
                parts.append(rng.choice(shared))
            else:
                parts.append(" ".join(rng.choice("abcdefg") for _ in range(rng.randint(0, 8))))
        docs[i] = " ".join(p for p in parts if p)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    for w, kf in ((4, False), (4, True), (6, False)):
        want = _ref(docs, w, keep_first=kf)
        got = {
            r["doc_id"]: (r["text_clean"], r["n_tokens_dropped"])
            for r in ss.drop_duplicate_substrings(df, window=w, keep_first=kf).collect()
        }
        assert got == want, (w, kf)


def test_rebuild_identity_when_no_duplicates(spark):
    """Property (the VERDICT done-criterion): a corpus with ZERO
    duplicated windows rebuilds byte-identical to the (single-space
    joined) input."""
    rows = [(i, " ".join(f"tok{i}_{j}" for j in range(i + 1))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ss.drop_duplicate_substrings(df, window=3)
    got = {r["doc_id"]: (r["text_clean"], r["n_tokens_dropped"]) for r in out.collect()}
    for i, text in rows:
        assert got[i] == (text, 0)


def test_single_shuffle_window_plan(spark, corpus):
    """The global occurrence count must be the spillable window form:
    exactly one exchange on wh feeding a Window, no shuffle join for the
    cap (the measured round-7 mechanics)."""
    plan = (
        ss.duplicate_window_offsets(ss.token_window_hashes(corpus, window=5))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert plan.count("hashpartitioning(wh") == 1
