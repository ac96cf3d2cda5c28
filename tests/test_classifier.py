"""Hashed-feature logistic-regression quality classifier: distributed
trainer pinned against the from-scratch pure-Python reference (the
tests/test_bpe.py pattern), separation on an engineered corpus, guard
rails, and the curate_corpus composition."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import classifier as clf


def _corpus():
    """Two separable vocabularies with a little shared noise."""
    pos = [
        "the curated encyclopedia article discusses the theorem in depth",
        "a peer reviewed journal article about the theorem and its proof",
        "the encyclopedia entry cites the journal proof of the theorem",
        "in depth peer reviewed discussion of the encyclopedia theorem",
    ]
    neg = [
        "click here buy now cheap pills best price click click",
        "win free money now casino jackpot click banner now",
        "cheap pills casino banner win free jackpot buy now",
        "best price casino pills click here win money banner",
    ]
    docs = {i: t for i, t in enumerate(pos + neg)}
    labels = {i: 1.0 if i < len(pos) else 0.0 for i in docs}
    return docs, labels


def _df(spark, docs, labels):
    rows = [(i, t, labels[i]) for i, t in docs.items()]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_matches_python_reference(spark):
    """Spark full-batch GD == the pure-Python reference, weight by weight,
    for several (epochs, lr, l2, buckets) settings — both start from zero
    init, so any drift is a real math divergence, not tuning."""
    docs, labels = _corpus()
    df = _df(spark, docs, labels)
    for epochs, lr, l2, nb in ((1, 0.5, 0.0, 64), (3, 0.5, 1e-3, 64), (5, 0.2, 1e-2, 32)):
        want = clf.train_quality_classifier_local(
            docs, labels, num_buckets=nb, epochs=epochs, lr=lr, l2=l2
        )
        got = clf.train_quality_classifier(
            df, num_buckets=nb, epochs=epochs, lr=lr, l2=l2
        )
        assert set(got) == set(want), (epochs, nb)
        for b in want:
            assert got[b] == pytest.approx(want[b], abs=1e-12), (epochs, nb, b)


def test_separates_engineered_corpus(spark):
    docs, labels = _corpus()
    df = _df(spark, docs, labels)
    w = clf.train_quality_classifier(df, num_buckets=256, epochs=40, lr=1.0)
    scores = {
        r["id"]: r["clf_score"]
        for r in clf.quality_classifier_scores(df, w, num_buckets=256).collect()
    }
    for i, y in labels.items():
        assert (scores[i] > 0.5) == (y == 1.0), (i, scores[i])
    # and a held-out doc from each vocabulary lands on the right side
    held = spark.createDataFrame(
        [(100, "journal article on the proof"), (101, "free casino pills click")],
        "doc_id long, text string",
    )
    hs = {
        r["id"]: r["clf_score"]
        for r in clf.quality_classifier_scores(held, w, num_buckets=256).collect()
    }
    assert hs[100] > 0.5 > hs[101]


def test_single_class_raises(spark):
    docs, labels = _corpus()
    df = _df(spark, docs, {i: 1.0 for i in labels})
    with pytest.raises(ValueError, match="both classes"):
        clf.train_quality_classifier(df, num_buckets=64, epochs=1)
    empty = df.filter(F.lit(False))
    with pytest.raises(ValueError, match="both classes"):
        clf.train_quality_classifier(empty, num_buckets=64, epochs=1)


def test_unscorable_docs_absent_and_zero_weights_give_half(spark):
    df = spark.createDataFrame(
        [(1, "some real text here"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    out = clf.quality_classifier_scores(df, {}, num_buckets=64).collect()
    assert {r["id"] for r in out} == {1}
    assert out[0]["clf_score"] == pytest.approx(0.5)


def test_curate_corpus_clf_stage(spark):
    """The classifier stage composes like the LM stage: explicit fixed
    references required, threshold filters, unscorable docs kept."""
    from eth2dgraph_spark.pipeline import corpus

    docs, labels = _corpus()
    pos = spark.createDataFrame(
        [(i, t) for i, t in docs.items() if labels[i] == 1.0], "doc_id long, text string"
    )
    neg = spark.createDataFrame(
        [(i, t) for i, t in docs.items() if labels[i] == 0.0], "doc_id long, text string"
    )
    main = spark.createDataFrame(
        [
            (10, "the journal theorem proof article is reviewed in the encyclopedia"),
            (11, "click now win free casino money cheap pills banner jackpot now"),
        ],
        "doc_id long, text string",
    )
    out = corpus.curate_corpus(
        main,
        min_quality=0.0,
        min_clf_score=0.5,
        clf_positive=pos,
        clf_negative=neg,
        clf_epochs=40,
        clf_lr=1.0,
        clf_num_buckets=256,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {10}
    with pytest.raises(ValueError, match="clf_positive"):
        corpus.curate_corpus(main, min_clf_score=0.5)
