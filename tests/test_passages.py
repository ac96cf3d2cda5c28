"""Cross-document boilerplate-passage removal (pipeline/text.py).

The CCNet/RefinedWeb-style paragraph-dedup pass: passages recurring across
many distinct documents are dropped from every document; unique prose and
short tails survive byte-exact.
"""

from __future__ import annotations

from eth2dgraph_spark.pipeline.text import (
    boilerplate_passage_hashes,
    drop_boilerplate_passages,
    passage_drop_stats,
    passage_hashes,
)

BOILER = "terms of service apply here"  # 5 tokens = one window at window=5


def _docs(spark):
    rows = [
        # doc 0/1/2 share the boilerplate window at passage 0; unique tails
        (0, BOILER + " alpha beta gamma delta epsilon zeta"),
        (1, BOILER + " one two three four five six"),
        (2, BOILER + " red green blue cyan magenta yellow"),
        # doc 3: entirely boilerplate (two identical windows)
        (3, BOILER + " " + BOILER),
        # doc 4: no boilerplate, with a short 2-token tail
        (4, "totally unique prose with seven tokens"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_passage_hashes_windows_and_tail(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    got = passage_hashes(df, window=2).orderBy("pidx").collect()
    assert [r["pidx"] for r in got] == [0, 1, 2]  # 2+2+1 tokens
    # tail window hashes exactly the remainder token
    import hashlib

    assert got[2]["ph"] == hashlib.md5(b"e").hexdigest()
    assert got[0]["ph"] == hashlib.md5(b"a b").hexdigest()


def test_boilerplate_set_uses_doc_frequency(spark):
    df = _docs(spark)
    p = passage_hashes(df, window=5)
    # max_docs=3: boilerplate appears in 4 distinct docs -> flagged
    hot = boilerplate_passage_hashes(p, max_docs=3).collect()
    assert len(hot) == 1 and hot[0]["doc_freq"] == 4
    # doc 3 repeats the window TWICE but doc frequency counts it once:
    # at max_docs=4 nothing is boilerplate
    assert boilerplate_passage_hashes(p, max_docs=4).count() == 0


def test_drop_rebuilds_unique_text(spark):
    out = {
        r["doc_id"]: r
        for r in drop_boilerplate_passages(_docs(spark), window=5, max_docs=3).collect()
    }
    assert out[0]["text_clean"] == "alpha beta gamma delta epsilon zeta"
    assert out[1]["text_clean"] == "one two three four five six"
    assert out[0]["n_passages_dropped"] == 1
    # all-boilerplate doc -> empty text, both windows dropped
    assert out[3]["text_clean"] == "" and out[3]["n_passages_dropped"] == 2
    # untouched doc survives byte-exact, including the short tail
    assert out[4]["text_clean"] == "totally unique prose with seven tokens"
    assert out[4]["n_passages_dropped"] == 0


def test_stats_match_drop(spark):
    df = _docs(spark)
    stats = {
        r["doc_id"]: r for r in passage_drop_stats(df, window=5, max_docs=3).collect()
    }
    dropped = {
        r["doc_id"]: r["n_passages_dropped"]
        for r in drop_boilerplate_passages(df, window=5, max_docs=3).collect()
    }
    assert set(stats) == set(dropped)
    for d, r in stats.items():
        assert r["n_dropped"] == dropped[d]
    assert stats[4]["n_passages"] == 2  # 5-token window + 2-token tail
