"""Bloom screen (pipeline/bloom.py): no-false-negative guarantee, screened
anti-join == plain anti-join equivalence (including NULLs and in-batch
duplicates), measured false-positive rate vs the theoretical bound, and
the curate_increment wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import bloom

BITS = 1 << 12  # 4096 bits — small enough to measure fpr, big enough for 100 keys


@pytest.fixture(scope="module")
def seen(spark):
    return spark.createDataFrame(
        [(f"seen-{i}",) for i in range(100)], "fingerprint string"
    )


def test_no_false_negatives(spark, seen):
    """Every inserted value must probe positive — the property the
    zero-false-drop claim rests on."""
    filt = bloom.bloom_build(seen, num_bits=BITS, num_hashes=4)
    probed = bloom.bloom_maybe_contains(seen, filt, num_hashes=4).collect()
    assert len(probed) == 100
    assert all(r["bloom_maybe_seen"] for r in probed)


def test_screened_equals_plain_anti_join(spark, seen):
    """Screened output == exact anti-join output, with overlap, in-batch
    duplicates, and a NULL fingerprint in the new batch."""
    new = spark.createDataFrame(
        [(i, f"seen-{i}") for i in range(0, 50)]        # true duplicates
        + [(100 + i, f"new-{i}") for i in range(60)]    # fresh
        + [(200, "new-0"), (201, None)],                # in-batch dup + NULL
        "doc_id long, fingerprint string",
    )
    want = {
        (r["doc_id"], r["fingerprint"])
        for r in new.join(seen, "fingerprint", "left_anti").collect()
    }
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in bloom.bloom_screened_anti_join(
            new, seen, num_bits=BITS, num_hashes=4
        ).collect()
    }
    assert got == want
    assert (100, "new-0") in got and (201, None) in got
    assert all(not (fp or "").startswith("seen-") for _, fp in got)


def test_false_positive_rate_bounded(spark, seen):
    """Measured fpr on 2000 fresh keys stays within 3x the theoretical
    (1 - e^(-kn/m))^k — catches broken bit math (a stuck-at-1 filter
    would probe everything positive)."""
    import math

    k, n, m = 4, 100, BITS
    filt = bloom.bloom_build(seen, num_bits=m, num_hashes=k)
    fresh = spark.createDataFrame(
        [(f"fresh-{i}",) for i in range(2000)], "fingerprint string"
    )
    pos = (
        bloom.bloom_maybe_contains(fresh, filt, num_hashes=k)
        .filter("bloom_maybe_seen")
        .count()
    )
    theory = (1.0 - math.exp(-k * n / m)) ** k
    assert pos / 2000 <= max(3 * theory, 0.01)
    # and not degenerate-empty: a seen key still probes positive
    again = bloom.bloom_maybe_contains(seen, filt, num_hashes=k)
    assert again.filter("bloom_maybe_seen").count() == 100


def test_partials_merge_or(spark):
    """The distributed OR-merge equals building from the union — the
    mergeability that lets batches extend the filter incrementally."""
    a = spark.createDataFrame([(f"a-{i}",) for i in range(30)], "fingerprint string")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(30)], "fingerprint string")
    merged = bloom.bloom_merge(
        bloom.bloom_partials(a, num_bits=BITS).unionByName(
            bloom.bloom_partials(b, num_bits=BITS)
        ),
        num_bits=BITS,
    )
    direct = bloom.bloom_build(a.unionByName(b), num_bits=BITS)
    assert (merged == direct).all()


def test_curate_increment_bloom_equals_plain(spark):
    """curate_increment with the screen on == without, row for row."""
    from eth2dgraph_spark.pipeline import corpus
    from eth2dgraph_spark.pipeline.text import fingerprint

    history = spark.createDataFrame(
        [(i, f"an old document number {i} with plenty of words here") for i in range(20)],
        "doc_id long, text string",
    )
    seen_fp = fingerprint(history).select("fingerprint")
    new = spark.createDataFrame(
        [(100 + i, f"an old document number {i} with plenty of words here") for i in range(10)]
        + [(200 + i, f"a brand new arrival {i} with plenty of words here") for i in range(10)],
        "doc_id long, text string",
    )
    plain = {
        tuple(r) for r in corpus.curate_increment(new, seen_fp, min_quality=0.0).collect()
    }
    screened = {
        tuple(r)
        for r in corpus.curate_increment(
            new, seen_fp, min_quality=0.0, bloom_num_bits=BITS
        ).collect()
    }
    assert screened == plain
    assert all(doc_id >= 200 for doc_id, *_ in screened)  # old text dropped


def test_num_bits_must_be_word_aligned(spark, seen):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.bloom_partials(seen, num_bits=100)
