"""Batch-format roundtrips: the three classic CSV traps (embedded
newlines, NULL-vs-empty, quotes/commas), unicode, and schema enforcement
across ORC / CSV / JSON — each measured to corrupt data with Spark's
defaults before formats.write_read's options pinned them."""

from __future__ import annotations

import pytest

from eth2dgraph_spark.sources.formats import write_read

EDGE_ROWS = [
    (1, "plain"),
    (2, 'comma, "quoted" and \'single\''),
    (3, "line1\nline2\nline3"),
    (4, None),
    (5, ""),
    (6, "unicode: żółć 中文 🙂"),
    (7, "trailing space "),
]


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_roundtrip_preserves_edge_rows(spark, tmp_path, fmt):
    df = spark.createDataFrame(EDGE_ROWS, "id long, text string")
    r = write_read(df, str(tmp_path / f"rt_{fmt}"), fmt)
    got = {x["id"]: x["text"] for x in r.collect()}
    want = dict(EDGE_ROWS)
    assert got == want, fmt
    assert r.schema == df.schema  # enforced, not re-inferred


def test_roundtrip_preserves_types(spark, tmp_path):
    rows = [(1, 2.5, True, "x"), (2, None, False, None)]
    df = spark.createDataFrame(rows, "a long, b double, c boolean, d string")
    for fmt in ("csv", "json", "orc"):
        r = write_read(df, str(tmp_path / f"ty_{fmt}"), fmt)
        assert r.schema == df.schema, fmt
        assert sorted(map(tuple, r.collect())) == sorted(rows), fmt


def test_unsupported_format_raises(spark, tmp_path):
    df = spark.range(1)
    with pytest.raises(ValueError):
        write_read(df, str(tmp_path / "x"), "avro-nope")


def test_csv_null_sentinel_collision_documented(spark, tmp_path):
    """Pin the documented CSV limitation: a non-null value literally equal
    to the null sentinel '\\N' roundtrips to NULL (Spark's reader applies
    nullValue AFTER unquoting, so quoteAll can't fix it — measured).
    Structural formats are immune; this test is the alarm that fires if a
    Spark upgrade ever changes either behavior."""
    rows = [(1, "\\N"), (2, None), (3, "ok")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {x["id"]: x["text"] for x in write_read(df, str(tmp_path / "c"), "csv").collect()}
    assert got == {1: None, 2: None, 3: "ok"}  # the documented collision
    for fmt in ("json", "orc", "parquet"):
        got = {x["id"]: x["text"] for x in write_read(df, str(tmp_path / fmt), fmt).collect()}
        assert got == dict(rows), fmt  # structural NULL: no collision
