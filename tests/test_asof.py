"""As-of and interval joins (engine surface; SURVEY §2.4 'not present in
reference' note)."""

from pyspark.sql import functions as F

from eth2dgraph_spark.operators.asof import asof_join, interval_join


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 5, "l1"), ("a", 10, "l2"), ("a", 3, "l0"), ("b", 7, "l3")],
        "k string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("a", 4, 40.0), ("a", 10, 100.0), ("a", 8, 80.0), ("b", 9, 90.0)],
        "k string, t long, px double",
    )
    return left, right


def test_asof_join_latest_at_or_before(spark):
    left, right = _frames(spark)
    got = {
        r["tag"]: r["px"]
        for r in asof_join(left, right, "k", "t", "t", ["px"]).collect()
    }
    # l0@3: no right <= 3 -> null; l1@5: right@4; l2@10: right@10 (<=); l3@7 (b): none <= 7
    assert got == {"l0": None, "l1": 40.0, "l2": 100.0, "l3": None}


def test_asof_join_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    got = {
        r["tag"]: r["px"]
        for r in asof_join(left, right, "k", "t", "t", ["px"], strict=True).collect()
    }
    assert got["l2"] == 80.0  # right@10 excluded under strict <, falls back to 8


def test_asof_join_is_row_atomic_not_per_column(spark):
    # ASOF semantics: the latest right ROW, nulls and all — filling each
    # column independently with last(ignorenulls) would combine price from
    # the latest row with size from an OLDER row (a frankenrow)
    left = spark.createDataFrame([("a", 3, "l1")], "k string, t long, tag string")
    right = spark.createDataFrame(
        [("a", 1, 100.0, 5.0), ("a", 2, 200.0, None)],
        "k string, t long, px double, sz double",
    )
    row = asof_join(left, right, "k", "t", "t", ["px", "sz"]).collect()[0]
    assert row["px"] == 200.0
    assert row["sz"] is None  # from the SAME (t=2) row, not t=1's 5.0


def test_asof_join_ignores_null_timestamp_right_rows(spark):
    # a right row with null ts sorts FIRST under asc and would otherwise
    # leak its values into left rows that have no true prior match
    left = spark.createDataFrame([("a", 1, "l1")], "k string, t long, tag string")
    right = spark.createDataFrame(
        [("a", None, 999.0), ("a", 5, 50.0)], "k string, t long, px double"
    )
    row = asof_join(left, right, "k", "t", "t", ["px"]).collect()[0]
    assert row["px"] is None  # no right row at-or-before t=1


def test_interval_join_buckets(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 25), (3, 42)], "pid long, ts long"
    )
    intervals = spark.createDataFrame(
        [(10, 0, 30), (20, 26, 60), (30, 100, 200)], "iid long, lo long, hi long"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "ts", "lo", "hi", bucket=10).collect()
    )
    # ts=5 in [0,30]; ts=25 in [0,30]; ts=42 in [26,60]; nothing in [100,200]
    assert got == [(1, 10), (2, 10), (3, 20)]


def test_interval_join_left_keeps_unmatched_points(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 999)], "pid long, ts long"  # 999 matches no interval
    )
    intervals = spark.createDataFrame(
        [(10, 0, 30)], "iid long, lo long, hi long"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "ts", "lo", "hi", bucket=10, how="left").collect()
    )
    # unmatched left row survives with null interval columns (true left join;
    # the range predicate is in the join condition, not a post-join filter)
    assert got == [(1, 10), (2, None)]


def test_interval_join_rejects_outer_on_interval_side(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, ts long")
    intervals = spark.createDataFrame([(10, 0, 30)], "iid long, lo long, hi long")
    import pytest

    for how in ("right", "full"):
        with pytest.raises(ValueError):
            interval_join(points, intervals, "ts", "lo", "hi", bucket=10, how=how)


def test_ohlc_bars_known_values(spark):
    """Hand-built 5-minute bars: open/close by time with tiebreak, high/
    low/count/sum; epoch alignment."""
    from datetime import datetime

    from eth2dgraph_spark.operators.asof import ohlc_bars

    rows = [
        # bar 00:00-00:05
        (1, datetime(2024, 1, 1, 0, 0, 30), "a", 10.0),
        (2, datetime(2024, 1, 1, 0, 2, 0), "a", 5.0),
        (3, datetime(2024, 1, 1, 0, 4, 59), "a", 8.0),
        # same-ts tie inside one bar: event_id decides open/close
        (4, datetime(2024, 1, 1, 0, 7, 0), "a", 3.0),
        (5, datetime(2024, 1, 1, 0, 7, 0), "a", 9.0),
        # other key
        (6, datetime(2024, 1, 1, 0, 1, 0), "b", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (r["event_type"], str(r["bar_start"])): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"], r["v_sum"]
        )
        for r in ohlc_bars(
            ev, "5 minutes", key_cols=["event_type"], tiebreak_col="event_id"
        ).collect()
    }
    assert out[("a", "2024-01-01 00:00:00")] == (10.0, 10.0, 5.0, 8.0, 3, 23.0)
    assert out[("a", "2024-01-01 00:05:00")] == (3.0, 9.0, 3.0, 9.0, 2, 12.0)
    assert out[("b", "2024-01-01 00:00:00")] == (7.0, 7.0, 7.0, 7.0, 1, 7.0)
