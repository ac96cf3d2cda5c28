"""As-of and interval joins — engine surface beyond the reference (SURVEY
§2.4 notes the reference has no range/as-of/interval joins; a chain-data
engine wants them: "price as of block N", "events inside a deployment's
lifetime").

Scale shapes:
  - asof_join: NOT a non-equi join (which Catalyst can only nested-loop).
    Union both sides tagged, one window pass per key ordered by time with
    last(..., ignorenulls=True) carrying the most recent right-side values
    forward. One shuffle on the key, linear work, no range explosion.
  - interval_join: bucketize time so the range predicate becomes an
    equi-join on (key?, bucket) + a cheap residual filter. Intervals longer
    than one bucket are exploded to every bucket they overlap — bounded by
    interval_length / bucket. The classic trick that keeps a range join
    shuffle-joinable at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the `value_cols` of the LATEST right row
    with right_ts <= left_ts (or < if `strict`), matched on `by`. Left rows
    with no prior right row keep nulls — the semantics of DuckDB/kdb ASOF
    JOIN LEFT."""
    # the right-side values travel as ONE struct per right row, and the
    # window fills the struct as a unit: filling each column independently
    # with last(ignorenulls) would assemble a "row" mixing columns from
    # DIFFERENT right rows whenever the latest right row holds a null in
    # one value column (ASOF semantics are row-atomic: the latest right
    # ROW, nulls and all). A right row's struct is never null (a struct of
    # null fields is still non-null), so ignorenulls skips exactly the
    # left rows' placeholder.
    rt_src = right.filter(F.col(right_ts).isNotNull())  # null ts sorts FIRST
    # under asc and would leak its values into rows with no true prior match
    rt = rt_src.select(
        F.col(by).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    lt = left.select(
        F.col(by).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(rt.schema["_r"].dataType).alias("_r"),
    )
    rt = rt.select(
        "_k",
        "_t",
        "_is_left",
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        "_r",
    )
    # at equal timestamps the right row must sort BEFORE the left row for
    # <= semantics (AFTER it for strict <)
    order_bias = F.asc("_is_left") if not strict else F.desc("_is_left")
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), order_bias)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else Window.currentRow)
    )
    filled = lt.unionByName(rt).select(
        "_is_left",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_rv"),
    )
    out = filled.filter(F.col("_is_left") == 1).select(
        "_l.*", *[F.col(f"_rv.{c}").alias(c) for c in value_cols]
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: int,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with start <= point <= end (numeric
    timestamps), as an equi-join on time bucket + residual filter. Intervals
    are exploded to every bucket they overlap; `bucket` should be sized near
    the typical interval length so the blow-up stays ~2x.

    `how` supports 'inner' and 'left' (left = keep unmatched point rows with
    null interval columns). The residual range predicate is part of the JOIN
    CONDITION, not a post-join filter — a post-join filter would silently
    drop unmatched left rows (null start/end) and degrade 'left' to inner.
    'right'/'full' are rejected: the interval side is exploded per bucket, so
    an unmatched interval would surface once per overlapped bucket."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_join supports how='inner'|'left', got {how!r}: the "
            "interval side is bucket-exploded, so right/full outer would "
            "duplicate unmatched intervals per bucket"
        )
    p = points.withColumn("_pb", (F.col(point_ts) / bucket).cast("long"))
    iv = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                (F.col(start_ts) / bucket).cast("long"),
                (F.col(end_ts) / bucket).cast("long"),
            )
        ),
    )
    cond = (
        (p["_pb"] == iv["_ib"])
        & (p[point_ts] >= iv[start_ts])
        & (p[point_ts] <= iv[end_ts])
    )
    joined = p.join(iv, cond, how)
    return joined.drop("_pb", "_ib")


def ohlc_bars(
    events: DataFrame,
    duration: str = "5 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-bucket downsampling to OHLC bars — (key?, bar_start, open,
    high, low, close, n_events, v_sum): the standard first step of
    time-series rollup (financial bars, metrics downsampling). open/close
    are the earliest/latest event's value INSIDE each bar, resolved by
    struct-extremum — always deterministic: timestamp first, then
    `tiebreak_col` (e.g. an event id) when given, then the value itself
    (so equal-ts ties without a tiebreak column fall to the smallest
    value for open / largest for close).

    One groupBy per bar (+ keys) over epoch-aligned tumbling windows —
    a single shuffle keyed on (keys, bar); open/close ride min/max of a
    (ts, tiebreak, value) struct, so no window-function second pass."""
    keys = list(key_cols or [])
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col is not None
        else F.lit(0).alias("_tb")
    )
    tagged = F.struct(F.col(ts_col).alias("t"), tb.alias("tb"), F.col(value_col).alias("v"))
    return (
        events.groupBy(F.window(ts_col, duration).alias("_w"), *keys)
        .agg(
            F.min(tagged).alias("_open"),
            F.max(tagged).alias("_close"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("v_sum"),
        )
        .select(
            *keys,
            F.col("_w.start").alias("bar_start"),
            F.col("_open.v").alias("open"),
            F.col("high"),
            F.col("low"),
            F.col("_close.v").alias("close"),
            F.col("n_events"),
            F.col("v_sum"),
        )
    )
