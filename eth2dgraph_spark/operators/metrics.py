"""Run counters (A12): totals, failure ratios, rows/sec.

Reference: src/extraction/extract.rs:318-320,446-466 — atomic counters
incremented per contract, printed at the end of a run (total vs failed
deployments, success ratio, contracts/sec, blocks/sec).

Spark-first: `DataFrame.observe` attaches the counters to the SAME action
that materializes the data — no second pass, no driver-side loop, and the
metrics are exact (computed by the executors as rows stream through). This
is the engine analog of the reference's `AtomicU64`s: free-riding counters
on the main dataflow.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame,
    name: str = "run",
    failed_col: str | None = None,
    distinct_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach run counters to `df`. Returns (df, observation); read
    `observation.get` AFTER the first action on the returned frame.

    Metrics: total rows; failed count + kept count when `failed_col` (a
    boolean column) is given — the total/failed split of extract.rs:450-454;
    approx distinct of `distinct_col` when given (e.g. skeleton dedup ratio,
    the DashMap cache-hit figure of extract.rs:170-246)."""
    metrics = [F.count(F.lit(1)).alias("total")]
    if failed_col is not None:
        failed = F.sum(F.when(F.col(failed_col), 1).otherwise(0))
        metrics.append(failed.alias("failed"))
    if distinct_col is not None:
        metrics.append(F.approx_count_distinct(distinct_col).alias("approx_distinct"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def summarize(observation: Observation, elapsed_sec: float | None = None) -> dict:
    """The end-of-run report of extract.rs:446-466: counts, success ratio,
    and rows/sec when a wall-clock duration is supplied."""
    m = dict(observation.get)
    out: dict = {"total": m.get("total", 0)}
    if "failed" in m:
        failed = m["failed"] or 0
        out["failed"] = failed
        out["succeeded"] = out["total"] - failed
        out["success_ratio"] = (
            (out["succeeded"] / out["total"]) if out["total"] else None
        )
    if "approx_distinct" in m:
        out["approx_distinct"] = m["approx_distinct"]
        out["dedup_ratio"] = (
            (m["approx_distinct"] / out["total"]) if out["total"] else None
        )
    if elapsed_sec is not None and elapsed_sec > 0:
        out["rows_per_sec"] = out["total"] / elapsed_sec
    return out


class timed_run:
    """Context manager pairing an observation with wall-clock timing:

        frame, obs = observe_counts(deployments, failed_col="failed_deploy")
        with timed_run(obs) as run:
            frame.write.parquet(path)
        report = run.report  # counts + ratios + rows/sec
    """

    def __init__(self, observation: Observation):
        self._obs = observation
        self.report: dict | None = None

    def __enter__(self):
        self._t0 = time.monotonic()  # wall clock (time.time) can step
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.report = summarize(self._obs, time.monotonic() - self._t0)
        return False
