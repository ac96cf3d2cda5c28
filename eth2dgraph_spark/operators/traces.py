"""Trace derivations (SURVEY.md §2.3 P1-P4).

Reference semantics:
  - P3 error propagation: within a tx, a trace whose trace_address starts with
    the trace_address of any errored trace is itself failed with error
    "Parent failed" (src/extraction/traces.rs:6-34).
  - P1 deployments: create traces -> (contract, creator, tx_hash, init code,
    deployed code, failed) (src/models/trace.rs:18-47,
    src/models/contract_deployment.rs:49-95).
  - P2 destructions: suicide traces -> (contract, balance, refund, failed)
    (src/models/contract_destruction.rs:33-59).

Scale notes: error propagation is the interesting one. The reference does a
per-tx nested loop. Spark-first: errored traces per tx are rare and shallow,
so collect the failed prefixes per tx with a *grouped aggregation* and check
prefix containment with higher-order array functions — one shuffle on tx_hash,
no Python, no cross join. Traces of one tx are at most a few thousand rows, so
the collected prefix list per tx is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARENT_FAILED = "Parent failed"


def propagate_trace_errors(traces: DataFrame) -> DataFrame:
    """P3: rewrite `error` so children of failed traces inherit failure.

    Exact reference semantics (src/extraction/traces.rs:26-32): the prefix
    check is NON-strict (`address.starts_with(f)`), so an errored trace
    matches its own address and its own error string is ALSO overwritten
    with "Parent failed" — within a tx, every errored trace and every
    descendant of one ends up with error = "Parent failed"; the original
    error strings do not survive propagation. Downstream failed/failed_deploy
    booleans only depend on error IS NOT NULL, which this preserves.
    """
    # normalize null trace_address to [] (some exporters emit null for the
    # root trace): collect_list SKIPS nulls, so an errored null-root would
    # silently vanish from the failed-prefix set and none of its
    # descendants would inherit the failure
    traces = traces.withColumn(
        "trace_address", F.coalesce(F.col("trace_address"), F.array().cast("array<int>"))
    )
    failed = (
        traces.filter(F.col("error").isNotNull())
        .groupBy("tx_hash")
        .agg(F.collect_list("trace_address").alias("_failed_prefixes"))
    )
    joined = traces.join(failed, "tx_hash", "left")
    t = F.col("trace_address")

    def is_prefix(p):
        return (F.size(p) <= F.size(t)) & (F.slice(t, 1, F.size(p)) == p)

    inherited = F.coalesce(F.exists("_failed_prefixes", is_prefix), F.lit(False))
    return joined.withColumn(
        "error",
        F.when(inherited, F.lit(PARENT_FAILED)).otherwise(F.col("error")),
    ).drop("_failed_prefixes")


def extract_deployments(traces: DataFrame, propagate_errors: bool = True) -> DataFrame:
    """P1: create traces -> raw deployment rows (before bytecode enrichment).

    failed_deploy covers both the trace's own error and inherited parent
    failure (src/models/trace.rs:103-126)."""
    t = propagate_trace_errors(traces) if propagate_errors else traces
    return t.filter(F.col("type") == "create").select(
        F.col("result_address").alias("contract"),
        F.col("action_from").alias("creator"),
        F.col("block_number"),
        F.col("tx_hash"),
        F.col("error").isNotNull().alias("failed_deploy"),
        F.col("action_init").alias("creation_bytecode"),
        F.col("result_code").alias("deployed_bytecode"),
    )


def extract_destructions(traces: DataFrame, propagate_errors: bool = True) -> DataFrame:
    """P2: suicide traces -> destruction rows
    (src/models/contract_destruction.rs:33-59)."""
    t = propagate_trace_errors(traces) if propagate_errors else traces
    return t.filter(F.col("type") == "suicide").select(
        F.col("action_address").alias("contract"),
        F.col("block_number"),
        F.col("tx_hash"),
        F.col("error").isNotNull().alias("failed"),
        F.col("action_balance").alias("balance_left"),
        F.col("action_refund_address").alias("refund_address"),
    )
