"""SparkSession builder tuned for this engine.

Defaults are sized for local[$SPARK_GRAFT_CPUS] testing but every knob is the
one we would set on a 1000-executor cluster too: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), UTC session timezone (chain
timestamps are UTC; also keeps the DuckDB oracle comparable), Arrow for the
pandas_udf kernels, and a shuffle-partition count that AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_SHUFFLE = "32"


def _default_driver_mem() -> str:
    """Half of physical RAM in whole GiB, clamped to [4g, 24g]; 8g when
    the probe fails (non-Linux)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) // (1024 * 1024)
                    return f"{min(24, max(4, total_gib // 2))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "eth2dgraph-spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", _DEF_SHUFFLE))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join handling, dynamic join strategy.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # false = coalesce to advisoryPartitionSizeInBytes instead of
        # stopping at defaultParallelism — Spark's own config doc
        # recommends false on clusters, and it is the guide-§2.2
        # "fewer, larger reduce partitions" lever. Measured r14
        # (interleaved A/B, tools/measure_r14_iterab.py): iterative
        # kernels 0.89x (lpa 0.72x), streams cross_dedup_stream 0.69x,
        # relational 0.64-0.86x, net 0.92-0.96x across mixed sets; the
        # one consistent regression (ngram_jaccard ~1.15x) is mitigated
        # at the query with an explicit repartition.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # Arrow transfer for pandas_udf / mapInPandas kernels.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamps vs the DuckDB oracle and chain data (UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # The driver testdata's events.ts has changed parquet type across
        # driver versions (TIMESTAMP(NANOS), then timestamp[us]/NTZ). Keep
        # nanosAsLong on so a NANOS file reads as long instead of erroring;
        # the source layer (sources.testdata._fix_nanos) normalizes every
        # representation to one session-TZ TIMESTAMP.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Keep scans well-sized at local scale; on a cluster this is the same
        # knob that bounds per-task input at ~128 MB.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # local[32] is a single JVM: driver memory IS executor memory. 8g
        # starves 32 threads once iterative queries pin localCheckpoint'ed
        # partitions (measured at sf0.1: pagerank 20.8 s -> 8.5 s,
        # byte_kernels 25.2 s -> 11.7 s going 8g -> 24g on a 128 GiB box).
        # Default adapts to the machine (half of physical RAM, clamped to
        # [4g, 24g]) so small boxes don't hand the JVM more heap than
        # exists and get OOM-killed mid-query. On a real cluster this knob
        # is per-executor memory at deploy time.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", _default_driver_mem()))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
