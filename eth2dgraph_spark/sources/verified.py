"""Verified-source lookup (J7/S8): join deployments against a
smart-contract-sanctuary-style checkout.

Reference behavior (src/models/contract_deployment.rs:158-193): for each
deployed contract, glob `<root>/<addr[0:2]>/<addr>*`, take the FIRST match,
mark verified_source=true and load the file body; the contract name is the
`<addr>_<Name>.sol` filename suffix.

Spark-first shape: ingest the file tree ONCE into an (address-prefixed)
sources table, then a plain left join — the per-row glob disappears, and the
address-prefix directory layout becomes partition pruning when the sources
table is written partitioned by `prefix`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_ZERO_X = "0x"


def ingest_sanctuary(spark: SparkSession, root: str) -> DataFrame:
    """Read a sanctuary checkout `<root>/<prefix>/<addr>_<Name>.sol` into
    (address, prefix, name, verified_source_code). First match per address
    wins, ordered by path (the reference takes the first glob hit —
    src/models/contract_deployment.rs:182-190)."""
    raw = spark.read.text(f"{root}/*/*", wholetext=True).withColumn(
        "path", F.input_file_name()
    )
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    addr = F.lower(F.regexp_extract(fname, r"(0x[0-9a-fA-F]{40})", 1))
    name = F.regexp_extract(fname, r"0x[0-9a-fA-F]{40}_(.+?)\.sol$", 1)
    parsed = raw.select(
        addr.alias("address"),
        F.substring(addr, 3, 2).alias("prefix"),
        F.when(name != "", name).alias("name"),
        F.col("value").alias("verified_source_code"),
        "path",
    ).filter(F.col("address") != "")
    w = Window.partitionBy("address").orderBy("path")
    return (
        parsed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "path")
    )


def write_sources_table(sources: DataFrame, path: str) -> None:
    """Persist the sources table partitioned by 2-hex-char prefix (256
    partitions) — the Spark analog of the sanctuary's `<addr[0:2]>/` dirs;
    point lookups prune to one partition."""
    sources.write.mode("overwrite").partitionBy("prefix").parquet(path)


def join_verified_sources(deployments: DataFrame, sources: DataFrame) -> DataFrame:
    """Left join deployments -> sources on contract address, filling the
    reference's verified_source / verified_source_code / name columns
    (src/models/contract_deployment.rs:22-35). Existing name (from the
    name() eth_call) wins over the filename-derived one, as in the
    reference where resolve_name runs first."""
    # case-insensitive match WITHOUT mutating the contract column: the old
    # withColumn("contract", lower(...)) permanently lowercased EIP-55
    # checksummed addresses in the output, silently diverging every later
    # join/overwrite against the unmodified deployments table
    src = sources.select(
        F.lower(F.col("address")).alias("_src_addr"),
        F.col("name").alias("_src_name"),
        F.col("verified_source_code").alias("_src_code"),
    )
    out = deployments.join(
        src, F.lower(deployments["contract"]) == src["_src_addr"], "left"
    ).drop("_src_addr")
    name_col = (
        F.coalesce(F.col("name"), F.col("_src_name"))
        if "name" in deployments.columns
        else F.col("_src_name")
    )
    return (
        out.withColumn("verified_source", F.col("_src_code").isNotNull())
        .withColumn("verified_source_code", F.col("_src_code"))
        .withColumn("name", name_col)
        .drop("_src_name", "_src_code")
    )
