"""J7/S8 verified-source lookup and S9/U3 name() enrichment seams.
Reference: src/models/contract_deployment.rs:118-193."""

import os

from pyspark.sql import functions as F

from eth2dgraph_spark.operators.enrich import resolve_names
from eth2dgraph_spark.sources.verified import (
    ingest_sanctuary,
    join_verified_sources,
    write_sources_table,
)

ADDR_A = "0x" + "aa" * 20
ADDR_B = "0x" + "bb" * 20
ADDR_C = "0x" + "cc" * 20


def _mk_sanctuary(tmp_path):
    root = tmp_path / "mainnet"
    (root / "aa").mkdir(parents=True)
    (root / "bb").mkdir(parents=True)
    (root / "aa" / f"{ADDR_A}_TokenA.sol").write_text("contract TokenA {}")
    # two files for B: first by path order must win (reference glob first-match)
    (root / "bb" / f"{ADDR_B}_First.sol").write_text("contract First {}")
    (root / "bb" / f"{ADDR_B}_Second.sol").write_text("contract Second {}")
    return str(root)


def test_ingest_sanctuary_first_match_wins(spark, tmp_path):
    src = ingest_sanctuary(spark, _mk_sanctuary(tmp_path))
    rows = {r["address"]: r for r in src.collect()}
    assert set(rows) == {ADDR_A, ADDR_B}
    assert rows[ADDR_A]["name"] == "TokenA"
    assert rows[ADDR_A]["prefix"] == "aa"
    assert rows[ADDR_A]["verified_source_code"] == "contract TokenA {}"
    assert rows[ADDR_B]["name"] == "First"  # first glob hit, not Second


def test_join_verified_sources(spark, tmp_path):
    src = ingest_sanctuary(spark, _mk_sanctuary(tmp_path))
    deps = spark.createDataFrame(
        [(ADDR_A.upper(), 1), (ADDR_C, 2)], "contract string, block_number long"
    )
    out = {r["contract"]: r for r in join_verified_sources(deps, src).collect()}
    # the ORIGINAL (checksummed/upper) casing survives the join — the match
    # is case-insensitive but the column is never mutated (a lowercased
    # output would diverge from every later join against the raw table)
    assert out[ADDR_A.upper()]["verified_source"] is True
    assert out[ADDR_A.upper()]["name"] == "TokenA"
    assert out[ADDR_C]["verified_source"] is False
    assert out[ADDR_C]["verified_source_code"] is None


def test_sources_table_partition_pruning(spark, tmp_path):
    src = ingest_sanctuary(spark, _mk_sanctuary(tmp_path))
    path = str(tmp_path / "sources_tbl")
    write_sources_table(src, path)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("prefix=")
    ) == ["prefix=aa", "prefix=bb"]
    pruned = spark.read.parquet(path).filter(F.col("prefix") == "aa")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 1
    assert "aa" in plan  # partition filter reached the scan


def test_resolve_names_batched_fake_rpc(spark):
    # bytecode of A contains the name() selector; C does not -> no RPC for C
    deps = spark.createDataFrame(
        [
            (ADDR_A, "0x6080604506fdde0360e01b"),
            (ADDR_C, "0x60806045"),
        ],
        "contract string, deployed_bytecode string",
    )
    calls = []

    def fake_resolver(addresses):
        calls.append(list(addresses))
        return ["FakeToken" for _ in addresses]

    out = {r["contract"]: r["name"] for r in resolve_names(deps, fake_resolver).collect()}
    assert out == {ADDR_A: "FakeToken", ADDR_C: None}


def test_resolve_names_default_raises(spark):
    deps = spark.createDataFrame(
        [(ADDR_A, "0x06fdde03")], "contract string, deployed_bytecode string"
    )
    import pytest

    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        resolve_names(deps).collect()
