"""eth2dgraph_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of davideaimar/eth2dgraph.

Not a port: the reference (Rust ETL -> Dgraph property graph) is re-expressed
as DataFrame/Spark-SQL derivations over ~10 schema'd Parquet tables, with
Structured Streaming for the live path and pandas_udf kernels only for the
genuinely byte-level work (skeleton extraction, keccak, CBOR metadata).

Layout:
  session    — tuned SparkSession builder (AQE, UTC, Arrow)
  schemas    — explicit StructType per table (SURVEY.md §1)
  sources    — parquet readers for chain tables + driver testdata
  functions  — scalar/byte-level kernels (SURVEY.md §2.3, §2.7, §2.9)
  operators  — named DataFrame derivations (SURVEY.md §2)
  pipeline   — large-scale training-data ops (dedup, ANN, text, multimodal)
  streaming  — foreachBatch idempotent per-block sink (SURVEY.md §2.8)
  queries    — the query surface (relational + eth analytics)
"""

__version__ = "0.1.0"
