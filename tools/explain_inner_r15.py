"""Capture INNER subplans the checkpoint-cut final plans hide, for the
queries r15 touches. Currently: the lazy ngram_jaccard_pairs pipeline
under the r14 dp derivation (before) vs the width-derived one (after),
and the coreness fixed-shape layer (before = per-round cuts, after =
round-pair fusion) with _truncator patched to a passthrough so the round
structure is visible.

Usage: python tools/explain_inner_r15.py <before|after>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def _write(df, name: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT_DIR, f"{name}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue().splitlines())} lines)")


def main() -> None:
    suffix = sys.argv[1]
    import __spark_entry__ as E
    from eth2dgraph_spark.pipeline import dedup
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("explain-inner-r15")
    spark.sparkContext.setLogLevel("ERROR")
    d = E._t(spark, SF_DIR, "documents")

    if suffix == "before":
        # the r14 derivation, reconstructed
        dedup._ngram_dp = lambda sh, sess: max(
            sess.sparkContext.defaultParallelism, sh.rdd.getNumPartitions()
        )
    ng = dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05, eager=False)
    _write(ng, f"ngram_jaccard_inner_{suffix}")


if __name__ == "__main__":
    main()
