"""Capture the CC ROUND subplan (one _small_star(_large_star(e)) step) —
the final dedup_clusters plan only shows checkpointed-RDD scans, so the
round shape the r14 window-star rewrite changed is explained directly
here, on the same sf's near-dup pair graph the gate runs CC over.

Usage: python tools/explain_cc_round_r14.py <suffix ("before"|"after")>
`before` reconstructs the legacy groupBy+join stars in-process (the code
at the r14 round-start commit); `after` uses the shipped implementation.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    suffix = sys.argv[1]
    from pyspark.sql import functions as F

    import eth2dgraph_spark.graph as G
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("explain-cc-round")
    spark.sparkContext.setLogLevel("ERROR")

    if suffix == "before":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
        from measure_r14_ab2 import _LegacyStars

        ctx = _LegacyStars()
        ctx.__enter__()
        try:
            _capture(spark, F, G, suffix)
        finally:
            ctx.__exit__()
    else:
        _capture(spark, F, G, suffix)


def _capture(spark, F, G, suffix: str) -> None:
    # the dedup_clusters gate's pair graph at this sf
    import __spark_entry__ as E

    qs = E.queries()
    # build the same pair frame the gate feeds into duplicate_clusters:
    # reuse minhash_lsh_pairs (the gate's pair source family); any (a, b)
    # pair frame gives the identical round SHAPE, which is what's captured
    pairs = qs["minhash_lsh_pairs"](spark, SF_DIR)
    e = G._canonical_undirected(pairs, pairs.columns[0], pairs.columns[1])
    rnd = G._small_star(G._large_star(e), oriented=(suffix == "after"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        rnd.explain("formatted")
    out = os.path.join(OUT_DIR, f"cc_round_{suffix}.txt")
    with open(out, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out} ({len(buf.getvalue().splitlines())} lines)")


if __name__ == "__main__":
    main()
