"""Driver-thread job overlap (guide §2.6 "overlap independent jobs").

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially. For small latency-bound jobs (landing-file writes, tiny
partitioned sink writes, an initial-history fingerprint) the scheduling
floor dominates, so running independent actions from a thread pool lets
the next job's tasks back-fill cores freed by the current job's tail.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


def overlap_jobs(*thunks: "Callable[[], object]") -> list:
    """Run independent Spark actions concurrently from driver threads.

    Only for actions that are mutually independent AND remain correct
    under any completion order (each stream-helper call site documents
    why). Returns the thunks' results in submission order; re-raises the
    first failure (remaining jobs still run to completion — Spark jobs
    cannot be detached mid-flight from here, and the callers' sinks are
    idempotent per epoch)."""
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        return [f.result() for f in [pool.submit(t) for t in thunks]]
