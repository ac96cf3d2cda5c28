"""Build BANDS.json — machine-readable per-query bench bands — from N
isolated warm bench draws (VERDICT r11 item 6: the bands lived in
BASELINE.md prose, forcing judge and driver to re-derive "drift vs
regression" by hand each round).

Usage:
    python bench.py > /tmp/draw1.json   # isolated, warm page cache
    python bench.py > /tmp/draw2.json
    python bench.py > /tmp/draw3.json
    python tools/make_bands.py /tmp/draw*.json > BANDS.json

Band = [p10, p90] of the draws per query (with 2-3 draws that is
min/max — the honest small-sample band; the `n` field records how many
draws back each band so a reader can weigh it). bench.py reads
BANDS.json when present and emits `band_flags` for queries landing
outside [p10*0.85, p90*1.15] — the r10/r11 judge rule "regressions
>1.15x need a named cause" made executable.
"""

from __future__ import annotations

import json
import sys


def pctl(vals: list[float], p: float) -> float:
    """Linear-interpolated percentile (numpy 'linear' method, inlined so
    the tool stays stdlib-only)."""
    v = sorted(vals)
    if len(v) == 1:
        return v[0]
    idx = p / 100 * (len(v) - 1)
    lo = int(idx)
    hi = min(lo + 1, len(v) - 1)
    return v[lo] + (v[hi] - v[lo]) * (idx - lo)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    draws = []
    for path in sys.argv[1:]:
        with open(path) as f:
            lines = f.read().splitlines()
        # prefer the full-precision stderr BENCH_DETAIL record (r14+: the
        # stdout contract line is trimmed to fit the driver's 2000-char
        # tail window); otherwise the bench JSON line is the LAST line
        # starting with "{" (warmup chatter may precede)
        detail = [ln.split("BENCH_DETAIL ", 1)[1] for ln in lines if "BENCH_DETAIL " in ln]
        line = detail[-1] if detail else [ln for ln in lines if ln.strip().startswith("{")][-1]
        draws.append(json.loads(line))
    per_query: dict[str, list[float]] = {}
    for d in draws:
        for q, t in d.get("queries", {}).items():
            per_query.setdefault(q, []).append(float(t))
    bands = {
        q: {
            "p10": round(pctl(ts, 10), 3),
            "p90": round(pctl(ts, 90), 3),
            "n": len(ts),
        }
        for q, ts in sorted(per_query.items())
    }
    out = {
        "unit": "sec",
        "sf": draws[0].get("sf"),
        "draws": len(draws),
        "comparable_subtotals": [d.get("comparable_subtotal_sec") for d in draws],
        "totals": [d.get("value") for d in draws],
        "queries": bands,
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
