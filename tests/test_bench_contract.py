"""The bench driver contract: the ONE stdout JSON line must fit the
driver's 2000-char stdout tail window (BENCH_r12/r13 were `"parsed": null`
because the line outgrew it), and the elevated-draw self-diagnosis must
recognize the archived host-steal receipts (VERDICT r13 item 3)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _shrunk_line(timings, errors=None, elevated=False):
    line = bench.contract_line(timings, errors or {}, 0.1, elevated, ndigits=2)
    if len(line) > 1900:
        line = bench.contract_line(timings, errors or {}, 0.1, elevated, ndigits=1)
    return line


def test_contract_line_fits_driver_tail_worst_case():
    # worst case: every headline query present, every timing 3 digits + 3
    # decimals (a fully host-stalled draw), plus the elevated marker
    timings = {q: 123.456 for q in bench.HEADLINE}
    line = _shrunk_line(timings, elevated=True)
    assert len(line) <= 2000, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_sec"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["draw_elevated"] is True
    # total keeps full precision even when per-query values are rounded
    assert parsed["value"] == round(123.456 * len(bench.HEADLINE), 3)


def test_contract_line_realistic_draw_fits_at_two_decimals():
    # a realistic draw (archived r14 final draw) fits without the 1-decimal
    # fallback
    with open(os.path.join(REPO, "tools/bands_draws_r14/final_draw1.json")) as f:
        d = json.load(f)
    line = bench.contract_line(d["queries"], {}, 0.1, False, ndigits=2)
    assert len(line) <= 1900, len(line)
    assert json.loads(line)["queries"].keys() == d["queries"].keys()


def test_contract_line_errors_truncated():
    timings = {q: 1.234 for q in bench.HEADLINE}
    errors = {"pagerank_ranks": "x" * 500}
    line = _shrunk_line(timings, errors=errors)
    parsed = json.loads(line)
    assert len(parsed["errors"]["pagerank_ranks"]) == 80
    assert "pagerank_ranks" in parsed["errors"]


def test_detect_elevated_on_archived_host_steal_draws():
    # the r13 documented receipt: 40+ diffuse highs at 1.16-1.77x, no
    # single-query outlier
    for name in ("confirm_elevated_1", "confirm_elevated_2"):
        with open(os.path.join(REPO, f"tools/bands_draws_r13/{name}.json")) as f:
            d = json.load(f)
        elevated, median = bench.detect_elevated(d["band_flags"])
        assert elevated, name
        assert 1.15 <= median <= 1.8


def test_detect_elevated_not_fired_by_single_regression():
    # one genuinely regressed query must NOT read as environment
    flags = {"q%d" % i: {"flag": "high", "ratio": 1.3} for i in range(14)}
    flags["bad_query"] = {"flag": "high", "ratio": 5.0}
    elevated, _ = bench.detect_elevated(flags)
    assert not elevated  # max ratio 5.0 > 2.5 → a real outlier exists
    few = {"q%d" % i: {"flag": "high", "ratio": 1.3} for i in range(5)}
    assert bench.detect_elevated(few) == (False, None)


def test_band_flags_thresholds():
    bands = {"a": {"p10": 1.0, "p90": 2.0}, "b": {"p10": 1.0, "p90": 2.0}}
    flags = bench.band_flags({"a": 2.5, "b": 1.5, "c": 1.0}, bands)
    assert flags["a"] == {"flag": "high", "ratio": 1.25}
    assert "b" not in flags  # inside the band
    assert flags["c"] == {"flag": "no_band"}
