"""Bench capture-line contract (r9, verdict task #2).

The driver keeps only the LAST 2000 chars of bench stdout; the full 92-entry
JSON line does not fit, so bench.py prints a second, fully-parseable line for
that window. Its membership must be STATIC — through r8 it was the top-N
slowest queries, which rotates with timing noise and made the driver report
phantom dropped/new queries every round. No Spark needed here.
"""

from __future__ import annotations

import importlib.util
import json
import os
import random

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location("benchmod", os.path.join(HERE, "bench.py"))
benchmod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(benchmod)

METRIC = "graph_build+query_library_total_wall_sec"


def _timings(rng=None):
    rng = rng or random.Random(7)
    return {n: round(rng.uniform(0.3, 40.0), 3) for n in benchmod._CAPTURE_PRIORITY}


def test_capture_line_fits_driver_window_and_parses():
    t = _timings()
    line = benchmod._capture_line(t, METRIC, sum(t.values()), 0.1)
    assert len(line) <= 1999
    p = json.loads(line)
    assert p["metric"] == METRIC and p["unit"] == "sec" and p["sf"] == 0.1
    assert p["queries_truncated_to_top_n"] == len(p["queries"])


def test_capture_membership_is_timing_invariant():
    base = set(json.loads(benchmod._capture_line(_timings(), METRIC, 1.0, 0.1))["queries"])
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        t = {n: v * rng.uniform(0.05, 5.0) for n, v in _timings().items()}
        got = set(json.loads(benchmod._capture_line(t, METRIC, sum(t.values()), 0.1))["queries"])
        assert got == base, "capture membership rotated with timing noise"


def test_capture_membership_covers_r8_driver_window():
    # the r8 driver window held these 71 — the stable set must be a superset,
    # or the round-over-round comparator reports them as dropped
    r8_path = os.path.join(HERE, "BENCH_r08.json")
    if not os.path.exists(r8_path):
        return
    r8 = set(json.load(open(r8_path))["parsed"]["queries"])
    got = set(json.loads(benchmod._capture_line(_timings(), METRIC, 1.0, 0.1))["queries"])
    assert r8 <= got, sorted(r8 - got)


def test_capture_values_stay_within_width_model():
    # the deterministic cut assumes ≤4 rendered chars per value
    for v in (0.003, 0.89, 9.994, 9.996, 12.46, 99.95, 246.51, 999.9, 4321.0):
        assert len(json.dumps(benchmod._capture_value(v))) <= 5, v


def test_capture_handles_added_queries_deterministically():
    # contract: entries may be ADDED to queries; new names sort after the
    # static list by name and never perturb existing membership
    t = _timings()
    base = set(json.loads(benchmod._capture_line(t, METRIC, 1.0, 0.1))["queries"])
    t2 = dict(t, zzz_new_query=1.234)
    got = set(json.loads(benchmod._capture_line(t2, METRIC, 1.0, 0.1))["queries"])
    assert base <= got or base - got == set()
    assert base - got == set(), "adding a query must not evict existing members"
