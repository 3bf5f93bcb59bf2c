"""bench.py stdout contract: the single JSON line must stay under the
driver's line-tail buffer (r8: the full 100-query map overflowed it
and BENCH_r08 recorded parsed: null) while keeping the summary fields
and the slowest queries' numbers."""

from __future__ import annotations

import json

import bench


def _times(n):
    return {
        f"text_quality_percentile_filter_{i:03d}": 0.05 + (i % 17) * 0.37
        for i in range(n)
    }


def test_line_bounded_and_parseable_at_any_registry_size():
    for n in (1, 10, 58, 100, 200, 400):
        times = _times(n)
        line = bench._stdout_line(round(sum(times.values()), 3), times, 0.1)
        assert len(line) <= bench.STDOUT_BUDGET, (n, len(line))
        d = json.loads(line)
        assert d["metric"] == "headline_queries_total_sec"
        assert d["n_queries"] == n
        assert d["value"] == round(sum(times.values()), 3)
        kept = d["queries"]
        omitted = d.get("queries_omitted", 0)
        assert len(kept) + omitted == n
        if omitted:
            assert d["detail"] == "BENCH_DETAIL.json"
            # the kept entries are the SLOWEST ones
            floor = max(v for k, v in times.items() if k not in kept)
            assert all(times[k] >= floor - 1e-9 for k in kept)


def test_small_map_untouched():
    times = {f"q{i}": 1.0 for i in range(10)}
    d = json.loads(bench._stdout_line(10.0, times, 0.01))
    assert "queries_omitted" not in d
    assert len(d["queries"]) == 10


def test_overshoot_clamps_to_summary_only():
    """r9 review: the per-entry byte estimate can overshoot keep past
    0 on long query names; the loop must clamp and emit the
    summary-only payload instead of raising."""
    long = {f"x_{'dedup_incremental_bloom_prefilter'*3}_{i:04d}": 1.0
            for i in range(600)}
    d = json.loads(bench._stdout_line(600.0, long, 0.1))
    assert d["n_queries"] == 600
    assert len(json.dumps(d, separators=(",", ":"))) <= bench.STDOUT_BUDGET
    assert d["queries_omitted"] + len(d["queries"]) == 600
