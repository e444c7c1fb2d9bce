"""The bench compact stdout line must stay parseable by the driver's
round-over-round PERF comparator (VERDICT r11 task 1).

The r11 artifact carried ``{m, s}`` dicts inside ``queries`` for the top-10
costliest queries; the driver comparator treats any non-numeric value as a
missing query, so the 7 heaviest-and-most-optimized queries read as
"dropped_from_bench" and the dict bytes pushed tail omissions from 20 to 48.
These tests pin the repaired contract: ``queries`` is plain numeric medians
only, raw samples ride in the separate ``queries_samples_top10`` key
(truncated to fit), the host-health probe is in-band (task 2), and the whole
line fits the driver's 2000-char stdout tail. No Spark session needed."""

from __future__ import annotations

import json

import bench


def _fake_out(n_queries: int = 95) -> dict:
    # long, realistic names so the budget pressure matches the real suite
    names = [f"family_{i:02d}_operator_variant_{i % 7}" for i in range(n_queries)]
    queries = {n: round(0.21 + 0.07 * i, 4) for i, n in enumerate(names)}
    top10 = sorted(queries, key=queries.get, reverse=True)[:10]
    return {
        "metric": "total_wall_sec",
        "value": sum(queries.values()),
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "queries_samples_top10": {
            n: [queries[n] * f for f in (0.97, 1.0, 1.08)] for n in top10
        },
        "probe_1task_ms": 23.4,
        "probe_1task_ms_end": 25.1,
        "streaming_rows_per_sec": 70123.4,
        "control_plane_queries_per_sec": 19.37,
        "control_plane_queries_per_sec_128": 41.58,
        "control_plane_floor_ok": True,
        "isolated": True,
    }


def test_compact_line_parses_and_fits_budget():
    line = bench._compact_line(_fake_out())
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "total_wall_sec"
    assert parsed["full"] == "BENCH_FULL.json"


def test_compact_line_queries_are_plain_numbers():
    # the driver comparator contract: EVERY value in `queries` is numeric
    parsed = json.loads(bench._compact_line(_fake_out()))
    assert parsed["queries"], "queries map must not be empty"
    for name, val in parsed["queries"].items():
        assert isinstance(val, (int, float)) and not isinstance(val, bool), (
            name,
            val,
        )


def test_compact_line_samples_ride_in_separate_key():
    parsed = json.loads(bench._compact_line(_fake_out()))
    samples = parsed["queries_samples_top10"]
    assert samples, "heavy-family samples must be present"
    ranked = sorted(
        parsed["queries"], key=parsed["queries"].get, reverse=True
    )
    # the costliest query's samples always fit
    assert ranked[0] in samples
    for name, vals in samples.items():
        assert isinstance(vals, list) and len(vals) == 3
        assert all(isinstance(v, (int, float)) for v in vals)
        # the sampled queries also appear as plain medians
        assert isinstance(parsed["queries"][name], (int, float))


def test_compact_line_health_fields_present():
    parsed = json.loads(bench._compact_line(_fake_out()))
    assert parsed["probe_1task_ms"] == 23.4
    assert parsed["streaming_rows_per_sec"] == 70123.4
    assert parsed["isolated"] is True


def test_compact_line_costliest_first_and_omission_count():
    out = _fake_out()
    parsed = json.loads(bench._compact_line(out))
    included = list(parsed["queries"])
    ranked = sorted(out["queries"], key=out["queries"].get, reverse=True)
    # greedy costliest-first fill: included set is a prefix of the ranking
    assert set(included) == set(ranked[: len(included)])
    assert parsed["queries_omitted"] == len(out["queries"]) - len(included)
    assert parsed["queries_total"] == len(out["queries"])


def test_compact_line_small_suite_fits_entirely():
    out = _fake_out(n_queries=12)
    parsed = json.loads(bench._compact_line(out))
    assert parsed["queries_omitted"] == 0
    assert len(parsed["queries"]) == 12
    assert len(parsed["queries_samples_top10"]) == bench.SAMPLES_IN_COMPACT
