"""Property-based differentials for events_to_scd2 and resample_ffill:
random event logs (same-timestamp collisions, single-event keys, long
no-op runs, NULL attributes) through the Spark operators vs sequential
Python references — collapse order, validity chaining, bucket collapse
and forward-fill pinned on shapes the fixture tables can't cover."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bullet_spark_spark.operators import relational as rel
from bullet_spark_spark.operators import temporal as tmp

_BASE = dt.datetime(2024, 1, 1)


@st.composite
def event_log(draw):
    n = draw(st.integers(1, 12))
    rows = []
    for i in range(n):
        key = draw(st.sampled_from(["k1", "k2"]))
        # coarse hour grid forces same-timestamp collisions (seq breaks ties)
        ts = _BASE + dt.timedelta(hours=draw(st.integers(0, 4)))
        attr = draw(st.sampled_from(["A", "B", None]))
        rows.append((key, attr, ts, i))
    return rows


def _scd2_reference(rows):
    out = set()
    by_key: dict[str, list] = {}
    for k, a, ts, seq in rows:
        by_key.setdefault(k, []).append((ts, seq, a))
    for k, evs in by_key.items():
        evs.sort()
        versions = []
        prev = object()
        for ts, _seq, a in evs:
            if a != prev:
                versions.append((ts, a))
                prev = a
        for i, (ts, a) in enumerate(versions):
            valid_to = versions[i + 1][0] if i + 1 < len(versions) else None
            out.add((k, a, ts, valid_to, valid_to is None))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_log())
def test_scd2_matches_sequential_reference(spark, rows):
    df = spark.createDataFrame(
        rows, "k string, a string, ts timestamp, seq long"
    )
    got = {
        (r["k"], r["a"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in rel.events_to_scd2(df, ["k"], ["a"], "ts", ["seq"]).collect()
    }
    assert got == _scd2_reference(rows)


@st.composite
def series(draw):
    n = draw(st.integers(1, 10))
    rows = []
    for i in range(n):
        key = draw(st.sampled_from(["s1", "s2"]))
        minutes = draw(st.integers(0, 600))
        rows.append((key, _BASE + dt.timedelta(minutes=minutes), float(i)))
    return rows


def _resample_reference(rows, step=3600):
    out = set()
    by_key: dict[str, list] = {}
    for k, ts, v in rows:
        b = int(ts.timestamp()) // step
        by_key.setdefault(k, []).append((b, ts, v))
    for k, obs in by_key.items():
        per_bucket = {}
        for b, ts, v in obs:
            # latest ts wins; ties by larger value (the operator's order)
            cur = per_bucket.get(b)
            if cur is None or (ts, v) > cur:
                per_bucket[b] = (ts, v)
        lo, hi = min(per_bucket), max(per_bucket)
        last = None
        for b in range(lo, hi + 1):
            if b in per_bucket:
                last = per_bucket[b][1]
                out.add((k, b * step, last, False))
            else:
                out.add((k, b * step, last, True))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(series())
def test_resample_matches_sequential_reference(spark, rows):
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        (
            r["k"],
            int(r["bucket_ts"].replace(tzinfo=dt.timezone.utc).timestamp()),
            r["v"],
            r["is_gap"],
        )
        for r in tmp.resample_ffill(df, "k", "ts", ["v"], 3600).collect()
    }
    ref = {
        (k, b, v, g)
        for (k, b, v, g) in _resample_reference(
            [(k, ts.replace(tzinfo=dt.timezone.utc), v) for k, ts, v in rows]
        )
    }
    assert got == ref
