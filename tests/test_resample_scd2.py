"""resample_ffill (temporal.py) and events_to_scd2 (relational.py) tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bullet_spark_spark.operators import relational as rel
from bullet_spark_spark.operators import temporal as tmp


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_resample_fills_gaps_and_flags_them(spark):
    df = spark.createDataFrame(
        [("a", _ts(0, 30), 1.0), ("a", _ts(3, 10), 4.0)],
        "k string, ts timestamp, v double",
    )
    rows = sorted(
        tmp.resample_ffill(df, "k", "ts", ["v"], 3600).collect(),
        key=lambda r: r["bucket_ts"],
    )
    # hourly grid from hour 0 to hour 3 inclusive
    assert [r["bucket_ts"].hour for r in rows] == [0, 1, 2, 3]
    assert [r["v"] for r in rows] == [1.0, 1.0, 1.0, 4.0]
    assert [r["is_gap"] for r in rows] == [False, True, True, False]


def test_resample_latest_wins_within_bucket(spark):
    df = spark.createDataFrame(
        [("a", _ts(0, 10), 1.0), ("a", _ts(0, 50), 2.0)],
        "k string, ts timestamp, v double",
    )
    (row,) = tmp.resample_ffill(df, "k", "ts", ["v"], 3600).collect()
    assert row["v"] == 2.0 and not row["is_gap"]


def test_resample_grid_is_per_key(spark):
    # key b observed only at hour 5: no padding back to key a's range
    df = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(2), 2.0), ("b", _ts(5), 9.0)],
        "k string, ts timestamp, v double",
    )
    out = tmp.resample_ffill(df, "k", "ts", ["v"], 3600)
    assert out.filter(F.col("k") == "b").count() == 1
    assert out.filter(F.col("k") == "a").count() == 3


def test_scd2_collapses_runs_and_chains_validity(spark):
    df = spark.createDataFrame(
        [
            ("c1", "LOW", _ts(1), 1),
            ("c1", "LOW", _ts(2), 2),     # no-op event: same state
            ("c1", "HIGH", _ts(3), 3),
            ("c1", "LOW", _ts(4), 4),     # back to LOW = NEW version
        ],
        "k string, prio string, ts timestamp, seq long",
    )
    rows = sorted(
        rel.events_to_scd2(df, ["k"], ["prio"], "ts", ["seq"]).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["prio"], r["valid_from"].hour) for r in rows] == [
        ("LOW", 1), ("HIGH", 3), ("LOW", 4)
    ]
    assert [r["valid_to"].hour if r["valid_to"] else None for r in rows] == [3, 4, None]
    assert [r["is_current"] for r in rows] == [False, False, True]


def test_scd2_null_vs_empty_attr_are_distinct_states(spark):
    df = spark.createDataFrame(
        [("c1", None, _ts(1), 1), ("c1", "", _ts(2), 2)],
        "k string, a string, ts timestamp, seq long",
    )
    rows = rel.events_to_scd2(df, ["k"], ["a"], "ts", ["seq"]).collect()
    assert len(rows) == 2  # NULL -> '' is a real change


def test_scd2_reapply_is_idempotent(spark):
    # re-deriving from history's version starts + an empty batch = same history
    df = spark.createDataFrame(
        [("c1", "A", _ts(1), 1), ("c1", "B", _ts(5), 2)],
        "k string, a string, ts timestamp, seq long",
    )
    hist = rel.events_to_scd2(df, ["k"], ["a"], "ts", ["seq"])
    replay = hist.select(
        "k", "a", F.col("valid_from").alias("ts"), F.lit(0).alias("seq")
    )
    hist2 = rel.events_to_scd2(replay, ["k"], ["a"], "ts", ["seq"])
    a = {(r["k"], r["a"], r["valid_from"], r["valid_to"]) for r in hist.collect()}
    b = {(r["k"], r["a"], r["valid_from"], r["valid_to"]) for r in hist2.collect()}
    assert a == b


def test_scd2_single_exchange(spark):
    df = spark.createDataFrame(
        [("c1", "A", _ts(1), 1)], "k string, a string, ts timestamp, seq long"
    )
    plan = (
        rel.events_to_scd2(df, ["k"], ["a"], "ts", ["seq"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1  # lag + lead share one key shuffle


def test_unpivot_round_trips_pivot(spark):
    wide = spark.createDataFrame(
        [(1, 10.0, 0.5), (2, 20.0, 0.7)], "k long, a double, b double"
    )
    tall = rel.unpivot(wide, ["k"], ["a", "b"], "m", "v")
    assert tall.count() == 4
    got = {(r["k"], r["m"]): r["v"] for r in tall.collect()}
    assert got == {(1, "a"): 10.0, (1, "b"): 0.5, (2, "a"): 20.0, (2, "b"): 0.7}
    back = tall.groupBy("k").pivot("m", ["a", "b"]).sum("v")
    assert {tuple(r) for r in back.collect()} == {(1, 10.0, 0.5), (2, 20.0, 0.7)}


def test_unpivot_no_shuffle(spark):
    wide = spark.createDataFrame([(1, 1.0, 2.0)], "k long, a double, b double")
    plan = (
        rel.unpivot(wide, ["k"], ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_incremental_agg_matches_recompute(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.5), (2, "a", 20.0), (3, "b", 5.25), (4, "c", 1.0)],
        "k long, g string, v double",
    )
    # change k=1 (a: 10.5 -> 11.0), remove k=3 (kills group b... no, b
    # had only k=3 -> group disappears), add k=9 (new group d)
    new = spark.createDataFrame(
        [(1, "a", 11.0), (2, "a", 20.0), (4, "c", 1.0), (9, "d", 7.0)],
        "k long, g string, v double",
    )
    base = rel.group_snapshot_agg(old, ["g"], [("v", "sv")])
    old_changed = old.filter(F.col("k").isin(1, 3))
    new_changed = new.filter(F.col("k").isin(1, 9))
    got = {
        r["g"]: (r["n_rows"], float(r["sv"]))
        for r in rel.incremental_group_update(
            base, old_changed, new_changed, ["g"], [("v", "sv")]
        ).collect()
    }
    want = {
        r["g"]: (r["n_rows"], float(r["sv"]))
        for r in rel.group_snapshot_agg(new, ["g"], [("v", "sv")]).collect()
    }
    assert got == want
    assert "b" not in got and got["d"] == (1, 7.0)


def test_incremental_agg_noop_change_cancels(spark):
    old = spark.createDataFrame([(1, "a", 3.0)], "k long, g string, v double")
    base = rel.group_snapshot_agg(old, ["g"], [("v", "sv")])
    out = rel.incremental_group_update(
        base, old, old, ["g"], [("v", "sv")]
    ).collect()
    assert [(r["g"], r["n_rows"], float(r["sv"])) for r in out] == [("a", 1, 3.0)]


def test_trailing_window_agg_semantics(spark):
    import datetime as dt

    from bullet_spark_spark.operators import temporal as tp

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0, 1.0),
        ("u", t0 + dt.timedelta(seconds=50), 2.0),
        ("u", t0 + dt.timedelta(seconds=200), 4.0),   # first two fall out (>100s)
        ("u", t0 + dt.timedelta(seconds=200), 8.0),   # same-ts peer: included
        ("v", t0 + dt.timedelta(seconds=60), 16.0),   # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = tp.trailing_window_agg(df, "k", "ts", "v", 100, "tr")
    got = sorted(
        (r["k"], r["v"], r["tr"], r["tr_n"]) for r in out.collect()
    )
    assert got == [
        ("u", 1.0, 1.0, 1),
        ("u", 2.0, 3.0, 2),       # 1+2 within 100 s
        ("u", 4.0, 12.0, 2),      # peers at t=200 include each other; old out
        ("u", 8.0, 12.0, 2),
        ("v", 16.0, 16.0, 1),
    ]
