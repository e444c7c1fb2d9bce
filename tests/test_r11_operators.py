"""Round-11 operator hardening: hot-group-skew-safe per-group quantiles
(range-partitioned in-group rank — the column_stats posture), interval-
overlap width auto-derivation + long-split (tested in test_r10_additions),
and the skewed-fixture certification paths (VERDICT r10 tasks 5-7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import distribution as dist


def _np_quantile(vals, p):
    # numpy 'linear' == DuckDB quantile_cont == the engine's h=(n-1)p rule
    return float(np.quantile(np.array(vals, dtype="float64"), p, method="linear"))


def test_group_quantiles_hot_group_skew(spark):
    """One group holds 90% of the rows (the hot-language corpus shape the
    r11 range-partitioned rank exists for): values bit-identical to the
    sequential h=(n-1)p interpolation on every group, hot or cold."""
    rng = np.random.RandomState(7)
    hot = [("hot", float(v)) for v in rng.lognormal(3.0, 1.0, 9000)]
    cold = [
        (f"cold{i % 3}", float(v))
        for i, v in enumerate(rng.normal(50.0, 5.0, 1000))
    ]
    df = spark.createDataFrame(hot + cold, "g string, v double")
    probs = [0.1, 0.5, 0.9, 0.99]
    got = {
        (r["g"], r["prob"]): r["value"]
        for r in dist.group_quantiles(df, ["g"], "v", probs).collect()
    }
    by_g: dict[str, list[float]] = {}
    for g, v in hot + cold:
        by_g.setdefault(g, []).append(v)
    assert len(got) == len(by_g) * len(probs)
    for g, vals in by_g.items():
        for p in probs:
            assert got[(g, p)] == pytest.approx(
                round(_np_quantile(vals, p), 6), abs=1e-6
            ), (g, p)


def test_group_quantiles_multi_group_cols_and_ties(spark):
    """Composite group key + heavy value ties (the rank tiebreak must not
    change the interpolated value) + a 1-row group (h=0 everywhere)."""
    rows = (
        [("a", "x", 1.0)] * 5
        + [("a", "x", 2.0)] * 5
        + [("a", "y", 7.0)]
        + [("b", "x", float(i)) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "g1 string, g2 string, v double")
    got = {
        (r["g1"], r["g2"], r["prob"]): r["value"]
        for r in dist.group_quantiles(df, ["g1", "g2"], "v", [0.5]).collect()
    }
    assert got[("a", "x", 0.5)] == pytest.approx(1.5, abs=1e-9)
    assert got[("a", "y", 0.5)] == pytest.approx(7.0, abs=1e-9)
    assert got[("b", "x", 0.5)] == pytest.approx(4.5, abs=1e-9)


def test_group_quantiles_no_pergroup_window(spark):
    """Plan shape: the physical plan must contain NO window partitioned
    by the group alone (the single-task-per-group funnel); every window
    runs over (group, range-partition-id) slices."""
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(100)], "g string, v double"
    )
    plan = dist.group_quantiles(df, ["g"], "v", [0.5])._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # physical Window nodes print as:
            #   Window [row_number() ... partition spec: [g#1, __pid#2] ...
            # assert __pid rides every partition spec
            if "row_number" in line:
                assert "__pid" in line, line
