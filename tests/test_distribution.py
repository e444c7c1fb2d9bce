"""Distribution strategy tests: distributed exact quantiles == built-in
percentile == DuckDB; approx sketch within tolerance (bullet's regime split,
SURVEY §7.3)."""

from __future__ import annotations

from bullet_spark_spark.operators.distribution import exact_quantiles_distributed
from bullet_spark_spark.plans import (
    DistributionAgg,
    DistributionType,
    Query,
    compile_query,
)

PROBS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def test_distributed_exact_matches_builtin(spark, tables):
    dist = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_distributed(tables["lineitem"], "l_extendedprice", PROBS).collect()
    }
    builtin = {
        r["quantile"]: r["value"]
        for r in compile_query(
            spark,
            Query(
                source="lineitem",
                aggregation=DistributionAgg(
                    type=DistributionType.QUANTILE, field="l_extendedprice", points=PROBS
                ),
            ),
        ).collect()
    }
    assert set(dist) == set(builtin)
    for p in dist:
        assert abs(dist[p] - builtin[p]) < 1e-9, p


def test_distributed_exact_matches_duckdb(spark, tables, duck):
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_distributed(tables["lineitem"], "l_extendedprice", PROBS).collect()
    }
    probs_sql = "[" + ", ".join(map(str, PROBS)) + "]"
    for p, v in duck.execute(
        f"""SELECT unnest({probs_sql}) AS q,
                   unnest(quantile_cont(l_extendedprice, {probs_sql})) AS v
            FROM lineitem"""
    ).fetchall():
        assert abs(got[float(p)] - float(v)) < 1e-9, p


def test_approx_quantile_tolerance(spark, tables, duck):
    approx = {
        r["quantile"]: r["value"]
        for r in compile_query(
            spark,
            Query(
                source="lineitem",
                aggregation=DistributionAgg(
                    type=DistributionType.QUANTILE,
                    field="l_extendedprice",
                    points=[0.25, 0.5, 0.75],
                    approx=True,
                    accuracy=10000,
                ),
            ),
        ).collect()
    }
    lo, mid, hi = [
        r[0]
        for r in duck.execute(
            "SELECT unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75])) FROM lineitem"
        ).fetchall()
    ]
    span = hi - lo
    assert abs(approx[0.5] - mid) <= max(0.02 * span, 1e-6)


def test_distributed_flag_in_spec(spark, tables):
    """DistributionAgg(distributed=True) routes to the scale path and
    matches the default strategy."""
    base = Query(
        source="lineitem",
        aggregation=DistributionAgg(
            type=DistributionType.QUANTILE, field="l_extendedprice", points=[0.25, 0.75]
        ),
    )
    dist = Query(
        source="lineitem",
        aggregation=DistributionAgg(
            type=DistributionType.QUANTILE,
            field="l_extendedprice",
            points=[0.25, 0.75],
            distributed=True,
        ),
    )
    a = {r["quantile"]: r["value"] for r in compile_query(spark, base).collect()}
    b = {r["quantile"]: r["value"] for r in compile_query(spark, dist).collect()}
    assert a.keys() == b.keys()
    for p in a:
        assert abs(a[p] - b[p]) < 1e-9


def test_empty_input(spark, tables):
    empty = tables["lineitem"].filter("l_quantity < 0")
    assert exact_quantiles_distributed(empty, "l_extendedprice", [0.5]).count() == 0


def test_histogram_exact_matches_builtin(spark, tables):
    from bullet_spark_spark.operators.distribution import exact_quantiles_histogram

    hist = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_histogram(
            tables["lineitem"], "l_extendedprice", PROBS
        ).collect()
    }
    builtin = {
        r["quantile"]: r["value"]
        for r in compile_query(
            spark,
            Query(
                source="lineitem",
                aggregation=DistributionAgg(
                    type=DistributionType.QUANTILE, field="l_extendedprice", points=PROBS
                ),
            ),
        ).collect()
    }
    assert set(hist) == set(builtin)
    for p in hist:
        assert abs(hist[p] - builtin[p]) < 1e-9, p


def test_histogram_heavy_bucket_recursion(spark):
    """Mass-point data: one value holds >half the rows, so its bucket
    exceeds max_collect and forces the recursive re-histogram, which must
    terminate via the min==max exit and still return exact quantiles."""
    from bullet_spark_spark.operators.distribution import exact_quantiles_histogram

    rows = [(7.0,)] * 500 + [(float(i),) for i in range(100)]
    df = spark.createDataFrame(rows, "x double")
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles_histogram(
            df, "x", [0.0, 0.5, 1.0], num_buckets=4, max_collect=50
        ).collect()
    }
    import statistics

    data = sorted(v for (v,) in rows)
    assert got[0.0] == data[0]
    assert got[1.0] == data[-1]
    assert abs(got[0.5] - statistics.quantiles(data, n=2, method="inclusive")[0]) < 1e-9


def test_histogram_flag_in_spec(spark, tables):
    """DistributionAgg(histogram=True) routes to the targeted-rank path."""
    out = compile_query(
        spark,
        Query(
            source="events",
            aggregation=DistributionAgg(
                type=DistributionType.QUANTILE,
                field="value",
                points=[0.25, 0.75],
                histogram=True,
            ),
        ),
    )
    base = compile_query(
        spark,
        Query(
            source="events",
            aggregation=DistributionAgg(
                type=DistributionType.QUANTILE, field="value", points=[0.25, 0.75]
            ),
        ),
    )
    a = {r["quantile"]: r["value"] for r in out.collect()}
    b = {r["quantile"]: r["value"] for r in base.collect()}
    for p in a:
        assert abs(a[p] - b[p]) < 1e-9


def test_histogram_property_random_data(spark):
    """Randomized differential for the histogram targeted-rank path:
    arbitrary value multisets (duplicates, negatives, singletons, mass
    points) against DuckDB quantile_cont."""
    import duckdb

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bullet_spark_spark.operators.distribution import exact_quantiles_histogram

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(
        vals=st.lists(
            st.one_of(
                st.integers(-1000, 1000).map(float),
                st.sampled_from([7.0, -3.5, 0.0]),  # encourage mass points
            ),
            min_size=1,
            max_size=120,
        )
    )
    def run(vals):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {
            r["quantile"]: r["value"]
            for r in exact_quantiles_histogram(
                df, "x", [0.0, 0.25, 0.5, 1.0], num_buckets=8, max_collect=16
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t(x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        want = con.execute(
            "SELECT quantile_cont(x, 0.0), quantile_cont(x, 0.25),"
            " quantile_cont(x, 0.5), quantile_cont(x, 1.0) FROM t"
        ).fetchone()
        con.close()
        for p, w in zip([0.0, 0.25, 0.5, 1.0], want):
            assert abs(got[p] - w) < 1e-9, (p, got[p], w, sorted(vals))

    run()
