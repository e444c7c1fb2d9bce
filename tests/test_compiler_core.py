"""M1 core relational operators, differential-tested against DuckDB.

Mirrors the reference's stage-isolation strategy (SURVEY §5.1:
FilterStreamingTest/JoinStreamingTest patterns) but with the DuckDB oracle
instead of replayed Querier state."""

from __future__ import annotations

import pytest

from bullet_spark_spark.functions.exprs import E
from bullet_spark_spark.plans import (
    AggOp,
    Computation,
    CountDistinctAgg,
    Culling,
    DistributionAgg,
    DistributionType,
    GroupAgg,
    Having,
    OrderBy,
    Projection,
    Query,
    RawAgg,
    TopKAgg,
    compile_query,
)
from tests.util import assert_match


def test_filter_projection(spark, tables, duck):
    q = Query(
        source="events",
        filter=(E.f("value") > 90) & (E.f("event_type") == "purchase"),
        projection=Projection(
            fields=[
                ("event_id", E.f("event_id")),
                ("value_x2", E.f("value") * 2),
                ("who", E.f("user_id")),
            ]
        ),
        aggregation=RawAgg(limit=10_000_000),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT event_id, value * 2 AS value_x2, user_id AS who
           FROM events WHERE value > 90 AND event_type = 'purchase'""",
    )


def test_group_agg(spark, tables, duck):
    q = Query(
        source="events",
        filter=E.f("value") > 50,
        aggregation=GroupAgg(
            fields=["event_type"],
            operations=[
                (AggOp.COUNT, None, "cnt"),
                (AggOp.SUM, "value", "sum_value"),
                (AggOp.MIN, "value", "min_value"),
                (AggOp.MAX, "value", "max_value"),
                (AggOp.AVG, "value", "avg_value"),
            ],
        ),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT event_type, count(*) AS cnt, sum(value) AS sum_value,
                  min(value) AS min_value, max(value) AS max_value,
                  avg(value) AS avg_value
           FROM events WHERE value > 50 GROUP BY event_type""",
    )


def test_group_all(spark, tables, duck):
    q = Query(
        source="lineitem",
        aggregation=GroupAgg(
            fields=[],
            operations=[
                (AggOp.COUNT, None, "n"),
                (AggOp.SUM, "l_quantity", "sum_qty"),
                (AggOp.AVG, "l_discount", "avg_disc"),
            ],
        ),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
                  avg(l_discount) AS avg_disc FROM lineitem""",
    )


def test_count_distinct_exact(spark, tables, duck):
    q = Query(
        source="events",
        aggregation=CountDistinctAgg(fields=["user_id"], name="cd"),
    )
    df = compile_query(spark, q)
    assert_match(df, duck, "SELECT count(DISTINCT user_id) AS cd FROM events")


def test_count_distinct_approx_tolerance(spark, tables, duck):
    q = Query(
        source="events",
        aggregation=CountDistinctAgg(fields=["user_id"], name="cd", approx=True, rsd=0.02),
    )
    est = compile_query(spark, q).collect()[0]["cd"]
    exact = duck.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert abs(est - exact) / exact < 0.1


def test_topk(spark, tables, duck):
    q = Query(
        source="events",
        aggregation=TopKAgg(fields=["event_type"], k=3, name="cnt"),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT event_type, count(*) AS cnt FROM events
           GROUP BY event_type ORDER BY cnt DESC, event_type ASC LIMIT 3""",
    )


def test_distribution_quantile_exact(spark, tables, duck):
    q = Query(
        source="lineitem",
        aggregation=DistributionAgg(
            type=DistributionType.QUANTILE,
            field="l_extendedprice",
            points=[0.0, 0.25, 0.5, 0.75, 1.0],
        ),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT unnest([0.0, 0.25, 0.5, 0.75, 1.0]) AS quantile,
                  unnest(quantile_cont(l_extendedprice, [0.0, 0.25, 0.5, 0.75, 1.0])) AS value
           FROM lineitem""",
    )


def test_distribution_pmf(spark, tables, duck):
    q = Query(
        source="events",
        aggregation=DistributionAgg(
            type=DistributionType.PMF, field="value", start=0.0, end=100.0, num_buckets=4
        ),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT (CASE WHEN value >= 0 THEN 1 ELSE 0 END
                 + CASE WHEN value >= 25 THEN 1 ELSE 0 END
                 + CASE WHEN value >= 50 THEN 1 ELSE 0 END
                 + CASE WHEN value >= 75 THEN 1 ELSE 0 END
                 + CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS bucket,
                  count(*) AS count
           FROM events WHERE value IS NOT NULL GROUP BY bucket""",
    )


def test_distribution_cdf(spark, tables, duck):
    q = Query(
        source="events",
        aggregation=DistributionAgg(
            type=DistributionType.CDF, field="value", start=0.0, end=100.0, num_buckets=4
        ),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """WITH pmf AS (
             SELECT (CASE WHEN value >= 0 THEN 1 ELSE 0 END
                   + CASE WHEN value >= 25 THEN 1 ELSE 0 END
                   + CASE WHEN value >= 50 THEN 1 ELSE 0 END
                   + CASE WHEN value >= 75 THEN 1 ELSE 0 END
                   + CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS bucket,
                    count(*) AS count
             FROM events WHERE value IS NOT NULL GROUP BY bucket)
           SELECT bucket, sum(count) OVER (ORDER BY bucket) AS cum_count FROM pmf""",
    )


def test_post_aggregations(spark, tables, duck):
    q = Query(
        source="events",
        aggregation=GroupAgg(
            fields=["event_type"],
            operations=[(AggOp.COUNT, None, "cnt"), (AggOp.SUM, "value", "sv")],
        ),
        post_aggregations=[
            Having(E.f("cnt") > 50),
            Computation([("cnt_per_mille", E.f("cnt") * 1000)]),
            Culling(["sv"]),
            OrderBy([("cnt", False), ("event_type", True)]),
        ],
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT event_type, cnt, cnt * 1000 AS cnt_per_mille FROM (
             SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
           ) WHERE cnt > 50""",
    )


def test_max_groups_cap(spark, tables, duck):
    """Beyond-cap groups are a deterministic uniform hash-sample (bullet
    uniform-samples past max_groups [D]): md5-ranked group selection any
    engine reproduces, plus a `sampled` meta flag saying the cap bit."""
    q = Query(
        source="events",
        aggregation=GroupAgg(
            fields=["user_id"],
            operations=[(AggOp.COUNT, None, "cnt")],
            max_groups=10,
        ),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT user_id, cnt,
                  (SELECT count(DISTINCT user_id) FROM events) > 10 AS sampled
           FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
           ORDER BY md5(CAST(user_id AS VARCHAR) || ':0'), user_id LIMIT 10""",
    )


def test_max_groups_not_sampled_below_cap(spark, tables, duck):
    """A cap wider than the group count keeps every group and reports
    sampled = false."""
    q = Query(
        source="events",
        aggregation=GroupAgg(
            fields=["event_type"],
            operations=[(AggOp.COUNT, None, "cnt")],
            max_groups=1000,
        ),
    )
    df = compile_query(spark, q)
    assert_match(
        df,
        duck,
        """SELECT event_type, count(*) AS cnt, FALSE AS sampled
           FROM events GROUP BY event_type""",
    )


def test_validation_errors():
    q = Query(source="events", aggregation=RawAgg(limit=0))
    with pytest.raises(ValueError):
        compile_query(None, q)  # type: ignore[arg-type]
