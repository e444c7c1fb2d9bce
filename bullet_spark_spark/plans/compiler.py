"""Query spec → DataFrame plan compiler.

The architectural inversion vs the reference (SURVEY §3.2): where bullet-spark
ships a serialized ``Query`` POJO to every executor and interprets it per
record inside ``Querier`` (FilterStreaming.scala:105-124), we compile the spec
to a Catalyst logical plan once. Filters become pushdown-eligible predicates,
projections become column pruning at the parquet scan, and partial/final
aggregation (the reference's byte-blob ``getData``/``combine`` dance,
JoinStreaming.scala:126) is Spark's native HashAggregate partial→final split.

Pipeline order matches bullet-core's Querier: filter → projection →
aggregation → post-aggregations.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bullet_spark_spark.sources.streaming import ensure_event_time

from bullet_spark_spark.functions.exprs import Expr
from bullet_spark_spark.plans.spec import (
    AggOp,
    Computation,
    CountDistinctAgg,
    Culling,
    DistributionAgg,
    DistributionType,
    Explode,
    GroupAgg,
    Having,
    OrderBy,
    Projection,
    Query,
    RawAgg,
    TopKAgg,
    Window,
    WindowUnit,
)

_AGG_FN = {
    AggOp.COUNT: lambda f: F.count(F.lit(1)),
    AggOp.COUNT_FIELD: lambda f: F.count(F.col(f)),
    AggOp.SUM: lambda f: F.sum(F.col(f)),
    AggOp.MIN: lambda f: F.min(F.col(f)),
    AggOp.MAX: lambda f: F.max(F.col(f)),
    AggOp.AVG: lambda f: F.avg(F.col(f)),
    AggOp.SUM_EXACT: lambda f: F.sum(F.col(f).cast("decimal(18,4)")).cast("double"),
    AggOp.AVG_EXACT: lambda f: F.round(
        F.sum(F.col(f).cast("decimal(18,4)")).cast("double") / F.count(F.col(f)), 6
    ),
}


def compile_query(
    spark: SparkSession, query: Query, df: DataFrame | None = None,
    streaming: bool = False,
) -> DataFrame:
    """Compile a Query spec against its source (a registered view, or an
    explicitly provided DataFrame — e.g. a streaming source).

    ``streaming=True`` adapts the plan to an unbounded source: RAW's limit is
    enforced by the runtime sink instead of a Limit node, ORDER BY post-aggs
    are deferred to the sink (global sort is undefined on unbounded input),
    and TIME windows with an event-time field get a watermark."""
    errors = query.validate()
    if errors:
        raise ValueError(f"invalid query: {errors}")

    if df is None:
        df = spark.table(query.source)

    if query.explode is not None:
        ex = query.explode
        gen = F.explode_outer if ex.outer else F.explode
        col = gen(ex.expr.col())
        if ex.key_alias:  # map explode emits (key, value)
            df = df.select("*", col.alias(ex.key_alias, ex.alias))
        else:
            df = df.select("*", col.alias(ex.alias))

    if query.filter is not None:
        df = df.filter(query.filter.col())

    df = _apply_projection(df, query.projection)
    if streaming:
        w = query.window
        if w.event_time_field and w.watermark_delay_ms:
            delay = f"{max(w.watermark_delay_ms // 1000, 1)} seconds"
            df = ensure_event_time(df, w.event_time_field)
            df = df.withWatermark(w.event_time_field, delay)
    df = _apply_window_grouping(df, query)
    df = _apply_aggregation(df, query, streaming=streaming)

    for post in query.post_aggregations:
        if streaming and isinstance(post, OrderBy):
            continue  # sink-side concern on unbounded input
        df = _apply_post(df, post)
    return df


def _apply_projection(df: DataFrame, proj: Projection) -> DataFrame:
    if proj.fields is None:
        return df
    computed = [(name, e.col()) for name, e in proj.fields]
    if proj.copy:
        for name, c in computed:
            df = df.withColumn(name, c)
        return df
    return df.select(*[c.alias(name) for name, c in computed])


def _apply_window_grouping(df: DataFrame, query: Query) -> DataFrame:
    """Event-time tumbling windows (our W3 upgrade: event-time instead of the
    reference's processing-time batch clock, JoinStreaming.scala:118-122).

    Groups on the ``window()`` struct itself — NOT a derived scalar — so the
    event-time tag survives and a declared watermark can evict closed-window
    state; GroupAgg projects ``window_start`` after aggregation."""
    w = query.window
    if (
        w.emit_unit is WindowUnit.TIME
        and w.event_time_field
        and isinstance(query.aggregation, GroupAgg)
    ):
        def _dur(ms: int) -> str:
            return f"{ms // 1000} seconds" if ms % 1000 == 0 else f"{ms} milliseconds"

        dur = _dur(w.emit_every)
        if w.slide_every is not None and w.slide_every != w.emit_every:
            # hopping window (capability upgrade — the reference has no
            # overlap concept): each event lands in
            # ceil(emit_every/slide_every) windows; Spark's window()
            # replicates rows inside the aggregate's Expand, so the
            # amplification never materializes a wider scan
            return df.withColumn(
                "__window",
                F.window(F.col(w.event_time_field), dur, _dur(w.slide_every)),
            )
        return df.withColumn("__window", F.window(F.col(w.event_time_field), dur))
    return df


def _apply_aggregation(df: DataFrame, query: Query, streaming: bool = False) -> DataFrame:
    agg = query.aggregation
    if isinstance(agg, RawAgg):
        # streaming: Limit is not a streaming plan node — the runtime sink
        # counts rows and completes the query (ref querier.isDone,
        # JoinStreaming.scala:142-146)
        return df if streaming else df.limit(agg.limit)

    if isinstance(agg, GroupAgg):
        keys = list(agg.fields)
        windowed = "__window" in df.columns
        if windowed:
            keys = ["__window", *keys]
        exprs = [_AGG_FN[op](fld).alias(out) for op, fld, out in agg.operations]
        if not exprs:
            exprs = [F.count(F.lit(1)).alias("count")]
        if keys:
            out = df.groupBy(*[F.col(k) for k in keys]).agg(*exprs)
        else:
            out = df.agg(*exprs)
        if windowed:
            rest = [c for c in out.columns if c != "__window"]
            out = out.select(F.col("__window")["start"].alias("window_start"), *rest)
        if agg.max_groups is not None and agg.fields and not streaming:
            # bullet uniform-samples groups beyond the cap [D]; the
            # deterministic analogue: rank groups by the engine-portable
            # sampling hash (md5, operators.sampling) and keep the
            # max_groups smallest — a uniform random subset under the hash,
            # reproducible by any engine, so the cap stays oracle-checkable.
            # Physical plan: TakeOrderedAndProject (per-partition top-k, no
            # global sort). The `sampled` meta column reports whether the
            # cap actually bit — bullet surfaces the same fact in result
            # Meta [D]; its group count comes from a result-sized count
            # branch over the aggregation output (broadcast 1-row join),
            # never a rescan of the base data. Streaming: unsupported plan
            # node; cap belongs in the sink if needed.
            from bullet_spark_spark.operators.sampling import sample_hash

            key = F.concat_ws(
                "\x1f", *[F.col(k).cast("string") for k in agg.fields]
            )
            capped = out.orderBy(
                sample_hash(key).asc(), *[F.col(k) for k in agg.fields]
            ).limit(agg.max_groups)
            total = out.agg(F.count(F.lit(1)).alias("__total"))
            out = (
                capped.crossJoin(F.broadcast(total))
                .withColumn("sampled", F.col("__total") > F.lit(agg.max_groups))
                .drop("__total")
            )
        return out

    if isinstance(agg, CountDistinctAgg):
        cols = [F.col(f) for f in agg.fields]
        # streaming: exact distinct aggregation is not a streaming plan node;
        # the sketch estimator is the streaming mode — bullet's own posture
        # (Theta sketch beyond the exact threshold [D], SURVEY §2.2 Q6).
        if agg.approx or streaming:
            # estimator metadata alongside the estimate — bullet emits sketch
            # std-error in result Meta [D] (SURVEY §2.2 Q6)
            return df.agg(
                F.approx_count_distinct(
                    F.struct(*cols) if len(cols) > 1 else cols[0], agg.rsd
                ).alias(agg.name)
            ).select(
                "*",
                F.lit("hll++").alias("estimator"),
                F.lit(agg.rsd).alias("rel_std_dev"),
            )
        return df.agg(F.count_distinct(*cols).alias(agg.name))

    if isinstance(agg, DistributionAgg):
        if streaming and not agg.approx:
            # exact percentile is not streaming-supported; use the mergeable
            # sketch (bullet's DISTRIBUTION is a quantile sketch [D])
            agg = DistributionAgg(
                type=agg.type, field=agg.field, points=agg.points,
                start=agg.start, end=agg.end, num_buckets=agg.num_buckets,
                approx=True, accuracy=agg.accuracy,
            )
        return _compile_distribution(df, agg)

    if isinstance(agg, TopKAgg):
        counted = df.groupBy(*[F.col(f) for f in agg.fields]).agg(
            F.count(F.lit(1)).alias(agg.name)
        )
        if agg.threshold:
            counted = counted.filter(F.col(agg.name) >= agg.threshold)
        # deterministic tie-break on the key fields keeps results stable
        # (and oracle-comparable) — bullet's sketch order is arbitrary
        order = [F.col(agg.name).desc(), *[F.col(f).asc() for f in agg.fields]]
        return counted.orderBy(*order).limit(agg.k)

    raise TypeError(f"unknown aggregation {type(agg).__name__}")


def _bucket_points(agg: DistributionAgg) -> list[float]:
    if agg.points:
        return list(agg.points)
    step = (agg.end - agg.start) / agg.num_buckets
    return [agg.start + i * step for i in range(agg.num_buckets + 1)]


def _compile_distribution(df: DataFrame, agg: DistributionAgg) -> DataFrame:
    col = F.col(agg.field)

    if agg.type is DistributionType.QUANTILE:
        probs = _bucket_points(agg) if not agg.points else list(agg.points)
        if not agg.approx and agg.histogram:
            from bullet_spark_spark.operators.distribution import (
                exact_quantiles_histogram,
            )

            return exact_quantiles_histogram(df, agg.field, probs)
        if not agg.approx and agg.distributed:
            from bullet_spark_spark.operators.distribution import (
                exact_quantiles_distributed,
            )

            return exact_quantiles_distributed(df, agg.field, probs)
        if agg.approx:
            # KLL-like mergeable sketch; accuracy → rank-error bound ~1/accuracy
            q = df.agg(
                F.percentile_approx(col, F.array(*[F.lit(p) for p in probs]), agg.accuracy).alias("v")
            )
        else:
            # exact percentile: linear interpolation — same estimator as
            # DuckDB quantile_cont, so oracle-hashable
            q = df.agg(F.percentile(col, F.array(*[F.lit(p) for p in probs])).alias("v"))
        return q.select(
            F.posexplode(F.arrays_zip(F.array(*[F.lit(p) for p in probs]).alias("q"), F.col("v").alias("value")))
        ).select(
            F.col("col.q").alias("quantile"), F.col("col.value").alias("value")
        )

    # PMF / CDF: bucket index = #points <= value, i.e. ranges
    # (-inf,p0) [p0,p1) ... [pn,inf) — bullet-core Distribution semantics
    points = _bucket_points(agg)
    bucket = reduce(
        lambda acc, p: acc + F.when(col >= F.lit(p), 1).otherwise(0),
        points,
        F.lit(0),
    )
    pmf = (
        df.filter(col.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if agg.type is DistributionType.PMF:
        return pmf.orderBy("bucket")

    from pyspark.sql.window import Window as W

    # unpartitioned by design: `pmf` has one row per bucket (points/width
    # spec-bounded), not per record — the WindowExec warning is cosmetic
    cum = pmf.withColumn(
        "cum_count", F.sum("count").over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0))
    ).drop("count")
    return cum.orderBy("bucket")


def _apply_post(df: DataFrame, post) -> DataFrame:
    if isinstance(post, Having):
        return df.filter(post.expr.col())
    if isinstance(post, OrderBy):
        cols: list[Column] = []
        for key, asc in post.keys:
            c = F.col(key) if isinstance(key, str) else key.col()
            cols.append(c.asc() if asc else c.desc())
        return df.orderBy(*cols)
    if isinstance(post, Computation):
        for name, e in post.fields:
            df = df.withColumn(name, e.col())
        return df
    if isinstance(post, Culling):
        return df.drop(*post.fields)
    raise TypeError(f"unknown post-aggregation {type(post).__name__}")
