"""Query multiplexer: evaluate N queries' predicates in ONE pass over the
record stream.

This is the Spark-first reformulation of the reference's central mechanism —
FilterStreaming runs every live query's ``Querier(Mode.PARTITION)`` over each
partition's records per batch (FilterStreaming.scala:54-67, QueryManager
categorize :105-110), with the query list re-broadcast from the driver every
batch (:48-53). Here the compiled predicate list is baked into the plan as a
single projected array of (query_id, matched) structs; one ``explode`` emits
(query_id, record) pairs for matching queries only. Catalyst broadcasts the
literals inside the codegen'd expression — no driver round-trip per batch.

When to use which (SURVEY §7.3): plan-per-query (the default architecture)
isolates lifecycle and lets Catalyst specialize each plan; the multiplexer
wins when query cardinality is high enough that N source scans (or N
streaming subscriptions) dominate — it pays one scan + one explode for all
queries. Re-register to change the query set (streaming: restart the one
multiplexer query; its state is keyed by query_id so a checkpoint resume
keeps unrelated queries' state intact).

Scale: output volume is Σ per-query selectivity × input rows; the explode is
map-side (no shuffle), and the per-query aggregation that follows shuffles by
(query_id, group-keys) — exactly the partitioning the reference used its
byte-blob merge for (JoinStreaming.scala:40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bullet_spark_spark.functions.exprs import Expr
from bullet_spark_spark.plans.spec import AggOp, GroupAgg
from bullet_spark_spark.plans.compiler import _AGG_FN


def multiplex_filter(df: DataFrame, predicates: dict[str, Expr]) -> DataFrame:
    """One scan, N predicates → (query_id, record) rows for every query whose
    filter matches. Output schema: ``query_id`` + all input columns."""
    tagged = F.array(
        *[
            F.struct(
                F.lit(qid).alias("qid"),
                (p.col() if p is not None else F.lit(True)).alias("m"),
            )
            for qid, p in predicates.items()
        ]
    )
    matches = F.filter(tagged, lambda s: F.coalesce(s["m"], F.lit(False)))
    return (
        df.withColumn("__q", F.explode(F.transform(matches, lambda s: s["qid"])))
        .select(F.col("__q").alias("query_id"), "*")
        .drop("__q")
    )


def multiplex_group_count(
    df: DataFrame, queries: dict[str, tuple[Expr | None, GroupAgg]]
) -> DataFrame:
    """One pass for N (filter, GROUP BY count) queries sharing a source:
    multiplexed filter, then a single aggregation keyed by
    (query_id, group-key tuple). All queries' groups shuffle together —
    one exchange total instead of N.

    Output: (query_id, keys: map<string,string>, cnt). Keys are stringified
    into a map because different queries group by different columns."""
    preds = {qid: p for qid, (p, _) in queries.items()}
    routed = multiplex_filter(df, preds)
    # per-query group-key tuple, stringified: CASE over query_id
    key_expr = None
    for qid, (_, agg) in queries.items():
        arr_k = F.array(*[F.lit(k) for k in agg.fields])
        arr_v = F.array(*[F.col(k).cast("string") for k in agg.fields])
        branch = F.map_from_arrays(arr_k, arr_v)
        key_expr = (
            F.when(F.col("query_id") == qid, branch)
            if key_expr is None
            else key_expr.when(F.col("query_id") == qid, branch)
        )
    return (
        routed.withColumn("keys", key_expr)
        .groupBy("query_id", F.map_entries("keys").alias("key_entries"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "query_id", F.map_from_entries("key_entries").alias("keys"), "cnt"
        )
    )


def multiplex_group_agg(
    df: DataFrame, queries: dict[str, tuple[Expr | None, GroupAgg]]
) -> DataFrame:
    """Generalization of multiplex_group_count to the full mergeable op set:
    one pass, one shuffle for N (filter, GROUP BY {count,sum,min,max,avg})
    queries. The aggregation computes the UNION of all queries' (op, field)
    pairs — each is a native partial-aggregating expression, so the shared
    exchange carries one combined partial state row per (query, group).

    Output: (query_id, keys map<string,string>, aggs map<string,double>) —
    ``aggs`` holds every computed (op_field) pair; the caller projects the
    subset its query asked for (the runtime's multiplexed sink does this)."""
    preds = {qid: p for qid, (p, _) in queries.items()}
    routed = multiplex_filter(df, preds)

    key_expr = None
    for qid, (_, agg) in queries.items():
        arr_k = F.array(*[F.lit(k) for k in agg.fields])
        arr_v = F.array(*[F.col(k).cast("string") for k in agg.fields])
        branch = F.map_from_arrays(arr_k, arr_v)
        key_expr = (
            F.when(F.col("query_id") == qid, branch)
            if key_expr is None
            else key_expr.when(F.col("query_id") == qid, branch)
        )

    # union of requested (op, field) pairs across queries
    pairs: dict[str, tuple[AggOp, str | None]] = {"count_": (AggOp.COUNT, None)}
    for _, agg in queries.values():
        for op, fld, _out in agg.operations:
            pairs[f"{op.value.lower()}_{fld or ''}"] = (op, fld)

    agged = (
        routed.withColumn("keys", key_expr)
        .groupBy("query_id", F.map_entries("keys").alias("key_entries"))
        .agg(*[_AGG_FN[op](fld).cast("double").alias(name) for name, (op, fld) in pairs.items()])
    )
    return agged.select(
        "query_id",
        F.map_from_entries("key_entries").alias("keys"),
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in pairs]),
            F.array(*[F.col(n) for n in pairs]),
        ).alias("aggs"),
    )
