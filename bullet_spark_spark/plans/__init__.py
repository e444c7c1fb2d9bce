from bullet_spark_spark.plans.spec import (
    Query,
    Explode,
    Projection,
    RawAgg,
    GroupAgg,
    CountDistinctAgg,
    DistributionAgg,
    DistributionType,
    TopKAgg,
    Having,
    OrderBy,
    Computation,
    Culling,
    Window,
    WindowUnit,
    AggOp,
)
from bullet_spark_spark.plans.compiler import compile_query

__all__ = [
    "Query", "Explode", "Projection", "RawAgg", "GroupAgg", "CountDistinctAgg",
    "DistributionAgg", "DistributionType", "TopKAgg", "Having", "OrderBy",
    "Computation", "Culling", "Window", "WindowUnit", "AggOp", "compile_query",
]
