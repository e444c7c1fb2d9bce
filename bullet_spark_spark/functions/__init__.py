from bullet_spark_spark.functions.exprs import (
    E,
    Expr,
    Field,
    Value,
    compile_expr,
)

__all__ = ["E", "Expr", "Field", "Value", "compile_expr"]
