"""User-defined function surface (SURVEY §2.5: the reference has NO query-
author UDFs — its only plugins are sources/converters, DataProducer.scala:
47-58; this is a capability extension).

Policy, enforced by what we expose: vectorized (Arrow) pandas UDFs only —
row-at-a-time Python UDFs are deliberately absent (serde per row, 10-100×
slower; the guide's 'slow path'). Three shapes:

- scalar_udf: Series→Series column function (elementwise, batched)
- grouped_agg_udf: Series→scalar aggregation (usable with groupBy/window)
- grouped_transform: applyInPandas per-group DataFrame→DataFrame
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


def scalar_udf(return_type: str):
    """Decorator: vectorized Series→Series UDF.

    >>> @scalar_udf("double")
    ... def clipped(v: pd.Series) -> pd.Series:
    ...     return v.clip(0, 100)
    """
    def deco(fn: Callable[..., pd.Series]):
        return pandas_udf(fn, returnType=return_type)

    return deco


def grouped_agg_udf(return_type: str):
    """Decorator: vectorized Series→scalar aggregation UDF (works in
    ``groupBy().agg()`` and over windows; Spark handles partial application
    per batch)."""
    from pyspark.sql.functions import PandasUDFType

    def deco(fn):
        return pandas_udf(fn, returnType=return_type, functionType=PandasUDFType.GROUPED_AGG)

    return deco


def grouped_transform(
    df: DataFrame, key_cols: list[str], fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Per-group pandas transform (applyInPandas): each key group arrives as
    one pandas DataFrame (Arrow batches); output schema declared up front.
    The per-group frame must fit in one worker's memory — key choice is the
    scale lever."""
    return df.groupBy(*key_cols).applyInPandas(fn, schema=schema)
