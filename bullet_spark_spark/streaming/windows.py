"""Record-granularity reactive windows (SURVEY §2.4 W2) — the one bullet
window kind with no Structured Streaming native: ``Window.Unit.RECORD`` emits
after every N matching records (N=1 reactive), resetting state each emission
(ref FilterStreamingTest.scala:241-275: 2 records → 2 emissions; per-record
close/reset FilterStreaming.scala:135-139).

Implemented with ``applyInPandasWithState``: state = (rows-into-window,
running aggregates). Bullet's record windows are *globally* ordered — a
single logical stream — so the default key is a constant (single state
partition). That is inherently serial (the reference has the same property:
one Querier sees every record); for per-key record windows pass ``key_cols``
and each key gets its own counter, which scales horizontally.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_in_window", LongType()),
        StructField("window_idx", LongType()),
        StructField("agg_count", LongType()),
        StructField("agg_sum", StringType()),  # repr(float) — exact roundtrip
    ]
)


def record_window_count(
    df: DataFrame,
    every_n: int,
    value_col: str | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Emit (key?, window_idx, cnt, sum_value?) once per N records seen.

    Output schema: key_cols + window_idx (0-based emission index), cnt
    (records in the emitted window — always every_n except never partial:
    bullet only closes a record window when full), and sum_value when
    ``value_col`` given.
    """
    keys = key_cols or []
    out_fields = [StructField(k, df.schema[k].dataType) for k in keys]
    out_fields += [
        StructField("window_idx", LongType()),
        StructField("cnt", LongType()),
    ]
    if value_col:
        from pyspark.sql.types import DoubleType

        out_fields.append(StructField("sum_value", DoubleType()))
    out_schema = StructType(out_fields)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_in_window, window_idx, agg_count, agg_sum_s = state.get
            agg_sum = float(agg_sum_s)
        else:
            n_in_window, window_idx, agg_count, agg_sum = 0, 0, 0, 0.0

        out_key = key if keys else ()  # drop the dummy single-group key
        emissions: list[tuple] = []
        for pdf in pdfs:
            vals = pdf[value_col].tolist() if value_col else [0.0] * len(pdf)
            for v in vals:
                n_in_window += 1
                agg_count += 1
                agg_sum += float(v) if v is not None else 0.0
                if n_in_window >= every_n:
                    row = out_key + (window_idx, agg_count)
                    if value_col:
                        row = row + (agg_sum,)
                    emissions.append(row)
                    window_idx += 1
                    n_in_window = 0
                    agg_count = 0
                    agg_sum = 0.0

        state.update((n_in_window, window_idx, agg_count, repr(agg_sum)))
        cols = keys + ["window_idx", "cnt"] + (["sum_value"] if value_col else [])
        yield pd.DataFrame(emissions, columns=cols)

    if keys:
        grouped = df.groupBy(*[F.col(k) for k in keys])
    else:
        # single logical stream (bullet's global record window): constant
        # derived key — a bare lit() in groupBy parses as a SQL ordinal
        grouped = df.withColumn("__g", F.lit(1)).groupBy("__g")
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
