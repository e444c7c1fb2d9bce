"""Stateful streaming monitors — per-key EWMA anomaly detection.

The streaming counterpart of operators/temporal.ewma and zscore_anomalies:
an unbounded per-key state (exponential mean + variance) updated every
micro-batch via ``applyInPandasWithState``, flagging records whose
deviation from the running EWMA exceeds a z-threshold — the
drift/outlier monitor a training-data ingest runs ON the stream, before
anything lands (reject a crawler gone wrong in-flight rather than in the
next day's batch profile).

State math (West 1979 exponential moments, the standard recursive form):

    d   = x − m
    m  ←  m + α·d
    v  ←  (1 − α)·(v + α·d²)

Per-key state is three scalars — bounded regardless of stream length, and
exactly the state shape the RocksDB store (session.get_spark
rocksdb_state=True) holds per key at 100× cardinality. Rows within a
micro-batch process in (ts, tiebreak) order per key; cross-batch order is
arrival order, as for any streaming fold.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("m", StringType()),  # repr(float) — exact roundtrip
        StructField("v", StringType()),
    ]
)


def ewma_anomalies(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.1,
    z_threshold: float = 4.0,
    warmup: int = 10,
) -> DataFrame:
    """Streaming per-key EWMA anomaly flags → (keys…, ts, value, ewma,
    z, is_anomaly). ``ewma``/``z`` are the PRE-update values (the record
    is judged against history, not against itself); records inside the
    first ``warmup`` observations of a key never flag (the moments are
    still settling). State: three scalars per key."""
    keys = list(key_cols)
    out_fields = [StructField(k, df.schema[k].dataType) for k in keys]
    out_fields += [
        StructField("ts", df.schema[ts_col].dataType),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
    out_schema = StructType(out_fields)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            n, m_s, v_s = state.get
            m, v = float(m_s), float(v_s)
        else:
            n, m, v = 0, 0.0, 0.0

        rows: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
            for ts, x in zip(pdf[ts_col], pdf[value_col]):
                xv = float(x) if x is not None else None
                if xv is None:
                    continue
                if n == 0:
                    ewma_before, z = xv, 0.0
                else:
                    ewma_before = m
                    sd = math.sqrt(v) if v > 0 else 0.0
                    z = (xv - m) / sd if sd > 0 else 0.0
                flag = bool(n >= warmup and abs(z) > z_threshold)
                rows.append(key + (ts, xv, ewma_before, z, flag))
                d = xv - m if n > 0 else 0.0
                if n == 0:
                    m = xv
                else:
                    m = m + alpha * d
                    v = (1.0 - alpha) * (v + alpha * d * d)
                n += 1

        state.update((n, repr(m), repr(v)))
        yield pd.DataFrame(
            rows, columns=keys + ["ts", "value", "ewma", "z", "is_anomaly"]
        )

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
