from bullet_spark_spark.streaming.runtime import (
    EngineRuntime,
    QueryHandle,
    QueryState,
    Signal,
)
from bullet_spark_spark.streaming.sinks import MemorySink

__all__ = ["EngineRuntime", "QueryHandle", "QueryState", "Signal", "MemorySink"]
