"""EngineConfig: overlay-over-defaults + validation (BulletSparkConfig
parity, reference BulletSparkConfig.scala:140-153) and runtime wiring."""

from __future__ import annotations

import pytest

from bullet_spark_spark.config import EngineConfig
from bullet_spark_spark.plans import AggOp, GroupAgg, Query
from bullet_spark_spark.sources.streaming import file_drip
from bullet_spark_spark.streaming import EngineRuntime


def test_defaults_valid():
    assert EngineConfig().validate() == []


def test_overlay_and_validation():
    cfg = EngineConfig().merged({"trigger_ms": 500, "max_concurrent_queries": 2})
    assert cfg.trigger_ms == 500
    with pytest.raises(ValueError, match="unknown config keys"):
        EngineConfig().merged({"no_such_key": 1})
    with pytest.raises(ValueError, match="invalid config"):
        EngineConfig().merged({"trigger_ms": 0})


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "engine.yaml"
    p.write_text("trigger_ms: 333\nrate_limit_enable: true\nrate_limit_max_emits: 7\n")
    cfg = EngineConfig.from_yaml(str(p))
    assert cfg.trigger_ms == 333 and cfg.rate_limit_enable and cfg.rate_limit_max_emits == 7


def test_max_concurrent_queries_guard(spark, tables, tmp_path):
    rt = EngineRuntime(spark, config=EngineConfig().merged({"max_concurrent_queries": 1}))
    try:
        stream = file_drip(spark, tables["events"], str(tmp_path), chunks=2)
        spec = Query(
            source="events",
            aggregation=GroupAgg(fields=["event_type"], operations=[(AggOp.COUNT, None, "cnt")]),
        )
        rt.register(spec, stream)
        with pytest.raises(RuntimeError, match="max_concurrent_queries"):
            rt.register(spec, stream)
    finally:
        rt.stop_all()
