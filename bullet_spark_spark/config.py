"""Engine configuration — the analogue of BulletSparkConfig (reference
BulletSparkConfig.scala:140-153: YAML merged over defaults, then validated;
validator defs :70-126). Here: a typed dataclass with dict/YAML overlay and
explicit validation errors, consumed by session.get_spark and EngineRuntime.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields, replace
from typing import Any


@dataclass(frozen=True)
class EngineConfig:
    # session (ref spark.* passthrough, BulletSparkStreamingBaseJob.scala:62-83)
    app_name: str = "bullet-spark-spark"
    master: str | None = None
    shuffle_partitions: int = 32
    broadcast_threshold_bytes: int = 64 * 1024 * 1024
    session_timezone: str = "UTC"
    extra_spark_conf: dict[str, str] = field(default_factory=dict)

    # runtime (ref bullet.spark.* keys, bullet_spark_defaults.yaml)
    trigger_ms: int = 200                   # ≈ bullet.spark.batch.duration.ms (:17)
    checkpoint_root: str | None = None      # ≈ bullet.spark.checkpoint.dir
    sweep_interval_s: float = 0.2           # lifecycle check cadence
    max_concurrent_queries: int = 64        # registry guard (no ref analogue —
                                            # the ref has no cap and collects all
                                            # queries to the driver per batch)
    # rate limiting defaults (ref bullet.query.rate.limit.*)
    rate_limit_enable: bool = False
    rate_limit_max_emits: int = 50
    rate_limit_interval_ms: int = 100

    def validate(self) -> list[str]:
        errors = []
        if self.shuffle_partitions <= 0:
            errors.append("shuffle_partitions must be positive")
        if self.trigger_ms <= 0:
            errors.append("trigger_ms must be positive")
        if self.max_concurrent_queries <= 0:
            errors.append("max_concurrent_queries must be positive")
        if self.rate_limit_enable and self.rate_limit_max_emits <= 0:
            errors.append("rate_limit_max_emits must be positive when enabled")
        return errors

    def merged(self, overrides: dict[str, Any]) -> "EngineConfig":
        """Overlay a dict (e.g. parsed YAML) over this config; unknown keys
        are an error (the reference silently ignores unknown keys — we fail
        loudly instead)."""
        known = {f.name for f in fields(self)}
        unknown = set(overrides) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        cfg = replace(self, **overrides)
        errors = cfg.validate()
        if errors:
            raise ValueError(f"invalid config: {errors}")
        return cfg

    @classmethod
    def from_yaml(cls, path: str) -> "EngineConfig":
        import yaml  # provided by pyspark's transitive deps

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return cls().merged(data)
