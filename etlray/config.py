"""Configuration — dataclass port of the reference's config surface.

Reference: /root/reference/src/config.rs:7-220 —
``ETLConfig{pipeline, features, observability, performance}`` with
builder, env-var overrides (``ETL_BATCH_SIZE`` etc., config.rs:124-174)
and validation (non-zero batch/workers/memory, config.rs:195-220).

Ray-scale note: the reference default batch_size=1000 rows is far too
small for distributed batches; pipelines treat ``batch_size=None`` as
"let Ray Data pick the block-native batch" and only honour an explicit
value. The reference default is still exposed for API parity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, asdict
from enum import Enum
from typing import Any

from etlray.errors import ConfigError


class ErrorHandling(str, Enum):
    """Per-stage error policy (reference src/config.rs:311-317)."""

    SKIP = "skip"
    FAIL = "fail"
    RETRY = "retry"
    LOG = "log"


class ConflictResolution(str, Enum):
    """Upsert conflict policy (reference src/config.rs:319-326)."""

    IGNORE = "ignore"
    OVERWRITE = "overwrite"
    MERGE = "merge"
    FAIL = "fail"


@dataclass
class RetryConfig:
    """Reference src/traits.rs:192-200 defaults."""

    max_attempts: int = 3
    delay_ms: int = 1000
    backoff_factor: float = 2.0


@dataclass
class PipelineConfig:
    batch_size: int | None = 1000  # reference default (config.rs:74); None = Ray-native
    parallel_workers: int = field(default_factory=lambda: os.cpu_count() or 1)
    timeout_seconds: int = 300
    retry_attempts: int = 3
    retry_delay_ms: int = 1000
    error_handling: ErrorHandling = ErrorHandling.FAIL


@dataclass
class FeaturesConfig:
    enable_metrics: bool = True
    enable_logging: bool = True
    enable_validation: bool = False


@dataclass
class ObservabilityConfig:
    log_level: str = "INFO"
    metrics_interval_seconds: int = 60


@dataclass
class PerformanceConfig:
    memory_limit_mb: int = 1024
    io_buffer_kb: int = 64
    target_max_block_size_mb: int | None = None  # None = Ray default (128 MiB)


@dataclass
class ETLConfig:
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    features: FeaturesConfig = field(default_factory=FeaturesConfig)
    observability: ObservabilityConfig = field(default_factory=ObservabilityConfig)
    performance: PerformanceConfig = field(default_factory=PerformanceConfig)

    # ----- loading ---------------------------------------------------
    @classmethod
    def from_env(cls) -> "ETLConfig":
        """Env overrides, same variable names as reference config.rs:124-174."""
        cfg = cls()
        env = os.environ
        if "ETL_BATCH_SIZE" in env:
            cfg.pipeline.batch_size = int(env["ETL_BATCH_SIZE"])
            cfg.pipeline._batch_size_explicit = True
        if "ETL_PARALLEL_WORKERS" in env:
            cfg.pipeline.parallel_workers = int(env["ETL_PARALLEL_WORKERS"])
        if "ETL_TIMEOUT_SECONDS" in env:
            cfg.pipeline.timeout_seconds = int(env["ETL_TIMEOUT_SECONDS"])
        if "ETL_RETRY_ATTEMPTS" in env:
            cfg.pipeline.retry_attempts = int(env["ETL_RETRY_ATTEMPTS"])
        if "ETL_ENABLE_METRICS" in env:
            cfg.features.enable_metrics = env["ETL_ENABLE_METRICS"].lower() in ("true", "1", "yes")
        if "ETL_ENABLE_LOGGING" in env:
            # reference parses it at config.rs:155-159; omitting it
            # silently ignored the documented variable
            cfg.features.enable_logging = env["ETL_ENABLE_LOGGING"].lower() in ("true", "1", "yes")
        if "ETL_LOG_LEVEL" in env:
            cfg.observability.log_level = env["ETL_LOG_LEVEL"]
        if "ETL_MEMORY_LIMIT_MB" in env:
            cfg.performance.memory_limit_mb = int(env["ETL_MEMORY_LIMIT_MB"])
        cfg.validate()
        return cfg

    @classmethod
    def from_toml(cls, path: str) -> "ETLConfig":
        """TOML file loading (reference supports config files, config.rs)."""
        import tomllib

        with open(path, "rb") as f:
            raw = tomllib.load(f)
        cfg = cls()
        for section_name, section_cls in (
            ("pipeline", PipelineConfig),
            ("features", FeaturesConfig),
            ("observability", ObservabilityConfig),
            ("performance", PerformanceConfig),
        ):
            if section_name in raw:
                known = {k: v for k, v in raw[section_name].items()
                         if k in section_cls.__dataclass_fields__}
                setattr(cfg, section_name, section_cls(**known))
        cfg.validate()
        return cfg

    # ----- validation (reference config.rs:195-220) -------------------
    def validate(self) -> None:
        p = self.pipeline
        if p.batch_size is not None and p.batch_size <= 0:
            raise ConfigError("batch_size must be > 0")
        if p.parallel_workers <= 0:
            raise ConfigError("parallel_workers must be > 0")
        if p.timeout_seconds <= 0:
            raise ConfigError("timeout_seconds must be > 0")
        if self.performance.memory_limit_mb <= 0:
            raise ConfigError("memory_limit_mb must be > 0")

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


class ETLConfigBuilder:
    """Fluent builder (reference config.rs builder surface)."""

    def __init__(self) -> None:
        self._cfg = ETLConfig()

    def batch_size(self, n: int | None) -> "ETLConfigBuilder":
        self._cfg.pipeline.batch_size = n
        return self

    def parallel_workers(self, n: int) -> "ETLConfigBuilder":
        self._cfg.pipeline.parallel_workers = n
        return self

    def timeout_seconds(self, n: int) -> "ETLConfigBuilder":
        self._cfg.pipeline.timeout_seconds = n
        return self

    def enable_metrics(self, b: bool) -> "ETLConfigBuilder":
        self._cfg.features.enable_metrics = b
        return self

    def enable_logging(self, b: bool) -> "ETLConfigBuilder":
        self._cfg.features.enable_logging = b
        return self

    def memory_limit_mb(self, n: int) -> "ETLConfigBuilder":
        self._cfg.performance.memory_limit_mb = n
        return self

    def build(self) -> ETLConfig:
        self._cfg.validate()
        return self._cfg
