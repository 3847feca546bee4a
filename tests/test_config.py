"""Config / errors / events / plugins unit tests (reference
src/config.rs:328-397, src/events.rs:121-169, src/plugins.rs:372-407).
No Ray needed."""

import pytest

from etlray.config import ConflictResolution, ErrorHandling, ETLConfig, ETLConfigBuilder
from etlray.errors import ConfigError, ExtractError, IoError, LoadError
from etlray.events import InMemoryEventEmitter, PipelineEvent
from etlray.plugins import LoggingPlugin, MetricsPlugin, PluginContext, PluginRegistry


def test_defaults():
    cfg = ETLConfig()
    assert cfg.pipeline.batch_size == 1000        # reference config.rs:74
    assert cfg.pipeline.timeout_seconds == 300
    assert cfg.pipeline.retry_attempts == 3
    assert cfg.performance.memory_limit_mb == 1024


def test_builder():
    cfg = (ETLConfigBuilder().batch_size(500).parallel_workers(4)
           .enable_metrics(False).memory_limit_mb(2048).build())
    assert cfg.pipeline.batch_size == 500
    assert cfg.performance.memory_limit_mb == 2048
    assert not cfg.features.enable_metrics


def test_validation():
    with pytest.raises(ConfigError):
        ETLConfigBuilder().batch_size(0).build()
    with pytest.raises(ConfigError):
        ETLConfigBuilder().parallel_workers(-1).build()
    with pytest.raises(ConfigError):
        ETLConfigBuilder().memory_limit_mb(0).build()


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("ETL_BATCH_SIZE", "2500")
    monkeypatch.setenv("ETL_ENABLE_METRICS", "false")
    cfg = ETLConfig.from_env()
    assert cfg.pipeline.batch_size == 2500
    assert cfg.features.enable_metrics is False


def test_toml_loading(tmp_path):
    f = tmp_path / "etl.toml"
    f.write_text("[pipeline]\nbatch_size = 7\n[performance]\nmemory_limit_mb = 99\n")
    cfg = ETLConfig.from_toml(str(f))
    assert cfg.pipeline.batch_size == 7
    assert cfg.performance.memory_limit_mb == 99


def test_error_taxonomy():
    assert ExtractError("connection refused").is_recoverable()
    assert IoError("disk broke").is_recoverable()
    assert not LoadError("schema mismatch").is_recoverable()
    assert LoadError("timeout waiting for lock").is_recoverable()
    assert ConfigError("timeout in name").is_recoverable() is False
    assert ExtractError("x").error_code() == "ETL_EXTRACT"


def test_enums():
    assert ErrorHandling("skip") is ErrorHandling.SKIP
    assert ConflictResolution("merge") is ConflictResolution.MERGE


def test_event_emitter_threadsafe_accumulator():
    em = InMemoryEventEmitter()
    em.emit(PipelineEvent(kind="started", pipeline_id="p1"))
    em.emit(PipelineEvent(kind="completed", pipeline_id="p1"))
    assert len(em) == 2
    assert [e.kind for e in em.get_events()] == ["started", "completed"]
    em.clear()
    assert len(em) == 0


def test_plugin_registry_order_and_metrics():
    calls = []

    class A(LoggingPlugin):
        def before_extract(self, ctx):
            calls.append("a")

    class B(LoggingPlugin):
        def before_extract(self, ctx):
            calls.append("b")

    reg = PluginRegistry().register(A()).register(B())
    ctx = PluginContext(pipeline_id="x")
    reg.run("before_extract", ctx)
    assert calls == ["a", "b"]

    class R:
        rows_processed = 100

    mp = MetricsPlugin()
    mp.before_extract(ctx)
    mp.after_load(ctx, R())
    assert mp.rows_per_second > 0
    assert ctx.metadata["rows_per_second"] == mp.rows_per_second


def test_from_env_enable_logging(monkeypatch):
    from etlray.config import ETLConfig

    monkeypatch.setenv("ETL_ENABLE_LOGGING", "false")
    assert ETLConfig.from_env().features.enable_logging is False
