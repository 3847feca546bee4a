"""Plugin hooks around pipeline phases.

Reference: /root/reference/src/plugins.rs:10-191 — ``Plugin`` trait with
``initialize/finalize``, ``before/after_{extract,transform,load}`` and
``on_event``; ``PluginRegistry`` runs all registered plugins in order;
built-ins ``LoggingPlugin`` (plugins.rs:194-311) and ``MetricsPlugin``
(throughput calc, plugins.rs:314-370).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any

from etlray.events import PipelineEvent

logger = logging.getLogger("etlray")


@dataclass
class PluginContext:
    """Reference PluginContext{pipeline_id, config, metadata}."""

    pipeline_id: str
    config: Any = None
    metadata: dict[str, Any] = field(default_factory=dict)


class Plugin:
    """Subclass and override any subset of hooks."""

    name = "plugin"

    def initialize(self, ctx: PluginContext) -> None: ...
    def finalize(self, ctx: PluginContext) -> None: ...
    def before_extract(self, ctx: PluginContext) -> None: ...
    def after_extract(self, ctx: PluginContext, row_count: int | None) -> None: ...
    def before_transform(self, ctx: PluginContext) -> None: ...
    def after_transform(self, ctx: PluginContext) -> None: ...
    def before_load(self, ctx: PluginContext) -> None: ...
    def after_load(self, ctx: PluginContext, result: Any) -> None: ...
    def on_event(self, ctx: PluginContext, event: PipelineEvent) -> None: ...


class PluginRegistry:
    """Runs every registered plugin's hook in registration order."""

    def __init__(self) -> None:
        self._plugins: list[Plugin] = []

    def register(self, plugin: Plugin) -> "PluginRegistry":
        self._plugins.append(plugin)
        return self

    def run(self, hook: str, *args: Any) -> None:
        for p in self._plugins:
            getattr(p, hook)(*args)

    def __len__(self) -> int:
        return len(self._plugins)


class LoggingPlugin(Plugin):
    """Reference plugins.rs:194-311."""

    name = "logging"

    def initialize(self, ctx: PluginContext) -> None:
        logger.info("pipeline %s: initialized", ctx.pipeline_id)

    def before_extract(self, ctx: PluginContext) -> None:
        logger.info("pipeline %s: extracting", ctx.pipeline_id)

    def before_transform(self, ctx: PluginContext) -> None:
        logger.info("pipeline %s: transforming", ctx.pipeline_id)

    def before_load(self, ctx: PluginContext) -> None:
        logger.info("pipeline %s: loading", ctx.pipeline_id)

    def after_load(self, ctx: PluginContext, result: Any) -> None:
        logger.info("pipeline %s: loaded %s", ctx.pipeline_id, result)

    def finalize(self, ctx: PluginContext) -> None:
        logger.info("pipeline %s: finalized", ctx.pipeline_id)


class MetricsPlugin(Plugin):
    """Throughput calculator (reference plugins.rs:314-370)."""

    name = "metrics"

    def __init__(self) -> None:
        self._start: float | None = None
        self.rows_per_second: float | None = None

    def before_extract(self, ctx: PluginContext) -> None:
        self._start = time.perf_counter()

    def after_load(self, ctx: PluginContext, result: Any) -> None:
        if self._start is None:
            return
        elapsed = time.perf_counter() - self._start
        rows = getattr(result, "rows_processed", None)
        if rows is not None and elapsed > 0:
            self.rows_per_second = rows / elapsed
            ctx.metadata["rows_per_second"] = self.rows_per_second
