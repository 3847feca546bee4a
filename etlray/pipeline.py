"""Pipeline — fluent builder producing a lazy Ray Data plan.

Reference lifecycle: /root/reference/src/pipeline/mod.rs:89-212
(``execute``: health-check → extract → transform → load → finalize,
with state machine + events + metrics) and :319-468 (typestate
builder). Here the intermediate representation at every boundary is a
lazy ``ray.data.Dataset`` instead of a materialized ``Vec<DataRow>``;
the streaming executor pipelines stages with backpressure, so
``execute_streaming`` (mod.rs:273-276) is the *default* behavior
rather than a degenerate re-read loop.

Stage contracts:

* source: anything with ``read() -> Dataset``, or a ``Dataset``, or a
  zero-arg callable returning one;
* transform: anything with ``apply(ds) -> Dataset``, or a callable
  ``Dataset -> Dataset``;
* sink: anything with ``write(ds) -> dict`` (rows_written etc.),
  optional ``health_check()`` / ``finalize()``.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable

from etlray.config import ETLConfig
from etlray.errors import ExtractError, LoadError, PipelineError, TransformError
from etlray.events import EventEmitter, NullEventEmitter, PipelineEvent
from etlray.plugins import PluginContext, PluginRegistry


class PipelineState(str, Enum):
    """Reference src/types.rs:368-376."""

    IDLE = "idle"
    EXTRACTING = "extracting"
    TRANSFORMING = "transforming"
    LOADING = "loading"
    COMPLETED = "completed"
    FAILED = "failed"


@dataclass
class PipelineResult:
    """Reference src/types.rs:334-341."""

    rows_processed: int = 0
    rows_successful: int = 0
    rows_failed: int = 0
    execution_time_ms: int = 0
    errors: list[str] = field(default_factory=list)


@dataclass
class PipelineMetrics:
    """Accumulated across executions (reference src/pipeline/mod.rs:23-37)."""

    total_executions: int = 0
    successful_executions: int = 0
    failed_executions: int = 0
    total_rows_processed: int = 0
    total_execution_time_ms: int = 0

    @property
    def success_rate(self) -> float:
        if self.total_executions == 0:
            return 0.0
        return self.successful_executions / self.total_executions


def _read_source(source: Any):
    if hasattr(source, "read"):
        return source.read()
    if callable(source):
        return source()
    return source  # assume Dataset


def _apply_transform(transform: Any, ds):
    if hasattr(transform, "apply"):
        return transform.apply(ds)
    return transform(ds)


class Pipeline:
    """One extractor, N chained transforms, one (or more) loaders.

    The reference allows exactly one transformer and composes via
    ``CompositeTransformer`` (src/pipeline/mod.rs:11-20); here
    ``transform()`` may simply be called repeatedly — the Dataset plan
    is the composition.
    """

    def __init__(
        self,
        source: Any,
        transforms: list[Any],
        sinks: list[Any],
        config: ETLConfig | None = None,
        event_emitter: EventEmitter | None = None,
        plugins: PluginRegistry | None = None,
        pipeline_id: str | None = None,
    ) -> None:
        self.source = source
        self.transforms = transforms
        self.sinks = sinks
        self.config = config if config is not None else ETLConfig()
        # explicit None checks: emitters/registries define __len__, so an
        # EMPTY one is falsy and `or` would silently drop it
        self.events = event_emitter if event_emitter is not None else NullEventEmitter()
        self.plugins = plugins if plugins is not None else PluginRegistry()
        self.pipeline_id = pipeline_id or uuid.uuid4().hex[:12]
        self._lock = threading.Lock()
        self.state = PipelineState.IDLE
        self.metrics = PipelineMetrics()

    # ------------------------------------------------------------------
    @staticmethod
    def builder() -> "PipelineBuilder":
        return PipelineBuilder()

    # ------------------------------------------------------------------
    def _set_state(self, state: PipelineState) -> None:
        with self._lock:
            prev, self.state = self.state, state
        self._emit("state_changed", {"from": prev.value, "to": state.value})

    def _emit(self, kind: str, payload: dict | None = None) -> None:
        ev = PipelineEvent(kind=kind, pipeline_id=self.pipeline_id, payload=payload or {})
        self.events.emit(ev)
        self.plugins.run("on_event", self._ctx, ev)

    # ------------------------------------------------------------------
    def plan(self):
        """Build the lazy Dataset (extract + transforms, no sink)."""
        ds = _read_source(self.source)
        for t in self.transforms:
            ds = _apply_transform(t, ds)
        return ds

    def execute(self) -> PipelineResult:
        """Reference mod.rs:89-212 lifecycle, streaming execution."""
        # honour an EXPLICITLY-SET config.pipeline.batch_size (builder
        # .batch_size(n) / ETL_BATCH_SIZE set _batch_size_explicit
        # alongside — the dataclass DEFAULT of 1000 is reference parity
        # only and must NOT displace Ray-native block batches). A user
        # shrinking batches to fit wide rows in worker heap previously
        # ran block-native because the value was never applied; an
        # explicit execute_batch(n) call still wins (it assigns first,
        # and this loop skips transforms that already have a size).
        pipe_cfg = getattr(self.config, "pipeline", None)
        cfg_bs = getattr(pipe_cfg, "batch_size", None) \
            if getattr(pipe_cfg, "_batch_size_explicit", False) else None
        if cfg_bs:
            for t in self.transforms:
                if hasattr(t, "batch_size") and t.batch_size is None:
                    t.batch_size = cfg_bs
        start = time.perf_counter()
        self._ctx = PluginContext(pipeline_id=self.pipeline_id, config=self.config)
        result = PipelineResult()
        self.plugins.run("initialize", self._ctx)
        self._emit("started")
        try:
            # sink preflight (reference loader.health_check gate, mod.rs:106-111)
            for sink in self.sinks:
                if hasattr(sink, "health_check"):
                    sink.health_check()

            self._set_state(PipelineState.EXTRACTING)
            self.plugins.run("before_extract", self._ctx)
            ds = _read_source(self.source)
            self.plugins.run("after_extract", self._ctx, None)

            self._set_state(PipelineState.TRANSFORMING)
            self.plugins.run("before_transform", self._ctx)
            try:
                for t in self.transforms:
                    ds = _apply_transform(t, ds)
            except Exception as e:  # plan-build error
                raise TransformError(str(e)) from e
            self.plugins.run("after_transform", self._ctx)

            self._set_state(PipelineState.LOADING)
            self.plugins.run("before_load", self._ctx)
            rows = 0
            for sink in self.sinks:
                out = sink.write(ds)
                rows = max(rows, int(out.get("rows_written", 0)) if isinstance(out, dict) else 0)
            result.rows_processed = rows
            result.rows_successful = rows
            self.plugins.run("after_load", self._ctx, result)

            for sink in self.sinks:  # flush/commit hook (mod.rs:183)
                if hasattr(sink, "finalize"):
                    sink.finalize()

            self._set_state(PipelineState.COMPLETED)
            self._emit("completed", {"rows": rows})
        except Exception as e:
            self._set_state(PipelineState.FAILED)
            result.errors.append(str(e))
            self._emit("error", {"error": str(e)})
            self._record(result, start, success=False)
            self.plugins.run("finalize", self._ctx)
            if isinstance(e, (ExtractError, TransformError, LoadError)):
                raise
            raise PipelineError(str(e)) from e
        result.execution_time_ms = int((time.perf_counter() - start) * 1000)
        self._record(result, start, success=True)
        self.plugins.run("finalize", self._ctx)
        return result

    def execute_batch(self, batch_size: int) -> PipelineResult:
        """Reference mod.rs:215-269. Ray Data already streams blocks with
        backpressure, so this only pins the map_batches batch size."""
        for t in self.transforms:
            if hasattr(t, "batch_size"):
                t.batch_size = batch_size
        return self.execute()

    def execute_streaming(self) -> PipelineResult:
        """Streaming IS the default execution model here (cf. mod.rs:273-276
        where it degenerates to execute_batch)."""
        return self.execute()

    def _record(self, result: PipelineResult, start: float, success: bool) -> None:
        with self._lock:
            self.metrics.total_executions += 1
            if success:
                self.metrics.successful_executions += 1
            else:
                self.metrics.failed_executions += 1
            self.metrics.total_rows_processed += result.rows_processed
            self.metrics.total_execution_time_ms += int((time.perf_counter() - start) * 1000)

    def get_metrics(self) -> PipelineMetrics:
        return self.metrics


class PipelineBuilder:
    """Fluent builder (reference typestate builder, mod.rs:319-468)."""

    def __init__(self) -> None:
        self._source: Any = None
        self._transforms: list[Any] = []
        self._sinks: list[Any] = []
        self._config = ETLConfig()
        self._emitter: EventEmitter | None = None
        self._plugins: PluginRegistry | None = None

    def extract(self, source: Any) -> "PipelineBuilder":
        self._source = source
        return self

    def transform(self, *transforms: Any) -> "PipelineBuilder":
        self._transforms.extend(transforms)
        return self

    def load(self, *sinks: Any) -> "PipelineBuilder":
        self._sinks.extend(sinks)
        return self

    def batch_size(self, n: int | None) -> "PipelineBuilder":
        self._config.pipeline.batch_size = n
        self._config.pipeline._batch_size_explicit = n is not None
        return self

    def timeout_seconds(self, n: int) -> "PipelineBuilder":
        self._config.pipeline.timeout_seconds = n
        return self

    def parallel_workers(self, n: int) -> "PipelineBuilder":
        self._config.pipeline.parallel_workers = n
        return self

    def enable_metrics(self, b: bool) -> "PipelineBuilder":
        self._config.features.enable_metrics = b
        return self

    def enable_logging(self, b: bool) -> "PipelineBuilder":
        self._config.features.enable_logging = b
        return self

    def memory_limit_mb(self, n: int) -> "PipelineBuilder":
        self._config.performance.memory_limit_mb = n
        return self

    def config(self, cfg: ETLConfig) -> "PipelineBuilder":
        self._config = cfg
        return self

    def event_emitter(self, emitter: EventEmitter) -> "PipelineBuilder":
        self._emitter = emitter
        return self

    def plugins(self, registry: PluginRegistry) -> "PipelineBuilder":
        self._plugins = registry
        return self

    def build(self) -> Pipeline:
        if self._source is None:
            raise PipelineError("pipeline requires a source (extract(...))")
        if not self._sinks:
            raise PipelineError("pipeline requires at least one sink (load(...))")
        self._config.validate()
        return Pipeline(
            source=self._source,
            transforms=self._transforms,
            sinks=self._sinks,
            config=self._config,
            event_emitter=self._emitter,
            plugins=self._plugins,
        )
