"""etlray — a Ray-Data-native data-processing / CDC-ingest engine.

A from-scratch re-imagining of the capabilities of silvanoneto/etl-rs
(reference at /root/reference, Rust) on top of ``ray.data.Dataset``:

* every per-record transform is a vectorized ``map_batches`` over
  zero-copy Arrow batches (reference: row-at-a-time closures,
  ``/root/reference/src/transform/common.rs``);
* aggregations are ``groupby().aggregate()`` shuffles with partial
  pre-aggregation (reference: single-thread HashMap group-by,
  ``src/transform/common.rs:330-370``);
* stateful stages (writers, model scoring, index lookups) are callable
  classes run as actor pools;
* the flagship is a CDC / incremental-ingest engine (binlog tail →
  last-writer-wins upsert with schema evolution and an exactly-once
  commit manifest) — the Ray-native generalisation of the reference's
  ``DeltaWriteMode::Merge`` surface (``src/load/delta.rs:27-268``).

Library code NEVER calls ``ray.init()`` — sessions are owned by the
driver, ``bench.py``, or the pytest fixture.
"""

from etlray.errors import (
    ETLError,
    ExtractError,
    TransformError,
    LoadError,
    ConfigError,
    PipelineError,
)
from etlray.config import ETLConfig, PipelineConfig
from etlray.pipeline import Pipeline, PipelineResult, PipelineState

__version__ = "0.1.0"

__all__ = [
    "ETLError",
    "ExtractError",
    "TransformError",
    "LoadError",
    "ConfigError",
    "PipelineError",
    "ETLConfig",
    "PipelineConfig",
    "Pipeline",
    "PipelineResult",
    "PipelineState",
]
