"""Pipeline events — mirror of the reference's event surface.

Reference: /root/reference/src/types.rs:398-431 (``PipelineEvent``) and
/root/reference/src/events.rs:86-119 (``InMemoryEventEmitter``).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class PipelineEvent:
    """One of: started, state_changed, batch_processed, error, completed."""

    kind: str
    pipeline_id: str
    timestamp: float = field(default_factory=time.time)
    payload: dict[str, Any] = field(default_factory=dict)


class EventEmitter:
    """Extension surface (reference trait EventEmitter, src/traits.rs)."""

    def emit(self, event: PipelineEvent) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class InMemoryEventEmitter(EventEmitter):
    """Thread-safe accumulator (reference src/events.rs:86-119)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._events: list[PipelineEvent] = []

    def emit(self, event: PipelineEvent) -> None:
        with self._lock:
            self._events.append(event)

    def get_events(self) -> list[PipelineEvent]:
        with self._lock:
            return list(self._events)

    def clear(self) -> None:
        with self._lock:
            self._events.clear()

    def __len__(self) -> int:
        with self._lock:
            return len(self._events)


class NullEventEmitter(EventEmitter):
    def emit(self, event: PipelineEvent) -> None:
        pass
