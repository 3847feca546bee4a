"""Cache surface (reference trait Cache
/root/reference/src/traits.rs:129-141: store/retrieve/remove/clear —
declared, no impl in the crate).

* ``InMemoryCache`` — per-process dict (what the reference trait
  implies).
* ``SharedCache`` — a NAMED Ray actor holding the dict: the one shape
  the Dataset API genuinely can't express (shared mutable state across
  stages/workers). Workers resolve it by name, so a ``map_batches``
  task or actor can consult the same cache without re-shipping it.
"""

from __future__ import annotations

import threading
from typing import Any


class Cache:
    def store(self, key: str, value: Any) -> None:  # pragma: no cover
        raise NotImplementedError

    def retrieve(self, key: str) -> Any | None:  # pragma: no cover
        raise NotImplementedError

    def remove(self, key: str) -> None:  # pragma: no cover
        raise NotImplementedError

    def clear(self) -> None:  # pragma: no cover
        raise NotImplementedError


class InMemoryCache(Cache):
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._d: dict[str, Any] = {}

    def store(self, key: str, value: Any) -> None:
        with self._lock:
            self._d[key] = value

    def retrieve(self, key: str) -> Any | None:
        with self._lock:
            return self._d.get(key)

    def remove(self, key: str) -> None:
        with self._lock:
            self._d.pop(key, None)

    def clear(self) -> None:
        with self._lock:
            self._d.clear()

    def __len__(self) -> int:
        with self._lock:
            return len(self._d)


class SharedCache(Cache):
    """Cluster-wide cache backed by a named detached Ray actor.

    ``SharedCache("vocab")`` in any worker process binds to the same
    store. NOT for bulk data (use ``ray.put`` broadcast for that) —
    this is for small shared mutable state: counters, seen-sets,
    memoized lookups.

    Lifecycle: the actor is DETACHED (it must outlive whichever worker
    constructed it first), so it persists until ``shutdown()`` or
    cluster teardown — a job that is done with a named cache should
    call ``shutdown()``, and unrelated jobs on a shared cluster should
    pick distinct names, or a later driver binds to the earlier one's
    state."""

    def __init__(self, name: str = "etlray_shared_cache") -> None:
        import ray

        @ray.remote
        class _CacheActor:
            def __init__(self):
                self.d = {}

            def store(self, k, v):
                self.d[k] = v

            def retrieve(self, k):
                return self.d.get(k)

            def remove(self, k):
                self.d.pop(k, None)

            def clear(self):
                self.d.clear()

            def size(self):
                return len(self.d)

        # lifetime="detached": the actor must outlive whichever worker
        # process happened to construct it first (lifetime=None ties it
        # to that owner and every later client gets RayActorError when
        # the owner exits); the fixed namespace keeps the name shared
        # across drivers on the same cluster
        self._actor = _CacheActor.options(
            name=name, get_if_exists=True, lifetime="detached",
            namespace="etlray").remote()
        self._ray = ray

    def store(self, key: str, value: Any) -> None:
        self._ray.get(self._actor.store.remote(key, value))

    def retrieve(self, key: str) -> Any | None:
        return self._ray.get(self._actor.retrieve.remote(key))

    def remove(self, key: str) -> None:
        self._ray.get(self._actor.remove.remote(key))

    def clear(self) -> None:
        self._ray.get(self._actor.clear.remote())

    def shutdown(self) -> None:
        """Kill the detached actor and release its state — call when
        the job owning the name is done (detached actors otherwise
        persist until cluster teardown)."""
        self._ray.kill(self._actor)

    def __len__(self) -> int:
        return self._ray.get(self._actor.size.remote())
