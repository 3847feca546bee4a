"""Retry policy (reference trait Retryable + RetryConfig,
/root/reference/src/traits.rs:173-200: 3 attempts, 1000 ms delay,
2.0 backoff; retries only recoverable errors per
``ETLError.is_recoverable``)."""

from __future__ import annotations

import functools
import time
from typing import Callable, TypeVar

from etlray.config import RetryConfig
from etlray.errors import ETLError

T = TypeVar("T")


def retry(config: RetryConfig | None = None) -> Callable:
    """Decorator: retries recoverable ETLErrors with exponential
    backoff; non-recoverable errors raise immediately."""
    cfg = config or RetryConfig()
    if cfg.max_attempts < 1:
        raise ValueError(
            f"max_attempts must be >= 1, got {cfg.max_attempts}")

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs) -> T:
            delay = cfg.delay_ms / 1000.0
            last: Exception | None = None
            for attempt in range(cfg.max_attempts):
                try:
                    return fn(*args, **kwargs)
                except ETLError as e:
                    if not e.is_recoverable():
                        raise
                    last = e
                    if attempt < cfg.max_attempts - 1:
                        time.sleep(delay)
                        delay *= cfg.backoff_factor
            raise last  # type: ignore[misc]
        return wrapper
    return deco
