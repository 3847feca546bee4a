"""Error taxonomy mirroring the reference's ``ETLError``.

Reference: /root/reference/src/error.rs:8-135 — variants
{Extract, Transform, Load, Config, Pipeline, Io, Serialization, Generic}
with ``is_recoverable()`` (timeout / connection / capacity errors retry)
and ``error_code()`` (stable string codes).
"""

from __future__ import annotations

_RECOVERABLE_MARKERS = ("timeout", "connection", "capacity", "temporarily", "unavailable")


class ETLError(Exception):
    """Base error. ``is_recoverable`` drives retry-vs-fail in writer stages."""

    code = "ETL_GENERIC"

    def is_recoverable(self) -> bool:
        msg = str(self).lower()
        return any(m in msg for m in _RECOVERABLE_MARKERS)

    def error_code(self) -> str:
        return self.code


class ExtractError(ETLError):
    code = "ETL_EXTRACT"


class TransformError(ETLError):
    code = "ETL_TRANSFORM"


class LoadError(ETLError):
    code = "ETL_LOAD"


class ConfigError(ETLError):
    code = "ETL_CONFIG"

    def is_recoverable(self) -> bool:  # config errors never retry
        return False


class PipelineError(ETLError):
    code = "ETL_PIPELINE"


class IoError(ETLError):
    code = "ETL_IO"

    def is_recoverable(self) -> bool:  # I/O assumed transient, like reference Io
        return True


class SerializationError(ETLError):
    code = "ETL_SERIALIZATION"

    def is_recoverable(self) -> bool:
        return False
