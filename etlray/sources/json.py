"""JSON / JSONL sources.

Reference: /root/reference/src/extract/json.rs —
``JsonExtractor`` (9-156): whole-file JSON array / single object /
scalar → ``{"value": …}``; dotted ``array_path`` descent into nested
docs. ``JsonLinesExtractor`` (160-254): JSONL, blank lines skipped,
non-object lines → ``{"value": …}``.

JSONL is the at-scale path → ``ray.data.read_json`` (Arrow JSON
reader, parallel over files/blocks). Whole-file JSON arrays are
config-sized in the reference's usage, so they parse driver-side into
one Arrow table (documented small-file path).
"""

from __future__ import annotations

import json
from typing import Any, Sequence

from etlray.errors import ExtractError


def _descend(doc: Any, array_path: str | None) -> Any:
    if not array_path:
        return doc
    cur = doc
    for part in array_path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            raise ExtractError(f"array_path segment {part!r} not found")
        cur = cur[part]
    return cur


def _normalize_items(doc: Any) -> list[dict]:
    if isinstance(doc, list):
        return [it if isinstance(it, dict) else {"value": it} for it in doc]
    if isinstance(doc, dict):
        return [doc]
    return [{"value": doc}]


class JsonSource:
    """Whole-file JSON (array / object / scalar) with array_path descent."""

    def __init__(self, path: str, array_path: str | None = None) -> None:
        self.path = path
        self.array_path = array_path

    def with_array_path(self, p: str) -> "JsonSource":
        self.array_path = p
        return self

    def read(self):
        import ray.data

        try:
            with open(self.path, "r", encoding="utf-8") as f:
                doc = json.load(f)
        except OSError as e:
            raise ExtractError(f"json read failed: {e}") from e
        except json.JSONDecodeError as e:
            raise ExtractError(f"invalid json: {e}") from e
        items = _normalize_items(_descend(doc, self.array_path))
        if not items:
            import pyarrow as pa
            return ray.data.from_arrow(pa.table({}))
        return ray.data.from_items(items)


class JsonLinesSource:
    """JSONL at scale via Arrow's parallel JSON reader. Lenient mode
    (blank lines skipped, non-object lines → {"value": …}) falls back
    to read_text + parse inside map_batches."""

    def __init__(self, path: str | Sequence[str], lenient: bool = False) -> None:
        self.path = path
        self.lenient = lenient

    def read(self):
        import ray.data

        if not self.lenient:
            try:
                return ray.data.read_json(self.path)
            except Exception as e:
                raise ExtractError(f"jsonl read failed: {e}") from e

        import pyarrow as pa

        def parse(batch: pa.Table) -> pa.Table:
            rows = []
            for line in batch.column("text").to_pylist():
                s = line.strip()
                if not s:
                    continue
                obj = json.loads(s)
                rows.append(obj if isinstance(obj, dict) else {"value": obj})
            return pa.Table.from_pylist(rows)

        return ray.data.read_text(self.path).map_batches(
            parse, batch_format="pyarrow"
        )


class JsonStreamSource(JsonSource):
    """API-parity alias (reference JsonStreamExtractor,
    /root/reference/src/extract/json.rs:257-296 — a buffered-stream
    wrapper that delegates to JsonExtractor)."""

    def __init__(self, path: str, array_path: str | None = None,
                 buffer_size: int | None = None) -> None:
        super().__init__(path, array_path)
        self.buffer_size = buffer_size  # accepted for parity; unused

    def with_buffer_size(self, n: int) -> "JsonStreamSource":
        self.buffer_size = n
        return self
