"""Parquet source — true pushdown where the reference faked it.

Reference: /root/reference/src/extract/parquet.rs:59-301 —
``ParquetExtractor`` applies column "projection" post-read by key
filtering (parquet.rs:277-286) and caches file metadata
(parquet.rs:119-146). Here projection and row filters push down into
the read (``ray.data.read_parquet(columns=..., filter=...)``) so only
the needed columns/row-groups leave storage.
"""

from __future__ import annotations

from typing import Any, Sequence

from etlray.errors import ExtractError


class ParquetSource:
    def __init__(
        self,
        path: str | Sequence[str],
        columns: Sequence[str] | None = None,
        filter: Any | None = None,  # pyarrow.dataset expression
        override_num_blocks: int | None = None,
    ) -> None:
        self.path = path
        self.columns = list(columns) if columns else None
        self.filter = filter
        self.override_num_blocks = override_num_blocks
        self._cached_metadata: dict | None = None

    def with_columns(self, columns: Sequence[str]) -> "ParquetSource":
        self.columns = list(columns)
        return self

    def read(self):
        import ray.data

        kw: dict[str, Any] = {}
        if self.columns:
            kw["columns"] = self.columns
        if self.filter is not None:
            kw["filter"] = self.filter
        if self.override_num_blocks:
            kw["override_num_blocks"] = self.override_num_blocks
        try:
            return ray.data.read_parquet(self.path, **kw)
        except Exception as e:
            raise ExtractError(f"parquet read failed: {e}") from e

    def get_metadata(self) -> dict:
        """File metadata, read once and cached (reference
        parquet.rs:119-146,304-314: num_rows, num_row_groups,
        created_by, schema string)."""
        if self._cached_metadata is None:
            import pyarrow.parquet as pq

            path = self.path if isinstance(self.path, str) else self.path[0]
            md = pq.ParquetFile(path).metadata
            self._cached_metadata = {
                "num_rows": md.num_rows,
                "num_row_groups": md.num_row_groups,
                "num_columns": md.num_columns,
                "created_by": md.created_by,
                "schema": str(md.schema),
            }
        return self._cached_metadata
