"""Delta-style table source — the read side of the CDC engine's
manifest table format.

Reference: /root/reference/src/extract/delta.rs:37-148 —
``DeltaExtractor`` with time travel (``with_version``), predicate and
column pushdown (the reference stores the predicate but never applies
it, delta.rs; here both genuinely push into the parquet read).
A "version" is a committed epoch id in the manifest.
"""

from __future__ import annotations

from typing import Any, Sequence

from etlray.cdc.engine import CDCEngine
from etlray.errors import ExtractError


class DeltaSource:
    def __init__(
        self,
        table_dir: str,
        version: Any | None = None,
        columns: Sequence[str] | None = None,
        predicate: Any | None = None,  # pyarrow.dataset expression
    ) -> None:
        self.table_dir = table_dir
        self.version = version
        self.columns = list(columns) if columns else None
        self.predicate = predicate

    def with_version(self, v) -> "DeltaSource":
        self.version = v
        return self

    def with_columns(self, cols: Sequence[str]) -> "DeltaSource":
        self.columns = list(cols)
        return self

    def with_predicate(self, expr) -> "DeltaSource":
        self.predicate = expr
        return self

    def read(self):
        eng = CDCEngine(self.table_dir)
        ds = eng.read_snapshot(epoch_id=self.version, with_internal_cols=True,
                               columns=self.columns, predicate=self.predicate)
        if ds is None:
            raise ExtractError(
                f"no committed snapshot (version={self.version!r}) in {self.table_dir}")
        return ds

    def versions(self) -> list:
        return [e["id"] for e in CDCEngine(self.table_dir).manifest.load()["epochs"]]
