"""In-memory sink — the test seam (reference
/root/reference/src/load/memory.rs:41-143: thread-safe accumulator with
get_data/clear/len). Materializes the dataset as one pyarrow Table —
small results only."""

from __future__ import annotations

import threading

import pyarrow as pa


class MemorySink:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._tables: list[pa.Table] = []

    def write(self, ds) -> dict:
        batches = [b for b in ds.iter_batches(batch_format="pyarrow")]
        table = (pa.concat_tables(batches, promote_options="permissive")
                 if batches else pa.table({}))
        with self._lock:
            self._tables.append(table)
        return {"rows_written": table.num_rows, "paths": []}

    def get_data(self) -> pa.Table:
        with self._lock:
            if not self._tables:
                return pa.table({})
            return pa.concat_tables(self._tables, promote_options="permissive")

    def clear(self) -> None:
        with self._lock:
            self._tables.clear()

    def __len__(self) -> int:
        with self._lock:
            return sum(t.num_rows for t in self._tables)

    def is_empty(self) -> bool:
        return len(self) == 0
