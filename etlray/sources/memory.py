"""In-memory source (reference MemoryExtractor,
/root/reference/examples/example_03.rs:218-233)."""

from __future__ import annotations

from typing import Any, Sequence

import pyarrow as pa


class MemorySource:
    """Rows (list of dicts), a pyarrow Table, or a pandas DataFrame."""

    def __init__(self, data: Any) -> None:
        self.data = data

    def read(self):
        import ray.data

        d = self.data
        if isinstance(d, pa.Table):
            return ray.data.from_arrow(d)
        try:
            import pandas as pd
            if isinstance(d, pd.DataFrame):
                return ray.data.from_pandas(d)
        except ImportError:
            pass
        return ray.data.from_items(list(d))
