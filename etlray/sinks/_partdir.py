"""Shared scaffold for directory-of-part-files sinks (CSV / Feather /
ORC): health check, overwrite cleanup by extension, atomic
tmp-write + ``os.replace`` per part inside the task that owns the
block, and a bounded one-summary-row-per-block driver fold. Each
format sink supplies only its writer callable and file extension —
the resumable-directory contract lives in exactly one place.
"""

from __future__ import annotations

import os
from typing import Callable

from etlray.errors import LoadError


def health_check_part_dir(path: str, overwrite: bool) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    if not os.path.isdir(parent):
        raise LoadError(f"parent directory does not exist: {parent}")
    if not overwrite and os.path.isdir(path) and os.listdir(path):
        raise LoadError(
            f"target exists and overwrite is not set: {path}")


def write_part_dir(ds, path: str, extension: str,
                   write_fn: Callable[["pa.Table", str], None],
                   overwrite: bool) -> dict:
    """Write ``ds`` as ``path/part-<uuid>.<extension>`` files, one per
    block. ``write_fn(table, tmp_path)`` serializes one block; the
    rename to the final name happens here so a crash can never expose
    a half-written part."""
    import pyarrow as pa

    health_check_part_dir(path, overwrite)
    if overwrite and os.path.isdir(path):
        for name in os.listdir(path):
            if name.endswith(f".{extension}"):
                os.unlink(os.path.join(path, name))
    os.makedirs(path, exist_ok=True)

    def write_part(t: pa.Table) -> pa.Table:
        import uuid

        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        fp = os.path.join(path, f"part-{uuid.uuid4().hex}.{extension}")
        tmp = fp + ".tmp"
        write_fn(t, tmp)
        os.replace(tmp, fp)  # never expose a half-written part
        return pa.table({"path": [fp], "rows": [t.num_rows]})

    # one summary row per block comes back to the driver — bounded
    parts = ds.map_batches(write_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    return {"rows_written": int(sum(p["rows"] for p in parts)),
            "paths": sorted(p["path"] for p in parts)}
