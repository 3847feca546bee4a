"""Feather (Arrow IPC file) sink — a DIRECTORY of part files, one per
block, written inside the tasks that own the blocks (same
resumable-directory contract as ParquetSink/OrcSink/CsvSink). Types
round-trip exactly: IPC *is* Arrow's memory layout on disk.
"""

from __future__ import annotations

import os

from etlray.errors import LoadError

_COMPRESSIONS = {None, "lz4", "zstd", "uncompressed"}


class FeatherSink:
    def __init__(self, path: str, compression: str | None = "zstd",
                 overwrite: bool = False) -> None:
        if compression not in _COMPRESSIONS:
            raise LoadError(
                f"unsupported feather compression: {compression} "
                f"(supported: lz4, zstd, uncompressed)")
        self.path = path
        self.compression = None if compression == "uncompressed" \
            else compression
        self.overwrite = overwrite

    def with_overwrite(self, b: bool = True) -> "FeatherSink":
        self.overwrite = b
        return self

    def health_check(self) -> None:
        parent = os.path.dirname(os.path.abspath(self.path))
        if not os.path.isdir(parent):
            raise LoadError(f"parent directory does not exist: {parent}")
        if not self.overwrite and os.path.isdir(self.path) \
                and os.listdir(self.path):
            raise LoadError(
                f"target exists and overwrite is not set: {self.path}")

    def write(self, ds) -> dict:
        import pyarrow as pa

        self.health_check()
        if self.overwrite and os.path.isdir(self.path):
            for name in os.listdir(self.path):
                if name.endswith(".feather"):
                    os.unlink(os.path.join(self.path, name))
        os.makedirs(self.path, exist_ok=True)
        path, comp = self.path, self.compression

        def write_part(t: pa.Table) -> pa.Table:
            import uuid

            import pyarrow.feather as feather

            if t.num_rows == 0:
                return pa.table({"path": pa.array([], pa.string()),
                                 "rows": pa.array([], pa.int64())})
            fp = os.path.join(path, f"part-{uuid.uuid4().hex}.feather")
            tmp = fp + ".tmp"
            feather.write_feather(t, tmp, compression=comp or "uncompressed")
            os.replace(tmp, fp)  # never expose a half-written part
            return pa.table({"path": [fp], "rows": [t.num_rows]})

        # one summary row per block comes back to the driver — bounded
        parts = ds.map_batches(write_part, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        return {"rows_written": int(sum(p["rows"] for p in parts)),
                "paths": sorted(p["path"] for p in parts)}
