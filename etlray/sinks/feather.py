"""Feather (Arrow IPC file) sink — a DIRECTORY of part files, one per
block, written inside the tasks that own the blocks (same
resumable-directory contract as ParquetSink/OrcSink/CsvSink). Types
round-trip exactly: IPC *is* Arrow's memory layout on disk.
"""

from __future__ import annotations

from etlray.errors import LoadError
from etlray.sinks._partdir import health_check_part_dir, write_part_dir

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
        health_check_part_dir(self.path, self.overwrite)

    def write(self, ds) -> dict:
        comp = self.compression

        def write_fn(t, tmp: str) -> None:
            import pyarrow.feather as feather

            feather.write_feather(t, tmp,
                                  compression=comp or "uncompressed")

        return write_part_dir(ds, self.path, "feather", write_fn,
                              self.overwrite)
