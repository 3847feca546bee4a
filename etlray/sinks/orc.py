"""ORC sink — a DIRECTORY of part files, one per block, written
inside the tasks that own the blocks (same resumable-directory
contract as ParquetSink; never one giant file). Beyond the reference
surface — see sources/orc.py for why ORC is worth carrying.

Fidelity note: ORC's native timestamp unit is nanoseconds, so a
``timestamp[us]`` column round-trips to the same instants typed
``timestamp[ns]`` (tested in test_sources_sinks).
"""

from __future__ import annotations

from etlray.errors import LoadError
from etlray.sinks._partdir import health_check_part_dir, write_part_dir

_COMPRESSIONS = {"uncompressed", "snappy", "zlib", "lz4", "zstd"}


class OrcSink:
    def __init__(self, path: str, compression: str = "zstd",
                 overwrite: bool = False) -> None:
        if compression not in _COMPRESSIONS:
            raise LoadError(
                f"unsupported orc compression: {compression} "
                f"(supported: {sorted(_COMPRESSIONS)})")
        self.path = path
        self.compression = compression
        self.overwrite = overwrite

    def with_overwrite(self, b: bool = True) -> "OrcSink":
        self.overwrite = b
        return self

    def health_check(self) -> None:
        health_check_part_dir(self.path, self.overwrite)

    def write(self, ds) -> dict:
        comp = self.compression

        def write_fn(t, tmp: str) -> None:
            import pyarrow.orc as orc

            orc.write_table(t, tmp, compression=comp)

        return write_part_dir(ds, self.path, "orc", write_fn,
                              self.overwrite)
