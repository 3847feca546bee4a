"""ORC sink — a DIRECTORY of part files, one per block, written
inside the tasks that own the blocks (same resumable-directory
contract as ParquetSink; never one giant file). Beyond the reference
surface — see sources/orc.py for why ORC is worth carrying.

Fidelity note: ORC's native timestamp unit is nanoseconds, so a
``timestamp[us]`` column round-trips to the same instants typed
``timestamp[ns]`` (tested in test_sources_sinks).
"""

from __future__ import annotations

import os
from typing import Sequence

from etlray.errors import LoadError

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
        parent = os.path.dirname(os.path.abspath(self.path))
        if not os.path.isdir(parent):
            raise LoadError(f"parent directory does not exist: {parent}")
        if not self.overwrite and os.path.exists(self.path) \
                and os.listdir(self.path):
            raise LoadError(
                f"target exists and overwrite is not set: {self.path}")

    def write(self, ds) -> dict:
        import pyarrow as pa

        self.health_check()
        if self.overwrite and os.path.isdir(self.path):
            for name in os.listdir(self.path):
                if name.endswith(".orc"):
                    os.unlink(os.path.join(self.path, name))
        os.makedirs(self.path, exist_ok=True)
        path, comp = self.path, self.compression

        def write_part(t: pa.Table) -> pa.Table:
            import uuid

            import pyarrow.orc as orc

            if t.num_rows == 0:
                return pa.table({"path": pa.array([], pa.string()),
                                 "rows": pa.array([], pa.int64())})
            fp = os.path.join(path, f"part-{uuid.uuid4().hex}.orc")
            tmp = fp + ".tmp"
            orc.write_table(t, tmp, compression=comp)
            os.replace(tmp, fp)  # never expose a half-written part
            return pa.table({"path": [fp], "rows": [t.num_rows]})

        # one summary row per block comes back to the driver — bounded
        parts = ds.map_batches(write_part, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        return {"rows_written": int(sum(p["rows"] for p in parts)),
                "paths": sorted(p["path"] for p in parts)}
