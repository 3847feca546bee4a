"""Parquet sink — a DIRECTORY of part files, never one giant file.

Reference: /root/reference/src/load/parquet.rs:48-399 —
compression {uncompressed, snappy, gzip, brotli, zstd, lz4}, overwrite
guard (error when target exists and overwrite not set,
parquet.rs:341-345), custom key-value metadata. The reference writes a
single file with a schema inferred from the data (union of keys, first
non-null type); here schemas are real Arrow schemas and output is a
partitioned directory so a rerun can skip/replace atomically —
resumable output at 100 TB.

Documented deviation: the reference also lists ``Lzo``
(parquet.rs:36-44); pyarrow ships no LZO codec (LZO is GPL-encumbered
and parquet-cpp never implemented it), so this sink supports the other
five plus lz4 and rejects "lzo" with an explicit error.
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

from etlray.errors import LoadError

_COMPRESSIONS = {"uncompressed", "snappy", "gzip", "brotli", "zstd", "lz4"}


class ParquetSink:
    def __init__(
        self,
        path: str,
        compression: str = "snappy",
        overwrite: bool = False,
        metadata: Mapping[str, str] | None = None,
        partition_cols: Sequence[str] | None = None,
        min_rows_per_file: int | None = None,
    ) -> None:
        if compression not in _COMPRESSIONS:
            raise LoadError(f"unsupported compression: {compression}")
        self.path = path
        self.compression = compression
        self.overwrite = overwrite
        self.metadata = dict(metadata) if metadata else None
        self.partition_cols = list(partition_cols) if partition_cols else None
        self.min_rows_per_file = min_rows_per_file

    def with_overwrite(self, b: bool = True) -> "ParquetSink":
        self.overwrite = b
        return self

    def health_check(self) -> None:
        parent = os.path.dirname(os.path.abspath(self.path))
        if not os.path.isdir(parent):
            raise LoadError(f"parent directory does not exist: {parent}")
        # overwrite guard (reference parquet.rs:341-345)
        if not self.overwrite and os.path.exists(self.path) and os.listdir(self.path):
            raise LoadError(
                f"target exists and overwrite is not set: {self.path}")

    def write(self, ds) -> dict:
        self.health_check()
        kw: dict = {
            "compression": "none" if self.compression == "uncompressed" else self.compression,
        }
        if self.partition_cols:
            kw["partition_cols"] = self.partition_cols
        if self.min_rows_per_file:
            kw["min_rows_per_file"] = self.min_rows_per_file
        if self.metadata:
            # key-value metadata rides the SCHEMA into each file's
            # footer (pq.ParquetWriter has no 'metadata' kwarg — the
            # previous arrow_parquet_args_fn route crashed every write)
            md = {str(k): str(v) for k, v in self.metadata.items()}

            def stamp_md(t, _md=md):
                merged = dict(t.schema.metadata or {})
                merged.update({k.encode(): v.encode()
                               for k, v in _md.items()})
                return t.replace_schema_metadata(merged)

            ds = ds.map_batches(stamp_md, batch_format="pyarrow",
                                zero_copy_batch=True)
        if self.overwrite:
            kw["mode"] = "overwrite"
        ds.write_parquet(self.path, **kw)
        return {"rows_written": _count_rows(self.path), "paths": [self.path]}

    def finalize(self) -> None:
        pass


def _count_rows(path: str) -> int:
    """Count written rows from parquet footers — no dataset re-execution."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total
