"""CSV sink — a DIRECTORY of part files, one per block, written
inside the tasks that own the blocks (same resumable-directory
contract as ParquetSink/OrcSink; never one giant file).

The reference ships no CSV loader (``src/load/`` has json/parquet/
delta/console/memory only) — added for source/sink symmetry with
CsvSource. Arrow's CSV writer emits floats with round-trippable
precision, so a parquet → CSV → typed-read → aggregate loop is exact
(oracled by the ``csv_roundtrip_agg`` query).
"""

from __future__ import annotations

import os

from etlray.errors import LoadError


class CsvSink:
    def __init__(self, path: str, delimiter: str = ",",
                 include_header: bool = True,
                 overwrite: bool = False) -> None:
        if len(delimiter) != 1:
            raise LoadError(
                f"csv delimiter must be one character: {delimiter!r}")
        self.path = path
        self.delimiter = delimiter
        self.include_header = include_header
        self.overwrite = overwrite

    def with_overwrite(self, b: bool = True) -> "CsvSink":
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
                if name.endswith(".csv"):
                    os.unlink(os.path.join(self.path, name))
        os.makedirs(self.path, exist_ok=True)
        path, delim, header = self.path, self.delimiter, self.include_header

        def write_part(t: pa.Table) -> pa.Table:
            import uuid

            import pyarrow.csv as pacsv

            if t.num_rows == 0:
                return pa.table({"path": pa.array([], pa.string()),
                                 "rows": pa.array([], pa.int64())})
            fp = os.path.join(path, f"part-{uuid.uuid4().hex}.csv")
            tmp = fp + ".tmp"
            pacsv.write_csv(t, tmp, write_options=pacsv.WriteOptions(
                include_header=header, delimiter=delim))
            os.replace(tmp, fp)  # never expose a half-written part
            return pa.table({"path": [fp], "rows": [t.num_rows]})

        # one summary row per block comes back to the driver — bounded
        parts = ds.map_batches(write_part, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        return {"rows_written": int(sum(p["rows"] for p in parts)),
                "paths": sorted(p["path"] for p in parts)}
