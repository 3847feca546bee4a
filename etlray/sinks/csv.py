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

from etlray.errors import LoadError
from etlray.sinks._partdir import health_check_part_dir, write_part_dir


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
        health_check_part_dir(self.path, self.overwrite)

    def write(self, ds) -> dict:
        delim, header = self.delimiter, self.include_header

        def write_fn(t, tmp: str) -> None:
            import pyarrow.csv as pacsv

            pacsv.write_csv(t, tmp, write_options=pacsv.WriteOptions(
                include_header=header, delimiter=delim))

        return write_part_dir(ds, self.path, "csv", write_fn,
                              self.overwrite)
