"""ORC source — stripe-streaming read with column-projection pushdown.

Beyond the reference surface (it reads CSV/JSON/Parquet/Delta only);
added because ORC is the other columnar interchange format a
warehouse-adjacent pipeline meets. Built on Ray Data's
``FileBasedDatasource`` so reads stream stripe-by-stripe with the
same backpressure/spill behavior as the built-in readers — no
whole-file materialization, files parallelize across tasks and
stripes iterate within one.
"""

from __future__ import annotations

from typing import Any, Sequence

from etlray.errors import ExtractError


def _make_datasource(paths, columns):
    from ray.data.datasource import FileBasedDatasource

    class _OrcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["orc"]

        def __init__(self) -> None:
            super().__init__(paths, file_extensions=["orc"])

        def _open_input_source(self, filesystem, path: str, **open_args):
            # ORC footers need random access — the base class opens a
            # sequential stream, which pyarrow._orc rejects
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            import pyarrow as pa
            import pyarrow.orc as orc

            reader = orc.ORCFile(f)
            for i in range(reader.nstripes):
                batch = reader.read_stripe(i, columns=columns)
                if isinstance(batch, pa.RecordBatch):
                    yield pa.Table.from_batches([batch])
                else:
                    yield batch

    return _OrcDatasource()


class OrcSource:
    """Read a file, directory or list of ``.orc`` files into a
    Dataset. ``columns=[...]`` prunes at the stripe read."""

    def __init__(self, path: str | Sequence[str],
                 columns: Sequence[str] | None = None,
                 override_num_blocks: int | None = None) -> None:
        self.path = path
        self.columns = list(columns) if columns else None
        self.override_num_blocks = override_num_blocks

    def read(self):
        import ray.data

        kw: dict[str, Any] = {}
        if self.override_num_blocks:
            kw["override_num_blocks"] = self.override_num_blocks
        try:
            return ray.data.read_datasource(
                _make_datasource(self.path, self.columns), **kw)
        except Exception as e:
            raise ExtractError(f"orc read failed: {e}") from e
