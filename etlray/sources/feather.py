"""Feather (Arrow IPC file) source — record-batch-streaming read.

Beyond the reference surface; added because Arrow IPC is the
zero-serialization interchange format between Arrow-native engines
(pandas/polars `to_feather` output). Built on Ray Data's
``FileBasedDatasource`` so files parallelize across read tasks and
record batches stream within one — no whole-file materialization.
IPC files need random access (footer-indexed), so the source opens a
seekable handle like the ORC reader (sources/orc.py).
"""

from __future__ import annotations

from typing import Any, Sequence

from etlray.errors import ExtractError


def _make_datasource(paths, columns):
    from ray.data.datasource import FileBasedDatasource

    class _FeatherDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["feather", "arrow", "ipc"]

        def __init__(self) -> None:
            super().__init__(paths,
                             file_extensions=["feather", "arrow", "ipc"])

        def _open_input_source(self, filesystem, path: str, **open_args):
            # the IPC *file* format locates batches via a footer —
            # needs a seekable handle, not a sequential stream
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            import pyarrow as pa
            import pyarrow.ipc as ipc

            reader = ipc.open_file(f)
            for i in range(reader.num_record_batches):
                batch = reader.get_batch(i)
                t = pa.Table.from_batches([batch])
                # IPC batches are materialized whole; projection here
                # still prunes what flows into the pipeline
                yield t.select(columns) if columns else t

    return _FeatherDatasource()


class FeatherSource:
    """Read a file, directory or list of Feather v2 / Arrow IPC files
    into a Dataset. ``columns=[...]`` prunes per batch (the IPC file
    layout has no column-level read pushdown — documented)."""

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
            raise ExtractError(f"feather read failed: {e}") from e
