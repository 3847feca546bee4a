"""Delta-style table sink — Append / Overwrite / Merge write modes over
the CDC engine's manifest table format.

Reference: /root/reference/src/load/delta.rs:27-268 — ``DeltaLoader``
with ``DeltaWriteMode::{Append, Overwrite, Merge{merge_keys,
update_columns}}``. The reference's Merge is UNIMPLEMENTED (falls back
to append with a warning, delta.rs:255-267); here Merge is the real
last-writer-wins upsert via ``CDCEngine.apply_log``, exactly-once per
epoch id, and ``update_columns`` performs a true partial-column
update: matched keys take incoming values ONLY for the listed columns
(one distributed left join against the current snapshot completes the
rest from stored rows); unmatched keys insert as-is.
"""

from __future__ import annotations

import time
from typing import Sequence

import numpy as np
import pyarrow as pa

from etlray.cdc.engine import CDCEngine
from etlray.errors import LoadError


class DeltaSink:
    def __init__(
        self,
        table_dir: str,
        mode: str = "append",
        merge_keys: Sequence[str] | None = None,
        update_columns: Sequence[str] | None = None,
        num_buckets: int | None = None,
        epoch_id=None,
    ) -> None:
        if mode not in ("append", "overwrite", "merge"):
            raise LoadError(f"unsupported delta write mode: {mode}")
        if mode == "merge" and not merge_keys:
            raise LoadError("merge mode requires merge_keys")
        self.table_dir = table_dir
        self.mode = mode
        self.merge_keys = list(merge_keys or [])
        self.update_columns = list(update_columns or [])
        self.num_buckets = num_buckets
        self.epoch_id = epoch_id

    def _engine(self) -> CDCEngine:
        keys = self.merge_keys or ["__row_id"]
        return CDCEngine(self.table_dir, keys=keys, num_buckets=self.num_buckets,
                         content_col="__none__")

    def _complete_partial_updates(self, eng: CDCEngine, ds):
        """Left-join incoming rows against the current snapshot on the
        merge keys and, for every data column NOT in update_columns,
        coalesce to the STORED value when the key matched."""
        import pyarrow.compute as pc

        from etlray.stages.joins import PartitionedHashJoinTransform

        cur = eng.read_snapshot()
        s = cur.schema()
        keys = set(self.merge_keys)
        upd = set(self.update_columns)
        bookkeeping = {eng.lsn_col, eng.op_col, "content_sha"}
        keep = [c for c in s.names
                if c not in keys and c not in upd and c not in bookkeeping]
        if not keep:
            return ds
        right = cur.select_columns(self.merge_keys + keep)

        def mark(t: pa.Table) -> pa.Table:
            # explicit match marker: testing is_valid(stored_col) would
            # mis-handle a matched key whose STORED value is NULL
            return t.append_column("__matched", pa.array(
                [True] * t.num_rows, type=pa.bool_()))

        right = right.map_batches(mark, batch_format="pyarrow",
                                  zero_copy_batch=True)
        suffix = "__stored"
        joined = PartitionedHashJoinTransform(
            right, on=self.merge_keys, how="left",
            suffix=suffix).apply(ds)

        def coalesce(t: pa.Table) -> pa.Table:
            matched = pc.fill_null(t["__matched"], False)
            for c in keep:
                stored = f"{c}{suffix}"
                if stored not in t.column_names:
                    # incoming lacked the column entirely → the joined
                    # stored values came through under the bare name
                    continue
                merged = pc.if_else(matched, t[stored], t[c])
                if isinstance(merged, pa.ChunkedArray):
                    merged = merged.combine_chunks()
                t = t.set_column(t.column_names.index(c), c, merged)
                t = t.drop_columns([stored])
            return t.drop_columns(["__matched"])

        return joined.map_batches(coalesce, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def write(self, ds) -> dict:
        import uuid

        eng = self._engine()
        # uuid, not a millisecond stamp: two write() calls in the same
        # millisecond must not collide into a silent "already committed"
        # no-op that drops the second call's rows
        auto_epoch = self.epoch_id is None
        epoch = self.epoch_id if not auto_epoch else f"w-{uuid.uuid4().hex}"
        lsn_col, op_col = eng.lsn_col, eng.op_col
        # LSN floor: the engine filters events at lsn <= the committed
        # per-bucket watermark, so a wall-clock stamp that ties or
        # precedes the previous write's (same-microsecond writes, an
        # NTP step back) would silently drop every row as a duplicate.
        # max(clock, watermark+1) keeps stamps strictly increasing.
        wm_floor = max((eng.manifest.watermarks() or {}).values(),
                       default=-1)
        base_lsn = max(int(time.time() * 1_000_000), wm_floor + 1)

        def stamp(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if "__row_id" in eng.keys and "__row_id" not in t.column_names:
                import uuid

                rid = [uuid.uuid4().hex for _ in range(n)]
                t = t.append_column("__row_id", pa.array(rid))
            if lsn_col not in t.column_names:
                t = t.append_column(lsn_col, pa.array(
                    np.full(n, base_lsn, dtype=np.int64)))
            if op_col not in t.column_names:
                t = t.append_column(op_col, pa.array(["insert"] * n))
            return t

        if self.mode == "merge" and self.update_columns \
                and eng.manifest.snapshot_files() is not None:
            # partial-column merge (the reference Merge surface's
            # update_columns): on MATCHED keys only the listed columns
            # take the incoming value — the rest keep the stored row's
            # value; unmatched keys insert the incoming row as-is.
            # One distributed left join against the current snapshot
            # per write (sink writes are epoch-sized, not table-sized).
            ds = self._complete_partial_updates(eng, ds)

        stamped = ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)

        if self.mode == "overwrite" or eng.manifest.snapshot_files() is None:
            # fresh table (bootstrap); overwrite = new epoch covering all
            # buckets with ONLY the new data (ignore prior files)
            if self.mode == "overwrite":
                eng.manifest = _fresh_manifest(eng)
            res = eng.bootstrap(stamped, epoch_id=epoch)
        elif self.mode == "merge":
            res = eng.apply_log(stamped, epoch_id=epoch)
        else:  # append: treat rows as inserts under unique synthetic keys
            res = eng.apply_log(stamped, epoch_id=epoch)
        if auto_epoch and not res.get("committed", False):
            # a fresh-uuid epoch can only fail to commit on a real commit
            # error — surface it instead of silently dropping the rows
            raise LoadError(f"delta write for epoch {epoch} did not commit: {res}")
        return {"rows_written": res.get("rows", 0), "paths": [self.table_dir],
                "epoch": res.get("epoch")}


def _fresh_manifest(eng: CDCEngine):
    """Overwrite semantics: start a new manifest lineage (old epochs
    remain on disk via the ``.bak`` copies Manifest.reset keeps)."""
    eng.manifest.reset()
    return eng.manifest
