"""CDCEngine — binlog tail → lake upsert with exactly-once commits,
schema evolution and per-partition watermarks (the BASELINE.json north
star; re-imagines the reference's execute_batch drain-loop + cursor +
finalize-commit lifecycle, /root/reference/src/pipeline/mod.rs:215-269,
as epoch-sliced Dataset replay).

Table layout on disk::

    table_dir/
      _manifest.json            # atomic commit manifest (epochs, watermarks)
      _lineage.jsonl            # per-(epoch, bucket) lineage records
      snap-<id>/                # snapshot: hive-partitioned by bucket_id
        bucket_id=0/*.parquet   # (no '='/'_' prefixes in path roots —
                                #  pyarrow discovery hides _-prefixed paths)
        ...

Every snapshot is a full consistent table (one row per live key).
Incremental apply reads the previous snapshot (already bucketed — no
re-hash) plus the new events, reduces, and writes a NEW epoch dir, then
atomically commits. A crashed/retried run of the same epoch id is a
no-op after commit, and its half-written ``epoch=`` dir is simply
never referenced (write-temp/atomic-manifest-swap idempotency).
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa

from etlray.cdc.apply import (
    APPLIED_COL,
    BUCKET_COL,
    apply_changes,
    stable_bucket,
)
from etlray.cdc.evolve import conformer, unify_schemas
from etlray.cdc.fixture import RENAME_MAP
from etlray.cdc.manifest import Manifest, write_lineage_jsonl
from etlray.errors import LoadError


class CDCEngine:
    def __init__(
        self,
        table_dir: str,
        keys: Sequence[str] = ("repo", "path"),
        lsn_col: str = "lsn",
        op_col: str = "op",
        num_buckets: int = 32,
        content_col: str = "content",
        rename_map: Mapping[str, str] | None = None,
    ) -> None:
        self.table_dir = table_dir
        self.keys = list(keys)
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.num_buckets = num_buckets
        self.content_col = content_col
        self.rename_map = dict(rename_map or {})
        self.manifest = Manifest(table_dir)

    # ------------------------------------------------------------------
    def read_snapshot(self, epoch_id=None, with_internal_cols: bool = False):
        """Current (or time-travelled) table as a Dataset — the read
        side of the reference's DeltaExtractor surface."""
        import ray.data

        snap = self.manifest.snapshot_path(epoch_id)
        if snap is None:
            return None
        ds = ray.data.read_parquet(snap)
        if not with_internal_cols:
            # bucket_id MUST be dropped so the next apply recomputes it —
            # a conformed null bucket column would break partitioning
            drop = [c for c in (APPLIED_COL, BUCKET_COL) if c in ds.schema().names]
            if drop:
                ds = ds.drop_columns(drop)
        return ds

    # ------------------------------------------------------------------
    def _normalize_events(self, changes, rename_map: Mapping[str, str] | None):
        """Read every epoch-file/Dataset, conform to the unified schema
        (schema evolution), union into one event Dataset."""
        import ray.data

        if isinstance(changes, (str, list, tuple)):
            paths = [changes] if isinstance(changes, str) else list(changes)
            datasets = [ray.data.read_parquet(p) for p in paths]
        else:
            datasets = [changes]
        schemas = []
        for d in datasets:
            s = d.schema()
            schemas.append(pa.schema([pa.field(n, t) for n, t in
                                      zip(s.names, s.types)]))
        target = unify_schemas(schemas, rename_map)
        conformed = [d.map_batches(conformer(target, rename_map),
                                   batch_format="pyarrow", zero_copy_batch=True)
                     for d in datasets]
        ds = conformed[0]
        if len(conformed) > 1:
            ds = ds.union(*conformed[1:])
        return ds, target

    def _watermark_filter(self, events_ds, watermarks: dict[int, int]):
        """Drop events at-or-below the committed per-bucket watermark —
        duplicate-delivery / resume tolerance. Vectorized lookup of a
        small broadcast watermark array inside map_batches."""
        if not watermarks:
            return events_ds
        wm = np.full(self.num_buckets, -1, dtype=np.int64)
        for b, v in watermarks.items():
            wm[int(b)] = v
        keys, lsn_col, nb = self.keys, self.lsn_col, self.num_buckets

        def filt(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            buckets = stable_bucket(t, keys, nb)
            lsns = t.column(lsn_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(lsns > wm[buckets]))
        return events_ds.map_batches(filt, batch_format="pyarrow",
                                     zero_copy_batch=True)

    # ------------------------------------------------------------------
    def bootstrap(self, base_ds, epoch_id="bootstrap"):
        """Load the initial repo-files table as epoch 0 (all rows are
        op='insert' at lsn=0). The engine rename_map applies here too
        so the snapshot is born in the unified column vocabulary."""
        if self.manifest.committed(epoch_id):
            return {"epoch": epoch_id, "committed": False, "reason": "already committed"}

        lsn_col, op_col, rename = self.lsn_col, self.op_col, self.rename_map

        def stamp(t: pa.Table) -> pa.Table:
            if rename:
                t = t.rename_columns([rename.get(c, c) for c in t.column_names])
            if lsn_col not in t.column_names:
                t = t.append_column(lsn_col, pa.array(
                    np.zeros(t.num_rows, dtype=np.int64)))
            if op_col not in t.column_names:
                t = t.append_column(op_col, pa.array(["insert"] * t.num_rows))
            return t

        events = base_ds.map_batches(stamp, batch_format="pyarrow",
                                     zero_copy_batch=True)
        return self._apply_and_commit(events, epoch_id)

    def apply_log(self, changes, epoch_id,
                  rename_map: Mapping[str, str] | None = None):
        """Apply a change-log slice (paths or Dataset) as one epoch.

        Exactly-once: re-running a committed epoch id is a no-op;
        events below the per-bucket watermark are filtered (duplicate
        delivery of individual events is also a no-op)."""
        if self.manifest.committed(epoch_id):
            return {"epoch": epoch_id, "committed": False, "reason": "already committed"}
        rename = dict(self.rename_map)
        rename.update(rename_map or {})
        events, target = self._normalize_events(changes, rename)
        events = self._watermark_filter(events, self.manifest.watermarks())

        current = self.read_snapshot(with_internal_cols=False)
        if current is not None:
            # prior snapshot rows join the reduce as op='insert' at
            # their recorded LSN; conform BOTH sides to the union of
            # snapshot + event schemas (schema evolution across epochs)
            s = current.schema()
            snap_schema = pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
            full = unify_schemas([snap_schema, target], rename)
            events = events.map_batches(conformer(full, rename), batch_format="pyarrow",
                                        zero_copy_batch=True)
            current = current.map_batches(conformer(full, rename), batch_format="pyarrow",
                                          zero_copy_batch=True)
            events = events.union(current)
        return self._apply_and_commit(events, epoch_id)

    # ------------------------------------------------------------------
    def _apply_and_commit(self, events_ds, epoch_id) -> dict:
        final = apply_changes(
            events_ds,
            keys=self.keys,
            lsn_col=self.lsn_col,
            op_col=self.op_col,
            num_buckets=self.num_buckets,
            content_col=self.content_col,
            track_applied=True,
        )
        snap_dir = os.path.join(self.table_dir, f"snap-{epoch_id}")
        os.makedirs(snap_dir, exist_ok=True)
        final.write_parquet(snap_dir, partition_cols=[BUCKET_COL], mode="overwrite")

        watermarks, lineage, total_rows = self._scan_written(snap_dir)
        ok = self.manifest.commit_epoch(
            epoch_id, snap_dir, watermarks, lineage,
            metrics={"rows": total_rows})
        if ok:
            write_lineage_jsonl(os.path.join(self.table_dir, "_lineage.jsonl"),
                                epoch_id, lineage)
        return {"epoch": epoch_id, "committed": ok, "rows": total_rows,
                "buckets": len(watermarks)}

    def _scan_written(self, snap_dir: str):
        """Per-bucket watermark + lineage from parquet FOOTERS only —
        no dataset re-execution (rows / max lsn / applied counts come
        from column statistics)."""
        import pyarrow.parquet as pq

        watermarks: dict[int, int] = {}
        lineage: dict[int, dict] = {}
        total = 0
        for entry in sorted(os.listdir(snap_dir)):
            full = os.path.join(snap_dir, entry)
            if not (os.path.isdir(full) and entry.startswith(f"{BUCKET_COL}=")):
                continue
            bucket = int(entry.split("=", 1)[1])
            rows = 0
            max_lsn = -1
            applied = 0
            for fn in os.listdir(full):
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(full, fn)).metadata
                rows += md.num_rows
                schema_names = [md.schema.column(i).name
                                for i in range(md.num_columns)]
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci, name in enumerate(schema_names):
                        if name == self.lsn_col:
                            st = g.column(ci).statistics
                            if st is not None and st.has_min_max:
                                max_lsn = max(max_lsn, int(st.max))
                        elif name == APPLIED_COL:
                            st = g.column(ci).statistics
                            if st is not None and st.has_min_max:
                                applied = max(applied, int(st.max))
            watermarks[bucket] = max_lsn
            lineage[bucket] = {"rows": rows, "max_lsn": max_lsn,
                               "applied_events": applied}
            total += rows
        return watermarks, lineage, total


# ---------------------------------------------------------------------------
# flagship demo for __ray_entry__.entry()
# ---------------------------------------------------------------------------
def flagship_cdc_demo(sf_dir: str, work_dir: str | None = None):
    """Generate the deterministic CDC fixture (size keyed to sf_dir),
    bootstrap + replay all three schema-evolution epochs, and return
    the final table Dataset."""
    import tempfile

    import ray.data

    from etlray.cdc.fixture import generate_fixture

    scale = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}.get(
        os.path.basename(os.path.normpath(sf_dir)), 2_000)
    work = work_dir or tempfile.mkdtemp(prefix="etlray_cdc_")
    n_keys = max(scale // 5, 100)
    fx = generate_fixture(os.path.join(work, "fixture"), n_events=scale,
                          n_keys=n_keys, n_base=n_keys // 2)
    eng = CDCEngine(os.path.join(work, "table"), num_buckets=16)
    eng.bootstrap(ray.data.read_parquet(fx["base"]))
    for i, p in enumerate(fx["epochs"]):
        eng.apply_log(p, epoch_id=i, rename_map=RENAME_MAP)
    return eng.read_snapshot()
