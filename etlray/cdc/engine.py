"""CDCEngine — binlog tail → lake upsert with exactly-once commits,
schema evolution, per-partition watermarks and INCREMENTAL bucket
rewrite (the BASELINE.json north star; re-imagines the reference's
execute_batch drain-loop + cursor + finalize-commit lifecycle,
/root/reference/src/pipeline/mod.rs:215-269, as epoch-sliced Dataset
replay).

Table layout on disk::

    table_dir/
      _manifest.json            # ~100-byte atomic pointer (current epoch, count)
      epochs.d/e-<id>.json      # one commit record per epoch (O(1) commits)
      _lineage.jsonl            # per-(epoch, bucket) lineage records (append-only)
      snap-<id>/
        bucket_id=<b>/part-0.parquet   # only buckets TOUCHED by epoch <id>

The manifest maps every bucket to the parquet file holding its current
rows; an epoch's mapping may point into older ``snap-*`` dirs for
buckets the epoch did not touch (carry-forward). Cost per epoch is
therefore ∝ new events + data in touched buckets — NOT O(table) — the
property that makes a 10^10-event log feasible: a binlog slice that
touches 5% of key space rewrites 5% of the table.

Write path: one ``hash_exchange`` gather task per touched bucket IS
the writer — it merges the bucket's previous file + new events,
LWW-reduces, stamps sha256(content) for new rows only, writes
``snap-<id>/bucket_id=<b>/part-0.parquet`` and returns a stats row.
Writes are deterministic-by-path (retry = overwrite, idempotent);
visibility is gated solely by the atomic manifest swap, so a
crashed/duplicated epoch can never double-apply.
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from etlray.cdc.apply import APPLIED_COL, BUCKET_COL, stable_bucket
from etlray.cdc.evolve import conform_table, conformer, unify_schemas
from etlray.cdc.manifest import Manifest, write_lineage_jsonl


# payload-pruned exchange (SURVEY §7.3): mean payload bytes/row above
# which "auto" nulls out the content column at the map side and ships
# only (keys, lsn, op, content_sha, 12-byte source locator) through the
# shuffle, late-materializing winners' contents at the bucket writer.
# Threshold set from measurement (BASELINE.md, 8M events × ~0.9 KB
# contents, pinned): pruning costs a SECOND content decode at the fetch
# layer, so on intra-node exchanges it only pays once per-row payloads
# reach blob scale (the inline path measured both faster and ≥0.8
# scaling at 0.9 KB); on a real cluster the exchange crosses the NIC
# while the fetch hits node-local object storage, shifting the
# break-even far lower — tune per deployment, or force with
# prune_payload=True.
PRUNE_PAYLOAD_AUTO_BYTES = 16384


def _mean_payload_bytes(sources, col_names) -> float:
    """Mean uncompressed bytes/row of the first matching payload column
    across ``sources`` (paths or already-read FileMetaData) — footer
    metadata only, no data read."""
    import pyarrow.parquet as pq

    total_b = total_r = 0
    for p in sources:
        md = p if hasattr(p, "num_row_groups") else \
            pq.ParquetFile(p).metadata
        # row-group column indices are parquet LEAF indices, not arrow
        # top-level field indices — with a struct/list column ahead of
        # the payload the arrow index points at the wrong leaf's byte
        # stats (verified empirically); match by leaf path instead
        # (top-level flat columns have path == name)
        ci = next((i for i in range(len(md.schema))
                   if md.schema.column(i).path in col_names), None)
        if ci is None:
            continue
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            total_r += rgm.num_rows
            total_b += rgm.column(ci).total_uncompressed_size
    return total_b / total_r if total_r else 0.0


def _chunked_take(values, idx: "np.ndarray"):
    """``take`` that never materializes a >2 GB contiguous array:
    pyarrow 16's ``ChunkedArray.take`` concatenates its INPUT first,
    which overflows int32 string offsets on blob-scale payload columns
    (verified: a 2.4 GB chunked take raises ArrowInvalid). Resolve
    indices per input chunk instead; output stays chunked, order of
    ``idx`` preserved. Each output chunk is bounded by its source
    chunk's size (indices are unique in the payload-fetch callers)."""
    if isinstance(values, pa.Array):
        values = pa.chunked_array([values])
    if len(idx) == 0:
        return values.slice(0, 0)
    bounds = np.cumsum([0] + [len(c) for c in values.chunks])
    gid = np.searchsorted(bounds, idx, side="right") - 1
    change = np.flatnonzero(np.diff(gid)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(idx)]))
    out = []
    for s, e in zip(starts, ends):
        g = gid[s]
        local = idx[s:e] - bounds[g]
        out.append(values.chunk(int(g)).take(pa.array(local)))
    return pa.chunked_array(out, type=values.type)


def _fetch_payload_rows(pf, rows_needed: "np.ndarray", col: str):
    """Read ONLY the row groups containing ``rows_needed`` (global row
    ordinals, ascending) from an opened ``pq.ParquetFile`` and return
    the payload column aligned to that order. Cost ∝ row groups
    touched, not file size. Takes the open file (not a path) so the
    caller's footer read is reused instead of paying a second one."""
    from etlray.exchange import row_group_offsets

    sizes, starts = row_group_offsets(pf.metadata)
    gids = np.searchsorted(starts, rows_needed, side="right") - 1
    need = np.unique(gids)
    tbl = pf.read_row_groups([int(g) for g in need], columns=[col])
    read_starts = np.concatenate(([0], np.cumsum(sizes[need])))
    local = read_starts[np.searchsorted(need, gids)] \
        + (rows_needed - starts[gids])
    # chunk-safe take: the union of a file's winning rows can exceed
    # 2 GB of payload — combining chunks first overflowed int32 offsets
    return _chunked_take(tbl.column(col), local)


_LOC_KEY_SHIFT = 40  # (file_idx << 40) | row_ordinal — rows/file < 2^40

# _attach_contents scatter-slice byte budget (module-level so tests can
# force multi-slice paths on small data)
_ATTACH_SLICE_BYTES = 256 << 20


def _col_row_bytes(col: "pa.ChunkedArray", n: int) -> "np.ndarray":
    """Per-row payload bytes for slice-boundary decisions: EXACT (from
    the varlen value lengths) for string/binary columns, mean-based for
    fixed-width types. Exactness matters — a mean-sized slice over
    skewed blob data (a clustered run of multi-hundred-KB rows) can
    still blow past the int32 offset limit the slicing exists to
    avoid. Nulls count 0."""
    import pyarrow.compute as pc

    t = col.type
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        ln = pc.fill_null(pc.binary_length(col), 0)
        return ln.combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
    return np.full(n, col.nbytes / max(n, 1))


def _loc_key(sf: "np.ndarray", rows: "np.ndarray") -> "np.ndarray":
    return (sf.astype(np.int64) << _LOC_KEY_SHIFT) | rows.astype(np.int64)


def _fetch_file_payloads(path: str, file_idx: int, content_col: str,
                         rename, num_buckets: int, *need_tables):
    """Fetch task for ONE source epoch file (payload-pruned exchange):
    union every bucket's needed row ordinals for this file, read each
    containing row group EXACTLY ONCE, and return one
    (__src_file, __src_row, content) table per bucket. Total source
    bytes decoded per epoch ≈ the row groups holding winning rows —
    independent of bucket count (the naive per-bucket-writer fetch
    re-decoded every group once per bucket: a num_buckets× read
    amplification, measured 3× wall at 200k events / 32 buckets)."""
    import pyarrow.parquet as pq

    from etlray.exchange import SRC_FILE_COL, SRC_ROW_COL

    per_bucket = []
    for bt in need_tables:
        if bt.num_rows == 0:
            per_bucket.append(np.array([], dtype=np.int64))
            continue
        sf = bt[SRC_FILE_COL].to_numpy(zero_copy_only=False)
        rows = bt[SRC_ROW_COL].to_numpy(zero_copy_only=False)
        per_bucket.append(rows[sf == file_idx].astype(np.int64))
    combined = np.unique(np.concatenate(per_bucket)) if per_bucket \
        else np.array([], dtype=np.int64)
    pf = pq.ParquetFile(path)  # ONE footer read: schema + fetch share it
    names = pf.schema_arrow.names
    reverse = {v: k for k, v in (rename or {}).items()}
    src_col = content_col if content_col in names \
        else reverse.get(content_col)
    # empty/columnless parts carry a NULL-typed payload so the writer's
    # permissive concat promotes them to whatever type the real parts
    # have (string/large_string/binary) instead of pinning pa.string()
    ctype = pa.null()
    if combined.size and src_col in names:
        vals = _fetch_payload_rows(pf, combined, src_col)
        ctype = vals.type
    else:
        vals = pa.nulls(combined.size, type=ctype)
    outs = []
    for rows_b in per_bucket:
        pos = np.searchsorted(combined, rows_b)
        outs.append(pa.table({
            SRC_FILE_COL: pa.array(np.full(len(rows_b), file_idx,
                                           dtype=np.int32)),
            SRC_ROW_COL: pa.array(rows_b),
            content_col: _chunked_take(vals, pos) if len(rows_b)
            else pa.nulls(0, type=ctype),
        }))
    return outs if num_buckets > 1 else outs[0]


def _stamp_missing_shas(t: pa.Table, content_col: str) -> pa.Table:
    """Hash rows whose ``content_sha`` is null but content is valid —
    the writer-side completion of sha stamping. Covers (a) legacy
    snapshots written before map-side stamping and (b) the
    payload-pruned exchange, which defers ALL sha work here so only
    the WINNING rows (∝ final table) are ever hashed."""
    import pyarrow.compute as pc

    from etlray.cdc.apply import sha256_column

    if content_col not in t.column_names:
        return t
    if "content_sha" not in t.column_names:
        return t.append_column(
            "content_sha", sha256_column(t.column(content_col)))
    shav = t.column("content_sha")
    need = pc.and_(pc.is_null(shav), pc.is_valid(t.column(content_col)))
    if not pc.any(need).as_py():
        return t
    idx = np.flatnonzero(
        need.combine_chunks().to_numpy(zero_copy_only=False))
    fixed = sha256_column(_chunked_take(t.column(content_col), idx))
    vals = shav.to_pylist()
    for i, v in zip(idx.tolist(), fixed.to_pylist()):
        vals[i] = v
    return t.set_column(t.column_names.index("content_sha"),
                        "content_sha", pa.array(vals, type=pa.string()))


def _attach_contents(t: pa.Table, contents: pa.Table | None,
                     content_col: str) -> pa.Table:
    """Writer-side completion of the payload-pruned exchange: scatter
    the prefetched (locator → content) rows into ``t``'s nulled-out
    content column, keyed on (__src_file, __src_row); locator columns
    are dropped so on-disk snapshots never carry them. No-op for
    tables without locators (inline path)."""
    from etlray.exchange import SRC_FILE_COL, SRC_ROW_COL

    if SRC_FILE_COL not in t.column_names:
        return t
    import pyarrow.compute as pc

    drop = [SRC_FILE_COL, SRC_ROW_COL]
    if contents is None or contents.num_rows == 0 or t.num_rows == 0:
        return t.drop_columns(drop)
    sf = pc.fill_null(t[SRC_FILE_COL], -1).combine_chunks() \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    rows = pc.fill_null(t[SRC_ROW_COL], -1).combine_chunks() \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    key_t = _loc_key(sf, np.maximum(rows, 0))
    key_t[sf < 0] = -1
    c_sf = contents[SRC_FILE_COL].to_numpy(zero_copy_only=False)
    c_rows = contents[SRC_ROW_COL].to_numpy(zero_copy_only=False)
    key_c = _loc_key(c_sf, c_rows)
    order = np.argsort(key_c)
    key_c_s = key_c[order]
    pos = np.searchsorted(key_c_s, key_t)
    pos_c = np.minimum(pos, max(len(key_c_s) - 1, 0))
    hit = (key_t >= 0) & (pos < len(key_c_s)) & (key_c_s[pos_c] == key_t)
    if hit.any():
        n = t.num_rows
        cvals = contents[content_col]
        if isinstance(cvals, pa.Array):
            cvals = pa.chunked_array([cvals])
        if content_col in t.column_names:
            orig = t[content_col]
            if isinstance(orig, pa.Array):
                orig = pa.chunked_array([orig])
        else:
            orig = pa.chunked_array([pa.nulls(n, type=cvals.type)])
        cidx = order[pos_c]  # content-row index per t row (valid at hits)
        # Scatter in byte-bounded SLICES: combining either side whole
        # overflows int32 string offsets at blob scale (a merge bucket
        # carries the full base snapshot's content in `orig`, and the
        # fetch tables can exceed 2 GB too). Slice boundaries come from
        # CUMULATIVE ACTUAL bytes (orig value lengths + fetched value
        # lengths at hit rows), not a global mean — a mean-sized slice
        # over skewed data can itself exceed the 2 GB limit. Per slice,
        # the contiguous concat+take is bounded; output stays chunked.
        per_row = _col_row_bytes(orig, n)
        if hit.any():
            flen = _col_row_bytes(cvals, len(cvals))
            per_row = per_row.copy()
            per_row[hit] += flen[cidx[hit]]
        cum = np.cumsum(per_row)
        chunks = []
        s = 0
        while s < n:
            prev = cum[s - 1] if s else 0.0
            e = int(np.searchsorted(cum, prev + _ATTACH_SLICE_BYTES,
                                    side="right"))
            e = min(n, max(e, s + 1))
            o_sl = orig.slice(s, e - s).combine_chunks()
            m = hit[s:e]
            lp = np.flatnonzero(m)
            f_sl = _chunked_take(
                cvals, cidx[s:e][m].astype(np.int64)).combine_chunks()
            f_sl = pc.cast(f_sl, o_sl.type)
            tk = np.arange(e - s, dtype=np.int64)
            tk[lp] = (e - s) + np.arange(len(lp))
            chunks.append(pa.concat_arrays([o_sl, f_sl]).take(pa.array(tk)))
            s = e
        newcol = pa.chunked_array(chunks, type=orig.type)
        if content_col in t.column_names:
            t = t.set_column(t.column_names.index(content_col),
                             content_col, newcol)
        else:
            t = t.append_column(content_col, newcol)
    return t.drop_columns(drop)


def _stat_row(bucket: int, rows: int, max_lsn: int,
              applied: int) -> pa.Table:
    """One writer-stats row; rows=-1 marks an untouched carry-forward
    bucket. Single definition for merge/delta writers."""
    return pa.table({
        "bucket": pa.array([bucket], type=pa.int32()),
        "rows": pa.array([rows], type=pa.int64()),
        "max_lsn": pa.array([max_lsn], type=pa.int64()),
        "applied_events": pa.array([applied], type=pa.int64()),
    })


def _merge_read_bucket(bucket, base_path, delta_paths, keys, lsn_col, op_col,
                       rename, columns, predicate):
    """Read-side fold of one bucket's base file + delta stack (runs as
    a Ray task): conform schemas, LWW-reduce, drop tombstones, then
    apply the scan's predicate/column pruning to the merged result.
    The predicate must run POST-merge: filtering the base first could
    keep a stale row whose newer delta version fails the predicate."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from etlray.cdc.lww import drop_deletes, lww_reduce

    need = None
    if columns is not None:
        need = list(dict.fromkeys(
            list(columns) + list(keys) + [lsn_col, op_col]))

    _pred_cols_cache: dict[tuple, list] = {}

    def predicate_cols(schema: pa.Schema) -> list:
        """Columns the scan predicate references, discovered by binding it
        against empty tables of progressively wider schemas (pyarrow has no
        public field-extraction API for Expression). The pruned read must
        include these even when they are outside the caller's `columns`
        projection, or the post-merge filter raises ArrowInvalid. Falls back
        to every column if the probe can't attribute a failure. Memoized
        per schema-name-set: a delta stack re-reads the probe result for
        every file instead of re-running the exception-driven loop."""
        import re

        import pyarrow.dataset as pads

        key = tuple(schema.names)
        if key in _pred_cols_cache:
            return _pred_cols_cache[key]

        got: list[str] = []
        out = None
        for _ in range(len(schema.names) + 1):
            sub = pa.schema([schema.field(n) for n in got])
            try:
                pads.InMemoryDataset(sub.empty_table()).to_table(
                    filter=predicate)
                out = got
                break
            except Exception as ex:  # noqa: BLE001 — probe, widen, retry
                m = re.search(r"No match for FieldRef\.Name\(([^)]*)\)",
                              str(ex))
                name = m.group(1) if m else None
                if name in schema.names and name not in got:
                    got.append(name)
                else:
                    # correctness-safe but silently un-prunes the read;
                    # log it so a pyarrow upgrade that rewords the
                    # FieldRef error text is visible (pinned by
                    # tests/test_delta_mode.py::test_predicate_probe_*)
                    import logging
                    logging.getLogger(__name__).warning(
                        "predicate-column probe could not attribute %r; "
                        "falling back to reading all %d columns",
                        str(ex)[:120], len(schema.names))
                    out = list(schema.names)
                    break
        if out is None:
            out = list(schema.names)
        _pred_cols_cache[key] = out
        return out

    def read(path: str, filter_bucket: bool) -> pa.Table:
        f = pq.ParquetFile(path)
        avail = set(f.schema_arrow.names)
        cols = None
        if need is not None:
            cols = [c for c in need if c in avail]
            if predicate is not None:
                cols += [c for c in predicate_cols(f.schema_arrow)
                         if c in avail and c not in cols]
            if filter_bucket and BUCKET_COL in avail and BUCKET_COL not in cols:
                cols.append(BUCKET_COL)
        t = f.read(columns=cols)
        if filter_bucket and BUCKET_COL in t.column_names:
            t = t.filter(pc.equal(t[BUCKET_COL], bucket))
        return t

    tables = []
    if base_path:
        shared = (os.path.basename(os.path.dirname(base_path))
                  != f"{BUCKET_COL}={bucket}")
        tables.append(read(base_path, shared))
    for dp in delta_paths:
        tables.append(read(dp, False))
    target = unify_schemas([t.schema for t in tables], rename)
    tables = [t if t.schema.equals(target) else conform_table(t, target, rename)
              for t in tables]
    merged = drop_deletes(lww_reduce(pa.concat_tables(tables),
                                     list(keys), lsn_col), op_col)
    if predicate is not None:
        import pyarrow.dataset as pads

        merged = pads.InMemoryDataset(merged).to_table(filter=predicate)
    if columns is not None:
        merged = merged.select(list(columns))
    return merged


def _diff_bucket(bucket, old_base, old_deltas, new_base, new_deltas,
                 keys, lsn_col, op_col, rename, compare_cols,
                 include_values=False):
    """Diff ONE bucket between two snapshots (runs as a Ray task):
    merge-read each side (base + delta stack, tombstones dropped),
    full-outer join on the keys in-process, classify every key as
    added / deleted / changed over the compare columns (NULL-safe
    equality), and return only the non-identical keys.
    ``include_values=True`` makes it a CHANGE DATA FEED row: each key
    also carries the new values and the ``_old`` values (NULL on the
    absent side)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cols = list(dict.fromkeys(list(keys) + list(compare_cols)))

    def load(base, dps):
        paths = ([base] if base else []) + list(dps)
        if not paths:
            return None
        # prune the read to the compare columns ONLY when every file
        # on this side carries them under their final names — a
        # schema-evolution-era or pre-rename file forces a full read
        # (the merge conform is what materializes the missing/renamed
        # columns, and it runs after the per-file projection)
        prune = True
        for p in paths:
            names = set(pq.read_schema(p).names)
            final = {rename.get(n, n) for n in names}
            if any(c not in final or c not in names for c in cols):
                prune = False
                break
        return _merge_read_bucket(bucket, base, list(dps), keys, lsn_col,
                                  op_col, rename, cols if prune else None,
                                  None)

    old = load(old_base, old_deltas)
    new = load(new_base, new_deltas)
    if old is not None and new is not None:
        # align compare columns across schema eras: absent -> typed
        # nulls, widened -> compare in the new era's type
        for c in compare_cols:
            nt = new[c].type if c in new.column_names else None
            ot = old[c].type if c in old.column_names else None
            target = nt if nt is not None else ot \
                if ot is not None else pa.null()
            if c not in new.column_names:
                new = new.append_column(c, pa.nulls(new.num_rows, target))
            if c not in old.column_names:
                old = old.append_column(c, pa.nulls(old.num_rows, target))
            if not old[c].type.equals(new[c].type):
                old = old.set_column(old.column_names.index(c), c,
                                     old[c].cast(new[c].type))
    change_t = pa.string()

    def only(t: pa.Table, label: str) -> pa.Table:
        out = t.select(list(keys))
        out = out.append_column(
            "change", pa.array(np.full(t.num_rows, label), change_t))
        if include_values:
            # the whole side is absent — its values are typed NULLs
            for c in compare_cols:
                cur = t[c] if c in t.column_names \
                    else pa.nulls(t.num_rows, pa.null())
                ctype = cur.type
                if label == "added":
                    out = out.append_column(c, cur)
                    out = out.append_column(
                        f"{c}_old", pa.nulls(t.num_rows, ctype))
                else:  # deleted: the OLD side holds the values
                    out = out.append_column(
                        c, pa.nulls(t.num_rows, ctype))
                    out = out.append_column(f"{c}_old", cur)
        return out

    if old is None and new is None:
        # unreachable from diff() — identical buckets are skipped before
        # dispatch — but guard it: a schema-less empty block would poison
        # from_arrow_refs with heterogeneous block schemas downstream
        raise ValueError(f"diff bucket {bucket}: both sides absent")
    if old is None or old.num_rows == 0:
        # when the new side is also absent (all rows tombstoned and no
        # new files), emit 0 rows WITH the proper diff schema from the
        # old side so every block in the feed has identical shape
        return only(new, "added") if new is not None \
            else only(old, "deleted")
    if new is None or new.num_rows == 0:
        return only(old, "deleted")
    marker = pa.array(np.ones(new.num_rows, dtype=np.int8))
    new2 = new.append_column("__in_new", marker)
    old2 = old.append_column(
        "__in_old", pa.array(np.ones(old.num_rows, dtype=np.int8)))
    j = new2.join(old2, keys=list(keys), join_type="full outer",
                  right_suffix="_old")
    in_new = pc.is_valid(j["__in_new"])
    in_old = pc.is_valid(j["__in_old"])
    diff_any = pa.array(np.zeros(j.num_rows, dtype=bool))
    for c in compare_cols:
        a, b = j[c], j[f"{c}_old"]
        eq = pc.fill_null(pc.equal(a, b), False)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        diff_any = pc.or_(diff_any, pc.invert(pc.or_(eq, both_null)))
    added = pc.and_(in_new, pc.invert(in_old))
    deleted = pc.and_(in_old, pc.invert(in_new))
    changed = pc.and_(pc.and_(in_new, in_old), diff_any)
    label = pc.if_else(added, "added",
                       pc.if_else(deleted, "deleted",
                                  pc.if_else(changed, "changed",
                                             pa.scalar(None, change_t))))
    out = j.select(list(keys)).append_column("change", label)
    if include_values:
        for c in compare_cols:
            out = out.append_column(c, j[c])
            out = out.append_column(f"{c}_old", j[f"{c}_old"])
    return out.filter(pc.is_valid(out["change"]))


class CDCEngine:
    def __init__(
        self,
        table_dir: str,
        keys: Sequence[str] = ("repo", "path"),
        lsn_col: str = "lsn",
        op_col: str = "op",
        num_buckets: int | None = 32,
        content_col: str = "content",
        rename_map: Mapping[str, str] | None = None,
        rows_per_task: int | None = None,
        wave_tasks: int | None = None,
        max_delta_depth: int | None = 8,
        prune_payload: bool | str = "auto",
    ) -> None:
        self.table_dir = table_dir
        self.keys = list(keys)
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.content_col = content_col
        self.rename_map = dict(rename_map or {})
        # delta-mode epochs auto-checkpoint once a bucket's delta stack
        # reaches this depth (None = manual checkpoint only): bounds
        # read amplification at max_delta_depth files per bucket while
        # keeping per-epoch write cost ∝ new events
        self.max_delta_depth = max_delta_depth
        # exchange tuning overrides (None = auto-sized from the cluster);
        # also lets tests force the multi-wave pipeline on tiny inputs
        self.rows_per_task = rows_per_task
        self.wave_tasks = wave_tasks
        # payload-pruned exchange (SURVEY §7.3): True ships only
        # (keys, lsn, op, content_sha, 12 B locator) through the
        # shuffle and late-materializes winners' contents at the
        # bucket writer; "auto" (default) engages per epoch when the
        # source files' footer stats show mean content width above
        # PRUNE_PAYLOAD_AUTO_BYTES. Only file-path sources can prune
        # (a Dataset has no stable row locator to re-read from).
        if prune_payload not in (True, False, "auto"):
            raise ValueError("prune_payload must be True, False or 'auto'")
        self.prune_payload = prune_payload
        self.manifest = Manifest(table_dir)
        # bucket count is part of the table's on-disk identity: the
        # per-bucket watermarks are meaningless under a different
        # hash(key)->bucket mapping, so resuming an existing table with
        # a mismatched count would silently skip or re-apply events.
        # The committed count wins; pass num_buckets=None to adopt it.
        committed_nb, exact, dense = self._committed_num_buckets()
        if committed_nb is not None and exact:
            if num_buckets is not None and num_buckets != committed_nb:
                raise ValueError(
                    f"table at {table_dir} was committed with "
                    f"num_buckets={committed_nb}; resuming with "
                    f"{num_buckets} would corrupt watermark semantics. "
                    "Pass num_buckets=None to adopt the committed count, "
                    "or run rebalance() to change it.")
            self.num_buckets = committed_nb
        elif committed_nb is not None:
            # legacy table (no num_buckets metric): the derived count is
            # only a LOWER bound — files/watermarks record touched
            # buckets, so a sparse table under-reports. Accept a caller
            # count that covers the bound (the caller knows the true
            # count; rejecting it forced exactly the wrong adoption),
            # adopt the bound as best effort otherwise.
            if num_buckets is not None:
                if num_buckets < committed_nb:
                    raise ValueError(
                        f"table at {table_dir} references bucket ids up "
                        f"to {committed_nb - 1}; num_buckets="
                        f"{num_buckets} cannot be its committed count")
                if num_buckets > committed_nb and dense:
                    # every bucket 0..bound-1 is referenced — for a
                    # dense legacy table the bound usually IS the true
                    # count, and a larger count changes hash(key)->
                    # bucket, silently corrupting watermark dedup.
                    # Still legal (upper buckets may simply be
                    # untouched), so warn loudly rather than reject.
                    import logging
                    logging.getLogger(__name__).warning(
                        "table at %s densely references every bucket "
                        "0..%d — its committed count is most likely %d, "
                        "but num_buckets=%d was requested; if %d is not "
                        "the count the table was WRITTEN with, watermark "
                        "dedup will silently skip or re-apply events",
                        table_dir, committed_nb - 1, committed_nb,
                        num_buckets, num_buckets)
                self.num_buckets = num_buckets
            else:
                import logging
                logging.getLogger(__name__).warning(
                    "table at %s predates the num_buckets metric; "
                    "adopting derived lower bound %d — pass the true "
                    "count explicitly if the table is sparse",
                    table_dir, committed_nb)
                self.num_buckets = committed_nb
        else:
            self.num_buckets = 32 if num_buckets is None else num_buckets

    def _committed_num_buckets(self) -> tuple[int | None, bool, bool]:
        """(count, exact, dense): exact=True when the commit metric
        recorded it; otherwise the count is max(referenced bucket
        id)+1 — a LOWER bound only, since files/watermarks hold touched
        buckets (len(files) under-reported sparse legacy tables and
        made the init guard reject the CORRECT caller count). dense=
        True when every bucket 0..count-1 is referenced — the bound is
        then most likely the true count, so init warns if a caller
        passes a larger one."""
        cur = self.manifest.current_epoch()
        if cur is None:
            return None, False, False
        nb = (cur.get("metrics") or {}).get("num_buckets")
        if nb is not None:
            return int(nb), True, True
        ids = {int(b) for b in (cur.get("files") or {})}
        ids |= {int(b) for b in (cur.get("watermarks") or {})}
        if not ids:
            return None, False, False
        bound = max(ids) + 1
        return bound, False, len(ids) == bound

    # ------------------------------------------------------------------
    def read_snapshot(self, epoch_id=None, with_internal_cols: bool = False,
                      columns: Sequence[str] | None = None, predicate=None):
        """Current (or time-travelled) table as a Dataset — the read
        side of the reference's DeltaExtractor surface
        (/root/reference/src/extract/delta.rs:37-148). ``columns`` /
        ``predicate`` push into the parquet scan.

        A file that holds exactly its one assigned bucket (the layout
        the per-bucket writers produce, ``bucket_id=<b>/part-0.parquet``)
        needs no filter — ALL such files go through ONE ``read_parquet``
        call (a union of per-file Datasets costs ~0.5 s of executor
        setup PER FILE, pathological at hundreds of buckets). Only
        shared compaction group files need a per-file bucket filter:
        a bucket a LATER epoch rewrote out of the group must not
        surface stale rows."""
        import pyarrow.dataset as pads
        import ray
        import ray.data

        files = self.manifest.snapshot_files(epoch_id)
        if files is None:
            return None
        deltas = self.manifest.snapshot_deltas(epoch_id)
        if not files and not deltas:
            return ray.data.from_arrow(pa.table({}))
        by_path: dict[str, list[int]] = {}
        for b, p in sorted(files.items()):
            if b in deltas:
                continue  # merge-on-read path below
            by_path.setdefault(p, []).append(b)
        kw: dict = {}
        if columns:
            kw["columns"] = list(columns)
        plain: list[str] = []
        parts = []
        for path in sorted(by_path):
            bs = by_path[path]
            holds_one = (os.path.basename(os.path.dirname(path))
                         == f"bucket_id={bs[0]}")
            if holds_one and len(bs) == 1:
                plain.append(path)
            else:
                expr = pads.field(BUCKET_COL).isin(bs)
                if predicate is not None:
                    expr = expr & predicate
                parts.append(ray.data.read_parquet(path, filter=expr, **kw))
        if plain:
            parts.insert(0, ray.data.read_parquet(
                plain, filter=predicate, **kw) if predicate is not None
                else ray.data.read_parquet(plain, **kw))
        if deltas:
            # MERGE-ON-READ: one task per delta-carrying bucket reads
            # base + delta stack, LWW-reduces, drops tombstones. Cost ∝
            # that bucket's data; buckets without deltas keep the plain
            # zero-copy scan above.
            merge_read = ray.remote(_merge_read_bucket)
            refs = [merge_read.remote(
                b, files.get(b), deltas[b], self.keys, self.lsn_col,
                self.op_col, self.rename_map,
                list(columns) if columns else None, predicate)
                for b in sorted(deltas)]
            parts.append(ray.data.from_arrow_refs(refs))
        ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
        if with_internal_cols:
            return ds

        def strip(t: pa.Table) -> pa.Table:
            drop = [c for c in (APPLIED_COL, BUCKET_COL)
                    if c in t.column_names]
            return t.drop_columns(drop) if drop else t

        return ds.map_batches(strip, batch_format="pyarrow",
                              zero_copy_batch=True)

    # ------------------------------------------------------------------
    def diff(self, from_epoch, to_epoch=None,
             compare_cols: Sequence[str] | None = None,
             include_values: bool = False) -> dict:
        """Snapshot diff between two committed epochs: which keys were
        added, deleted or changed going from ``from_epoch`` to
        ``to_epoch`` (default: current). Returns ``{"dataset": Dataset
        of (keys…, change), "buckets": n, "buckets_skipped": s,
        "buckets_compared": c}``. ``include_values=True`` upgrades the
        diff to a CHANGE DATA FEED: each row also carries the compare
        columns' new values and their ``_old`` counterparts (NULL on
        the absent side) — the input an incremental downstream
        consumer (materialized aggregate, search index, cache
        invalidation) needs to apply additions AND retractions.

        Scale shape: both snapshots share the hash(key)→bucket layout,
        so the diff runs PER BUCKET with zero shuffle — and a bucket
        whose base file AND delta stack are identical between the two
        epochs (the carry-forward case) is skipped without reading a
        byte, so cost ∝ touched buckets, exactly like the apply path.
        ``compare_cols`` defaults to every data column except the
        payload when a ``content_sha`` column is present (the sha IS
        the payload's identity — comparing both would read the blobs
        for nothing).

        A rebalance between the two epochs changes the key→bucket
        mapping and is rejected — diff within one bucketing era, or
        re-bootstrap."""
        import pyarrow.parquet as pq
        import ray
        import ray.data

        files_a = self.manifest.snapshot_files(from_epoch)
        files_b = self.manifest.snapshot_files(to_epoch)
        if files_a is None or files_b is None:
            missing = from_epoch if files_a is None else to_epoch
            raise ValueError(f"epoch {missing!r} is not committed")
        deltas_a = self.manifest.snapshot_deltas(from_epoch)
        deltas_b = self.manifest.snapshot_deltas(to_epoch)

        def era(epoch):
            rec = (self.manifest.current_epoch() if epoch is None
                   else self.manifest._read_record(epoch))
            return ((rec or {}).get("metrics") or {}).get("num_buckets")

        nb_a, nb_b = era(from_epoch), era(to_epoch)
        if nb_a is not None and nb_b is not None and nb_a != nb_b:
            raise ValueError(
                f"snapshots use different bucket counts ({nb_a} vs "
                f"{nb_b} — a rebalance happened between them); diff is "
                "only defined within one bucketing era")

        if compare_cols is None:
            probe = next(iter(sorted(files_b.values())), None) \
                or next(iter(sorted(files_a.values())), None)
            names = list(pq.read_schema(probe).names) if probe else []
            drop = {*self.keys, self.lsn_col, self.op_col,
                    BUCKET_COL, APPLIED_COL}
            if "content_sha" in names:
                drop.add(self.content_col)
            compare_cols = [n for n in names if n not in drop]

        buckets = sorted(set(files_a) | set(files_b)
                         | set(deltas_a) | set(deltas_b))
        task = ray.remote(_diff_bucket)
        refs, skipped = [], 0
        for b in buckets:
            fa, fb = files_a.get(b), files_b.get(b)
            da, db = deltas_a.get(b, []), deltas_b.get(b, [])
            if fa == fb and da == db:
                skipped += 1  # carry-forward: not a byte read
                continue
            refs.append(task.remote(
                b, fa, da, fb, db, self.keys, self.lsn_col,
                self.op_col, self.rename_map, list(compare_cols),
                include_values))
        if refs:
            ds = ray.data.from_arrow_refs(refs)
        else:
            # all-carry-forward: emit an empty dataset whose schema
            # matches a non-empty feed exactly (keys + change + the
            # include_values columns and their _old twins) so consumers
            # written against the documented feed shape work unchanged
            probe = next(iter(sorted(files_b.values())), None) \
                or next(iter(sorted(files_a.values())), None)
            psch = pq.read_schema(probe) if probe else None
            fields = ([psch.field(k) for k in self.keys] if psch
                      is not None else []) \
                + [pa.field("change", pa.string())]
            if include_values:
                for c in compare_cols:
                    ct = (psch.field(c).type if psch is not None
                          and c in psch.names else pa.null())
                    fields += [pa.field(c, ct),
                               pa.field(f"{c}_old", ct)]
            ds = ray.data.from_arrow(pa.schema(fields).empty_table())
        return {"dataset": ds, "buckets": len(buckets),
                "buckets_skipped": skipped,
                "buckets_compared": len(refs)}

    # ------------------------------------------------------------------
    def vacuum(self, keep_last: int = 2) -> dict:
        """GC superseded snapshot files: delete every ``snap-*`` parquet
        not referenced by the most recent ``keep_last`` epochs, and drop
        those epochs' records. Carry-forward is respected — a bucket
        file written 100 epochs ago but still referenced by the current
        manifest is kept.

        Time travel older than ``keep_last`` is gone after a vacuum (the
        point of GC). Exactly-once for a RE-DELIVERED vacuumed epoch id
        degrades gracefully: the id can recommit, but every one of its
        events is ≤ the per-bucket watermarks, so the replay is a
        zero-touched-buckets no-op and the table state is unchanged.

        Without this, a 10^10-event log's table dir grows without bound
        (every epoch leaves its snap dir on disk forever)."""
        import glob as _glob

        recs = sorted(self.manifest.load()["epochs"], key=lambda e: e.get("seq", 0))
        if not recs:
            return {"deleted_files": 0, "freed_bytes": 0, "kept_epochs": []}
        keep_last = max(keep_last, 1)
        keep = recs[-keep_last:]
        referenced = set()
        for e in keep:
            referenced.update(
                os.path.normpath(os.path.join(self.table_dir, v))
                for v in e["files"].values())
            for paths in (e.get("deltas") or {}).values():
                referenced.update(
                    os.path.normpath(os.path.join(self.table_dir, v))
                    for v in paths)
        deleted = freed = 0
        for snap in _glob.glob(os.path.join(self.table_dir, "snap-*")):
            for root, _dirs, fnames in os.walk(snap, topdown=False):
                for fn in fnames:
                    p = os.path.normpath(os.path.join(root, fn))
                    if fn.endswith(".parquet") and p not in referenced:
                        freed += os.path.getsize(p)
                        os.remove(p)
                        deleted += 1
                try:  # prune now-empty dirs bottom-up
                    os.rmdir(root)
                except OSError:
                    pass
        for e in recs[:-keep_last]:
            rp = self.manifest._record_path(e["id"])
            if os.path.exists(rp):
                os.remove(rp)
        return {"deleted_files": deleted, "freed_bytes": freed,
                "kept_epochs": [e["id"] for e in keep]}

    def compact(self, epoch_id=None, group_size: int = 4) -> dict:
        """Small-file compaction: commit an epoch whose only change is
        that every run of ``group_size`` consecutive buckets shares ONE
        merged parquet file (watermarks and row contents untouched).
        Useful when ``num_buckets`` was sized for write parallelism but
        the per-bucket files ended up tiny — readers then open
        ``num_buckets / group_size`` files instead. ``merge_write``
        filters its previous file by ``bucket_id``, so later epochs
        rewrite single buckets out of a shared file correctly."""
        import uuid

        import ray

        files = self.manifest.snapshot_files()
        if not files:
            return {"epoch": None, "committed": False, "reason": "empty table"}
        epoch_id = epoch_id if epoch_id is not None else f"compact-{uuid.uuid4().hex[:8]}"
        if self.manifest.committed(epoch_id):
            return {"epoch": epoch_id, "committed": False, "reason": "already committed"}
        snap_dir = os.path.join(self.table_dir, f"snap-{epoch_id}")
        os.makedirs(snap_dir, exist_ok=True)

        @ray.remote
        def merge_group(out_path: str, owned: list[list[int]], *paths: str) -> int:
            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq

            # filter EACH source to the buckets it is assigned within
            # this group: an old group file may still physically hold
            # rows of a bucket that a later epoch rewrote into another
            # source — filtering the concatenation by group membership
            # alone would let those stale rows duplicate the fresh ones
            tables = []
            for p, bs in zip(paths, owned):
                t = _pq.read_table(p)
                if BUCKET_COL in t.column_names:
                    t = t.filter(_pc.is_in(
                        t[BUCKET_COL],
                        value_set=pa.array(bs, type=t[BUCKET_COL].type)))
                tables.append(t)
            merged = pa.concat_tables(tables, promote_options="permissive")
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            _pq.write_table(merged, out_path)
            return merged.num_rows

        buckets = sorted(files)
        new_files: dict[int, str] = {}
        refs = []
        for gi in range(0, len(buckets), group_size):
            group = buckets[gi:gi + group_size]
            rel = os.path.join(f"snap-{epoch_id}", f"group-{gi // group_size}",
                               "part-0.parquet")
            # one file may back several buckets already — dedupe inputs,
            # remembering which of the group's buckets each source owns
            src_buckets: dict[str, list[int]] = {}
            for b in group:
                src_buckets.setdefault(files[b], []).append(b)
            srcs = sorted(src_buckets)
            refs.append(merge_group.remote(
                os.path.join(self.table_dir, rel),
                [src_buckets[s] for s in srcs], *srcs))
            for b in group:
                new_files[b] = rel
        rows = sum(ray.get(refs))
        ok = self.manifest.commit_epoch(
            epoch_id, new_files, self.manifest.watermarks(),
            self.manifest.lineage(),
            metrics={"rows": rows, "compaction": True,
                     "num_buckets": self.num_buckets,
                     "files": len(set(new_files.values()))},
            # compaction merges BASE files only — outstanding delta
            # stacks carry through unchanged (checkpoint folds them)
            deltas=self.manifest.snapshot_deltas(absolute=False))
        return {"epoch": epoch_id, "committed": ok, "rows": rows,
                "files": len(set(new_files.values()))}

    def checkpoint(self, epoch_id=None) -> dict:
        """Fold every outstanding delta stack into its bucket's base
        file (one parallel task per delta-carrying bucket) and commit
        the result as an epoch. Reads after a checkpoint pay zero
        merge-on-read cost; the write cost is the bucket rewrite that
        delta-mode epochs deferred — amortized over the stack's depth,
        total write volume is O(new data + table/`max_delta_depth` per
        epoch) instead of O(table) per epoch."""
        import uuid

        import ray

        deltas_abs = self.manifest.snapshot_deltas()
        if not deltas_abs:
            return {"epoch": None, "committed": False, "reason": "no deltas"}
        epoch_id = epoch_id if epoch_id is not None \
            else f"ckpt-{uuid.uuid4().hex[:8]}"
        if self.manifest.committed(epoch_id):
            return {"epoch": epoch_id, "committed": False,
                    "reason": "already committed"}
        snap_dir = os.path.join(self.table_dir, f"snap-{epoch_id}")
        files = self.manifest.snapshot_files() or {}
        keys, lsn_col, op_col = self.keys, self.lsn_col, self.op_col
        rename = self.rename_map

        @ray.remote
        def fold(bucket: int, base: str | None, dps: list[str],
                 out_path: str) -> tuple[int, int]:
            import pyarrow.parquet as _pq

            t = _merge_read_bucket(bucket, base, dps, keys, lsn_col,
                                   op_col, rename, None, None)
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            _pq.write_table(t, out_path)
            return bucket, t.num_rows

        refs = []
        new_files: dict[int, str] = {}
        for b in sorted(deltas_abs):
            rel = os.path.join(f"snap-{epoch_id}", f"{BUCKET_COL}={b}",
                               "part-0.parquet")
            new_files[b] = rel
            refs.append(fold.remote(b, files.get(b), deltas_abs[b],
                                    os.path.join(self.table_dir, rel)))
        folded = dict(ray.get(refs))

        out_files = {b: os.path.relpath(p, self.table_dir)
                     for b, p in files.items()}
        out_files.update(new_files)
        watermarks = self.manifest.watermarks()
        lineage = self.manifest.lineage()
        for b, rows in folded.items():
            ln = dict(lineage.get(b) or {})
            ln.pop("delta_rows", None)
            ln.pop("delta_depth", None)
            ln.update({"rows": int(rows),
                       "max_lsn": int(watermarks.get(b, -1))})
            lineage[b] = ln
        total_rows = sum(v.get("rows", 0) for v in lineage.values())
        ok = self.manifest.commit_epoch(
            epoch_id, out_files, watermarks, lineage,
            metrics={"rows": total_rows, "checkpoint": True,
                     "folded_buckets": len(folded),
                     "num_buckets": self.num_buckets})
        return {"epoch": epoch_id, "committed": ok, "rows": total_rows,
                "folded_buckets": len(folded)}

    # ------------------------------------------------------------------
    def rebalance(self, new_num_buckets: int, epoch_id=None) -> dict:
        """EXPLICIT partition rebalancing (the north rule's skew lever):
        commit an epoch that rewrites the table under a different
        bucket count — scale buckets up when per-bucket writers become
        stragglers (hot buckets), down when thousands of tiny buckets
        dominate in task overhead.

        Watermarks under the new hash(key)→bucket mapping: the only
        per-new-bucket statement provable without tracking every key is
        ``min`` over the old per-bucket watermarks — events between
        that floor and a key's true old watermark may re-apply, which
        LWW makes idempotent (a re-applied event's LSN ≤ the stored
        row's LSN never wins; re-applied deletes re-tombstone a row
        that is already gone)."""
        import uuid

        import ray

        from etlray.cdc.apply import with_bucket
        from etlray.exchange import hash_exchange

        files = self.manifest.snapshot_files()
        if not files:
            return {"epoch": None, "committed": False, "reason": "empty table"}
        if new_num_buckets == self.num_buckets:
            return {"epoch": None, "committed": False,
                    "reason": "already at that bucket count"}
        epoch_id = epoch_id if epoch_id is not None \
            else f"rebalance-{uuid.uuid4().hex[:8]}"
        if self.manifest.committed(epoch_id):
            return {"epoch": epoch_id, "committed": False,
                    "reason": "already committed"}
        snap_dir = os.path.join(self.table_dir, f"snap-{epoch_id}")
        os.makedirs(snap_dir, exist_ok=True)
        keys, nb_new = self.keys, int(new_num_buckets)
        table_dir = self.table_dir

        def pre_fn(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            return with_bucket(t, keys, nb_new)

        def write_bucket(t: pa.Table, bucket: int) -> pa.Table:
            import pyarrow.parquet as _pq

            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            t = t.append_column(
                BUCKET_COL, pa.array([bucket] * t.num_rows, type=pa.int32()))
            d = os.path.join(snap_dir, f"{BUCKET_COL}={bucket}")
            os.makedirs(d, exist_ok=True)
            _pq.write_table(t, os.path.join(d, "part-0.parquet"))
            return pa.table({"bucket": pa.array([bucket], type=pa.int32()),
                             "rows": pa.array([t.num_rows], type=pa.int64())})

        ds = self.read_snapshot(with_internal_cols=True)
        stat_refs = hash_exchange(ds, keys, nb_new, write_bucket,
                                  bucket_col=BUCKET_COL, pre_fn=pre_fn,
                                  pass_bucket_id=True, as_refs=True,
                                  wave_tasks=self.wave_tasks)
        stats = [r for t in ray.get(stat_refs) for r in t.to_pylist()]
        old_wms = self.manifest.watermarks()
        wm_floor = min(old_wms.values()) if old_wms else -1
        new_files = {
            int(s["bucket"]): os.path.relpath(
                os.path.join(snap_dir, f"{BUCKET_COL}={int(s['bucket'])}",
                             "part-0.parquet"), table_dir)
            for s in stats}
        watermarks = {b: wm_floor for b in new_files}
        lineage = {b: {"rows": int(s["rows"]), "max_lsn": wm_floor,
                       "rebalanced_from": self.num_buckets}
                   for b, s in zip(new_files, stats)}
        rows = sum(int(s["rows"]) for s in stats)
        old_nb = self.num_buckets
        ok = self.manifest.commit_epoch(
            epoch_id, new_files, watermarks, lineage,
            metrics={"rows": rows, "rebalance": True,
                     "num_buckets": nb_new, "from_num_buckets": old_nb})
        if ok:
            self.num_buckets = nb_new
        return {"epoch": epoch_id, "committed": ok, "rows": rows,
                "num_buckets": nb_new, "from_num_buckets": old_nb}

    # ------------------------------------------------------------------
    def follow(
        self,
        log_dir: str,
        pattern: str = "*.parquet",
        poll_interval: float = 0.5,
        idle_timeout: float | None = None,
        max_files: int | None = None,
        rename_map: Mapping[str, str] | None = None,
        max_files_per_epoch: int = 1,
        mode: str = "merge",
        vacuum_every: int | None = None,
    ) -> dict:
        """Tail-follow a GROWING directory of change-log parquet files —
        the closest sandbox analogue of a binlog/WAL tail (the reference's
        drain loop, /root/reference/src/pipeline/mod.rs:215-269, reads a
        fixed source once; this keeps consuming as a producer appends).

        Each discovered file becomes ONE epoch whose id is the file's
        basename, so exactly-once falls out of the commit manifest: a
        crashed/restarted follower re-lists the directory and skips every
        committed file, and duplicated delivery of a file is a no-op.
        Files are applied in sorted-name order (producers should name
        files monotonically, e.g. zero-padded offsets). A file that is
        still being written is skipped until its parquet footer reads
        cleanly — producers must write-temp-then-rename for atomicity.

        Returns after ``idle_timeout`` seconds with no new files (or
        once ``max_files`` log FILES have been applied — under catch-up
        batching several files can share one epoch, so this bounds
        files consumed, not epochs committed); runs forever if neither
        is set.

        ``max_files_per_epoch`` > 1 enables CATCH-UP BATCHING: when the
        follower is behind, up to that many ready files apply as ONE
        epoch — one set of bucket rewrites for the whole backlog instead
        of one full pass per file (per-epoch write amplification is the
        duty-cycle cost of micro-epochs). Exactly-once still holds at
        file granularity: the batch commit records its member files and
        a restarted follower skips them; a crash BEFORE the batch commit
        re-applies those files, which the per-bucket LSN watermarks make
        an event-level no-op.

        ``mode="delta"`` applies each file/batch as a delta epoch (see
        ``apply_log``) — the steady-state tail then writes ∝ new events
        per file instead of rewriting every touched bucket, with
        ``max_delta_depth`` auto-checkpoints bounding read
        amplification.

        ``vacuum_every=N`` runs ``vacuum(keep_last=2)`` after every N
        committed epochs — a long-running tail otherwise accumulates
        O(epochs × table) of superseded snapshot files (retention is a
        duty-cycle cost, so it belongs inside the loop, not in a
        separate janitor).
        """
        import glob as _glob
        import time as _time

        import pyarrow.parquet as pq

        # file ids already covered by prior commits — either directly
        # (epoch id == file name) or as members of a batched epoch
        done: set[str] = set()
        for e in self.manifest.load()["epochs"]:
            done.add(str(e["id"]))
            done.update((e.get("metrics") or {}).get("member_files", []))

        applied: list[dict] = []
        n_files_applied = 0
        idle = 0.0
        while True:
            ready = []
            for f in sorted(_glob.glob(os.path.join(log_dir, pattern))):
                eid = os.path.basename(f)
                if eid in done:
                    continue
                try:
                    pq.ParquetFile(f)  # footer readable → fully written
                except Exception:
                    continue  # in-flight file; retry next poll
                ready.append((eid, f))
            progressed = False
            while ready:
                group, ready = (ready[:max(1, max_files_per_epoch)],
                                ready[max(1, max_files_per_epoch):])
                if len(group) == 1:
                    eid, paths = group[0][0], [group[0][1]]
                    extra = None
                else:
                    eid = f"batch:{group[0][0]}..{group[-1][0]}"
                    paths = [f for _, f in group]
                    extra = {"member_files": [e for e, _ in group]}
                res = self.apply_log(paths, epoch_id=eid,
                                     rename_map=rename_map,
                                     extra_metrics=extra, mode=mode)
                if res.get("committed"):
                    # wall-clock commit stamp: lets a harness compute
                    # per-file tail latency (commit time − producer
                    # write time) without instrumenting the manifest
                    res["committed_wall"] = _time.time()
                    res["files"] = len(group)
                    res["member_files"] = [e for e, _ in group]
                    applied.append(res)
                    progressed = True
                    if (vacuum_every is not None
                            and len(applied) % vacuum_every == 0):
                        self.vacuum(keep_last=2)
                done.update(e for e, _ in group)
                n_files_applied += len(group)
                if max_files is not None and n_files_applied >= max_files:
                    return {"epochs": applied, "reason": "max_files"}
            if progressed:
                idle = 0.0
                continue
            if idle_timeout is not None and idle >= idle_timeout:
                return {"epochs": applied, "reason": "idle_timeout"}
            _time.sleep(poll_interval)
            idle += poll_interval

    # ------------------------------------------------------------------
    def _decide_prune(self, kind: str, items, metas=None,
                      rename=None) -> bool:
        """Per-epoch payload-pruning decision. Only file-path sources
        can prune (late materialization re-reads the source parquet by
        row locator); "auto" engages when footer stats show mean
        content width > PRUNE_PAYLOAD_AUTO_BYTES — narrow contents ship
        cheaper inline than a 12 B locator plus a re-read. ``metas``:
        already-read FileMetaData for ``items`` so the decision shares
        the caller's one footer pass instead of re-opening every file."""
        if kind != "files" or self.prune_payload is False:
            return False
        if self.prune_payload is True:
            return True
        reverse = {v: k for k, v in
                   (self.rename_map if rename is None else rename).items()}
        cands = [self.content_col]
        if reverse.get(self.content_col):
            cands.append(reverse[self.content_col])
        return _mean_payload_bytes(metas or items, cands) \
            > PRUNE_PAYLOAD_AUTO_BYTES

    def _normalize_events(self, changes, rename_map: Mapping[str, str] | None):
        """Read every epoch-file/Dataset, conform to the unified schema
        (schema evolution), union into one event Dataset. Blocks whose
        schema already matches pass through zero-copy. Returns
        (source, target, metas): for file sources ``metas`` carries the
        parquet FileMetaData read here, so the schema unify, the prune
        decision, total_rows and the exchange's row-group chunking all
        share ONE driver-side footer pass per epoch (three separate
        opens per file before — pure tail-lag tax in follow mode)."""
        import ray.data

        if isinstance(changes, (str, list, tuple)):
            # FILE-DIRECT path: no Ray Data pipeline at all — the driver
            # reads only footers; split tasks read their own row groups
            # (hash_exchange_files). Schemas come from the footers.
            import pyarrow.parquet as pq

            paths = [changes] if isinstance(changes, str) else list(changes)
            metas = [pq.ParquetFile(p).metadata for p in paths]
            schemas = [m.schema.to_arrow_schema() for m in metas]
            target = unify_schemas(schemas, rename_map)
            return ("files", paths), target, metas
        d = changes
        s = d.schema()
        schemas = [pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])]
        target = unify_schemas(schemas, rename_map)
        # conformance runs map-side-fused inside the exchange's split
        # tasks (pre_fn) — no map/union stages
        return ("datasets", [d]), target, None

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

        return self._apply_and_commit(("datasets", [base_ds]), epoch_id,
                                      prepare_fn=stamp)

    def apply_log(self, changes, epoch_id,
                  rename_map: Mapping[str, str] | None = None,
                  extra_metrics: Mapping | None = None,
                  mode: str = "merge"):
        """Apply a change-log slice (paths or Dataset) as one epoch.

        Exactly-once: re-running a committed epoch id is a no-op;
        events below the per-bucket watermark are filtered (duplicate
        delivery of individual events is also a no-op). Only buckets
        with surviving events are rewritten; the rest carry forward.

        ``mode="merge"`` (default) rewrites each touched bucket's file
        (read cost on the snapshot stays zero). ``mode="delta"`` writes
        ONLY the epoch's net per-key effect per bucket as a DELTA file
        stacked on the bucket's base — cost ∝ new events, NOT touched
        bucket size, which is what a micro-epoch binlog tail needs
        (per-file full-bucket rewrite is the LSM write-amplification
        problem). Reads merge base+deltas on the fly;
        ``checkpoint()`` folds deltas back into base files, and
        ``max_delta_depth`` auto-checkpoints when a bucket's stack
        grows past it. Delete events are retained in delta files as
        tombstones (op='delete') so the read-side merge can drop the
        base row.

        ``extra_metrics`` is merged into the commit record's metrics —
        ``follow`` uses it to record the member files of a batched
        catch-up epoch."""
        if mode not in ("merge", "delta"):
            raise ValueError(f"unknown apply mode {mode!r}")
        if self.manifest.committed(epoch_id):
            return {"epoch": epoch_id, "committed": False, "reason": "already committed"}
        rename = dict(self.rename_map)
        rename.update(rename_map or {})
        source, target, metas = self._normalize_events(changes, rename)
        res = self._apply_and_commit(source, epoch_id,
                                     prepare_fn=conformer(target, rename),
                                     extra_metrics=extra_metrics, mode=mode,
                                     rename_map=rename, metas=metas)
        if (mode == "delta" and res.get("committed")
                and self.max_delta_depth is not None
                and res.get("max_delta_depth", 0) >= self.max_delta_depth):
            res["checkpoint"] = self.checkpoint(f"ckpt-after-{epoch_id}")
        return res

    # ------------------------------------------------------------------
    def _apply_and_commit(self, source, epoch_id, prepare_fn=None,
                          extra_metrics: Mapping | None = None,
                          mode: str = "merge", rename_map=None,
                          metas=None) -> dict:
        """``source`` is ("files", [paths]) — file-direct split tasks,
        zero Ray Data stages — or ("datasets", [Dataset]).
        ``rename_map``: the EFFECTIVE rename for this epoch (engine map
        merged with the caller's per-call override) — the writer's
        schema unify and the pruned fetch's reverse column lookup must
        use the same mapping the conformer used, or a per-call rename
        would resolve the wrong source column."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from etlray.cdc.apply import sha256_column
        from etlray.cdc.lww import drop_deletes, lww_reduce
        from etlray.exchange import (SRC_FILE_COL, SRC_ROW_COL,
                                     hash_exchange)

        keys, lsn_col, op_col = self.keys, self.lsn_col, self.op_col
        content_col, nb = self.content_col, self.num_buckets
        rename = dict(self.rename_map if rename_map is None else rename_map)
        snap_dir = os.path.join(self.table_dir, f"snap-{epoch_id}")
        os.makedirs(snap_dir, exist_ok=True)

        kind, items = source
        # ONE footer pass per epoch: _normalize_events' metas serve the
        # prune decision, total_rows AND the exchange's chunking below
        # (only read here when a caller bypassed _normalize_events)
        if metas is None and kind == "files":
            metas = [pq.ParquetFile(p).metadata for p in items]
        prune = self._decide_prune(kind, items, metas, rename)

        prev_files = self.manifest.snapshot_files() or {}
        prev_lineage = self.manifest.lineage()
        prev_watermarks = self.manifest.watermarks()
        # outstanding delta stacks: merge-mode writers fold a bucket's
        # deltas in (and the commit clears them); delta-mode appends
        prev_deltas_abs = self.manifest.snapshot_deltas()
        prev_deltas_rel = self.manifest.snapshot_deltas(absolute=False)

        wm = np.full(nb, -1, dtype=np.int64)
        for b, v in (prev_watermarks or {}).items():
            wm[int(b)] = v

        def pre_fn(t: pa.Table) -> pa.Table:
            """MAP-SIDE FUSION, run inside each split task: conform →
            stamp bucket → watermark filter → per-block LWW combine →
            sha256 stamp. One object-store round trip per block total.
            Hashing here (on the already-combined NEW events) keeps the
            writer's cost ∝ new data instead of re-walking the whole
            merged bucket every rewrite.

            Payload-pruned mode additionally NULLS OUT the content
            column after the sha stamp (an all-null Arrow column ships
            as ~1 bit/row, and keeping the column preserves schema and
            column order across bucket files): the shuffle then carries
            only (keys, lsn, op, content_sha, 12 B source locator); the
            per-file fetch tasks (_fetch_file_payloads) read winners'
            row groups once and the bucket writer scatters them back
            via _attach_contents."""
            loc = None
            if prune and SRC_FILE_COL in t.column_names:
                # conformer projects to the unified event schema, which
                # doesn't know the locator columns — detach/re-attach
                # around it (row order and count are preserved)
                loc = (t.column(SRC_FILE_COL), t.column(SRC_ROW_COL))
                t = t.drop_columns([SRC_FILE_COL, SRC_ROW_COL])
            if prepare_fn is not None:
                t = prepare_fn(t)
            if loc is not None:
                t = t.append_column(SRC_FILE_COL, loc[0])
                t = t.append_column(SRC_ROW_COL, loc[1])
            if t.num_rows == 0:
                return t.append_column(BUCKET_COL, pa.array([], type=pa.int32()))
            buckets = stable_bucket(t, keys, nb)
            t = t.append_column(BUCKET_COL, pa.array(buckets))
            lsns = t.column(lsn_col).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(lsns > wm[buckets]))
            if t.num_rows == 0:
                return t
            t = lww_reduce(t, keys, lsn_col)
            if content_col in t.column_names:
                ci = t.column_names.index(content_col)
                if prune:
                    # pruned mode never READ the payload (the split's
                    # parquet projection dropped it; the column here is
                    # conform-backfilled nulls) — stamp a null sha
                    # placeholder; the bucket writer's repair pass
                    # hashes the fetched WINNERS only, so total sha
                    # work is ∝ final table, not ∝ events
                    sha = pa.nulls(t.num_rows, type=pa.string())
                else:
                    sha = sha256_column(t.column(content_col))
                if "content_sha" in t.column_names:
                    t = t.set_column(t.column_names.index("content_sha"),
                                     "content_sha", sha)
                else:
                    t = t.append_column("content_sha", sha)
                if prune:
                    t = t.set_column(ci, content_col, pa.nulls(
                        t.num_rows, type=t.column(ci).type))
            return t

        def combine(t: pa.Table) -> pa.Table:
            """Associative wave-level combiner (exchange partials): the
            same max-LSN-per-key reduce — each wave's in-flight data
            shrinks to ≤ unique keys per bucket."""
            return lww_reduce(t, keys, lsn_col)

        def merge_write(t: pa.Table, bucket: int, applied: int,
                        contents: pa.Table | None = None) -> pa.Table:
            """Writer task for one bucket: merge previous bucket file +
            new events (shas already stamped map-side), reduce, write.
            ``contents`` (payload-pruned mode): prefetched winning-row
            payloads to scatter back before the merge."""
            if applied == 0:  # untouched bucket → carry forward (no IO)
                return _stat_row(bucket, -1, -1, 0)
            t = _attach_contents(t, contents, content_col)
            tables = [t]
            if bucket in prev_files:
                prev = pq.read_table(prev_files[bucket])
                if BUCKET_COL in prev.column_names:
                    # after compaction a file may hold several buckets'
                    # rows — take only this bucket's
                    prev = prev.filter(pc.equal(prev[BUCKET_COL], bucket))
                tables.append(prev)
            # outstanding delta stack: fold it in (the rewrite makes
            # the stack obsolete; the commit clears it for this bucket)
            for dp in prev_deltas_abs.get(bucket, []):
                tables.append(pq.read_table(dp))
            schemas = [x.schema for x in tables]
            target = unify_schemas(schemas, rename)
            tables = [x if x.schema.equals(target)
                      else conform_table(x, target, rename) for x in tables]
            merged = pa.concat_tables(tables)
            merged = lww_reduce(merged, keys, lsn_col)
            merged = drop_deletes(merged, op_col)
            merged = _stamp_missing_shas(merged, content_col)
            # normalize the bucket col (events carried it; prev file has it too)
            if BUCKET_COL in merged.column_names:
                merged = merged.drop_columns([BUCKET_COL])
            merged = merged.append_column(
                BUCKET_COL, pa.array([bucket] * merged.num_rows, type=pa.int32()))
            max_lsn = int(pc.max(merged.column(lsn_col)).as_py()) if merged.num_rows else -1
            d = os.path.join(snap_dir, f"{BUCKET_COL}={bucket}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(merged, os.path.join(d, "part-0.parquet"))
            return _stat_row(bucket, merged.num_rows, max_lsn, applied)

        def delta_write(t: pa.Table, bucket: int, applied: int,
                        contents: pa.Table | None = None) -> pa.Table:
            """Delta-mode writer for one bucket: the epoch's net per-key
            effect only — no base read, no base rewrite. Tombstones
            (op='delete') are RETAINED so the read-side merge drops the
            base row; cost ∝ new events in this bucket. ``contents``
            (payload-pruned mode): prefetched payloads scattered back
            before the delta file is written (tombstones keep null
            content — the source row is null too)."""
            if applied == 0:  # untouched bucket
                return _stat_row(bucket, -1, -1, 0)
            t = lww_reduce(t, keys, lsn_col)  # final cross-wave reduce
            t = _attach_contents(t, contents, content_col)
            t = _stamp_missing_shas(t, content_col)
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            t = t.append_column(
                BUCKET_COL, pa.array([bucket] * t.num_rows, type=pa.int32()))
            max_lsn = int(pc.max(t.column(lsn_col)).as_py()) if t.num_rows else -1
            d = os.path.join(snap_dir, f"{BUCKET_COL}={bucket}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(t, os.path.join(d, "delta-0.parquet"))
            return _stat_row(bucket, t.num_rows, max_lsn, applied)

        writer = merge_write if mode == "merge" else delta_write

        import ray as _ray

        if kind == "files":
            from etlray.exchange import hash_exchange_files

            total_rows = sum(m.num_rows for m in metas)
            ncpu = int(_ray.cluster_resources().get("CPU", 8)) \
                if _ray.is_initialized() else 8
            # cap the per-task chunk so one WAVE (ncpu tasks) of split
            # output has a bounded byte footprint regardless of epoch
            # size — the wave pipeline's backpressure depends on it
            rows_per_task = self.rows_per_task or min(
                max(total_rows // (3 * ncpu) + 1, 20_000), 500_000)
            if prune:
                # payload-pruned plan: the exchange reduces WITHOUT
                # writing; per-FILE fetch tasks then read each winning
                # row group exactly once and route contents to bucket
                # writers (one extra task layer, bounded per-row
                # exchange volume regardless of content width)
                def reduce_prep(t: pa.Table, bucket: int,
                                applied: int):
                    if applied and t.num_rows:
                        t = lww_reduce(t, keys, lsn_col)
                    return (t, applied)

                # projection pushdown per file: the split tasks never
                # read (or decompress) the payload column — winners'
                # payloads late-materialize in the fetch tasks, so the
                # map side costs ∝ key/lsn bytes even at blob widths
                reverse = {v: k for k, v in (rename or {}).items()}
                cols_per_file = []
                for md in metas:
                    names = md.schema.to_arrow_schema().names
                    src = content_col if content_col in names \
                        else reverse.get(content_col)
                    cols_per_file.append([n for n in names if n != src])

                red_refs = hash_exchange_files(
                    items, keys, nb, reduce_prep, bucket_col=BUCKET_COL,
                    pass_bucket_id=True, as_refs=True, pre_fn=pre_fn,
                    rows_per_task=rows_per_task, combine_fn=combine,
                    pass_applied=True, wave_tasks=self.wave_tasks,
                    stamp_locator=True, metas=metas,
                    columns=cols_per_file)

                @_ray.remote
                def need_rows(red):
                    """(file, row) locators of this bucket's winning
                    non-delete rows — tombstones never fetch (a CDC
                    delete carries no payload)."""
                    t, applied = red
                    empty = pa.table({
                        SRC_FILE_COL: pa.array([], type=pa.int32()),
                        SRC_ROW_COL: pa.array([], type=pa.int64())})
                    if not applied or t.num_rows == 0 \
                            or SRC_FILE_COL not in t.column_names:
                        return empty
                    if op_col in t.column_names:
                        t = t.filter(pc.not_equal(
                            pc.fill_null(t[op_col], ""), "delete"))
                    t = t.filter(pc.is_valid(t[SRC_FILE_COL]))
                    return t.select([SRC_FILE_COL, SRC_ROW_COL])

                need_refs = [need_rows.remote(r) for r in red_refs]
                fetch = _ray.remote(num_returns=nb)(_fetch_file_payloads)
                parts_by_file = []
                for fi, path in enumerate(items if red_refs else []):
                    out = fetch.remote(path, fi, content_col, rename,
                                       nb, *need_refs)
                    parts_by_file.append([out] if nb == 1 else list(out))

                @_ray.remote
                def write_bucket(red, bucket, *content_parts):
                    t, applied = red
                    cp = [p for p in content_parts if p.num_rows]
                    # permissive: per-file payload types may differ
                    # across a schema-evolving batched epoch (null for
                    # pre-content files, string vs large_string);
                    # _attach_contents casts to the bucket's own
                    # content type afterwards
                    contents = pa.concat_tables(
                        cp, promote_options="permissive") if cp else None
                    return writer(t, bucket, applied, contents)

                # zero split units (e.g. a published log file with no
                # row groups): red_refs is [] — commit the epoch as
                # all-carry-forward instead of indexing into the empty
                # ref list (a poison-pill crash on every follow()
                # retry otherwise; the inline path already behaves
                # this way because its exchange returns no stat refs)
                stat_refs = [
                    write_bucket.remote(
                        red_refs[b], b,
                        *[parts_by_file[f][b]
                          for f in range(len(items))])
                    for b in range(nb)] if red_refs else []
            else:
                stat_refs = hash_exchange_files(
                    items, keys, nb, writer, bucket_col=BUCKET_COL,
                    pass_bucket_id=True, as_refs=True, pre_fn=pre_fn,
                    rows_per_task=rows_per_task, combine_fn=combine,
                    pass_applied=True, wave_tasks=self.wave_tasks,
                    metas=metas)
        else:
            stat_refs = hash_exchange(items, keys, nb, writer,
                                      bucket_col=BUCKET_COL, pass_bucket_id=True,
                                      as_refs=True, pre_fn=pre_fn,
                                      combine_fn=combine, pass_applied=True,
                                      wave_tasks=self.wave_tasks)
        stats = [r for t in _ray.get(stat_refs) for r in t.to_pylist()]

        files: dict[int, str] = {}
        deltas: dict[int, list[str]] = {b: list(v)
                                        for b, v in prev_deltas_rel.items()}
        watermarks: dict[int, int] = dict(prev_watermarks)
        lineage: dict[int, dict] = dict(prev_lineage)
        touched = 0
        delta_rows = 0
        for b, path in prev_files.items():
            files[b] = os.path.relpath(path, self.table_dir)
        for s in stats:
            b = s["bucket"]
            if s["rows"] < 0:  # carry-forward
                continue
            touched += 1
            watermarks[b] = max(int(s["max_lsn"]), watermarks.get(b, -1))
            if mode == "merge":
                files[b] = os.path.relpath(
                    os.path.join(snap_dir, f"{BUCKET_COL}={b}", "part-0.parquet"),
                    self.table_dir)
                deltas.pop(b, None)  # rewrite folded the stack in
                lineage[b] = {"rows": int(s["rows"]),
                              "max_lsn": int(watermarks[b]),
                              "applied_events": int(s["applied_events"])}
            else:
                deltas.setdefault(b, []).append(os.path.relpath(
                    os.path.join(snap_dir, f"{BUCKET_COL}={b}", "delta-0.parquet"),
                    self.table_dir))
                delta_rows += int(s["rows"])
                ln = dict(lineage.get(b) or {})
                # base "rows" carries (unknown until fold); delta stats
                # are exact per this epoch
                ln.update({"max_lsn": int(watermarks[b]),
                           "applied_events": int(s["applied_events"]),
                           "delta_rows": int(s["rows"]),
                           "delta_depth": len(deltas[b])})
                lineage[b] = ln
        total_rows = sum(v.get("rows", 0) for v in lineage.values())
        max_depth = max((len(v) for v in deltas.values()), default=0)
        metrics = {"rows": total_rows, "touched_buckets": touched,
                   "num_buckets": self.num_buckets}
        if mode == "delta":
            metrics.update({"mode": "delta", "delta_rows": delta_rows,
                            "max_delta_depth": max_depth})
        metrics.update(extra_metrics or {})
        ok = self.manifest.commit_epoch(epoch_id, files, watermarks, lineage,
                                        metrics=metrics, deltas=deltas)
        if ok:
            write_lineage_jsonl(os.path.join(self.table_dir, "_lineage.jsonl"),
                                epoch_id,
                                {b: v for b, v in lineage.items()})
        return {"epoch": epoch_id, "committed": ok, "rows": total_rows,
                "buckets": len(files), "touched_buckets": touched,
                "max_delta_depth": max_depth}


# ---------------------------------------------------------------------------
# flagship demo for __ray_entry__.entry()
# ---------------------------------------------------------------------------
def flagship_cdc_demo(sf_dir: str, work_dir: str | None = None,
                      mode: str = "merge", return_diff: bool = False,
                      return_view: bool = False):
    """Generate the deterministic CDC fixture (size keyed to sf_dir),
    bootstrap + replay all three schema-evolution epochs, and return
    the final table Dataset. ``mode="delta"`` replays through the
    delta tier and returns a MERGE-ON-READ snapshot (delta stacks left
    outstanding on purpose, so the read path itself is exercised).
    ``return_diff=True`` returns ``diff("bootstrap")`` — the
    added/deleted/changed key classification — instead of the table."""
    import tempfile

    import ray.data

    from etlray.cdc.fixture import RENAME_MAP, generate_fixture

    scale = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}.get(
        os.path.basename(os.path.normpath(sf_dir)), 2_000)
    work = work_dir or tempfile.mkdtemp(prefix="etlray_cdc_")
    n_keys = max(scale // 5, 100)
    # the fixture is DETERMINISTIC per scale → cache it across calls
    # (bench/driver invoke this demo repeatedly; regenerating costs
    # more than the replay being demonstrated). Atomic rename makes
    # concurrent first-callers safe. The cache key carries a fixture
    # FORMAT version so a generate_fixture change can never serve
    # stale payloads from an earlier run.
    cache = os.path.join(tempfile.gettempdir(),
                         f"etlray_cdc_fx_v2_{scale}")
    if not os.path.isdir(cache):
        tmp = tempfile.mkdtemp(prefix=f"etlray_cdc_fxgen_{scale}_")
        generate_fixture(os.path.join(tmp, "fx"), n_events=scale,
                         n_keys=n_keys, n_base=n_keys // 2)
        try:
            os.rename(tmp, cache)
        except OSError:
            # benign only if another process won the race; any other
            # rename failure would crash later with an unrelated
            # missing-fixture error, so re-raise it here
            if not os.path.isdir(cache):
                raise
    fx_dir = os.path.join(cache, "fx")
    fx = {"base": os.path.join(fx_dir, "base.parquet"),
          "epochs": sorted(
              os.path.join(fx_dir, f) for f in os.listdir(fx_dir)
              if f.startswith("changes_epoch"))}
    eng = CDCEngine(os.path.join(work, "table"), num_buckets=16,
                    rename_map=RENAME_MAP, max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fx["base"]))
    if return_view:
        # incremental materialized view: seed from the bootstrap
        # snapshot, then fold each epoch's change feed — never rescans
        from etlray.cdc.view import snapshot_agg_view, update_agg_view

        view = snapshot_agg_view(eng, "language", ["lsn"],
                                 epoch_id="bootstrap")
        prev = "bootstrap"
        for i, p in enumerate(fx["epochs"]):
            eng.apply_log(p, epoch_id=i, mode=mode)
            view = update_agg_view(eng, view, from_epoch=prev,
                                   to_epoch=i)
            prev = i
        return view
    for i, p in enumerate(fx["epochs"]):
        eng.apply_log(p, epoch_id=i, mode=mode)
    if return_diff:
        return eng.diff("bootstrap")["dataset"]
    return eng.read_snapshot()
