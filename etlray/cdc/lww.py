"""Last-writer-wins reduction kernels — the heart of the upsert.

Reference analogue: ``DeltaWriteMode::Merge{merge_keys}`` — declared
but unimplemented (falls back to append with a warning,
/root/reference/src/load/delta.rs:255-267) — and the
``ConflictResolution::{Overwrite, Merge}`` config surface
(src/config.rs:319-326). Here it is the real thing: max-LSN-per-key
dedup, fully vectorized (sort + adjacent-compare, no Python loop, no
per-group pandas).

Scale design (the north rule's 10^10-event path):

1. ``lww_reduce`` runs FIRST as a per-batch partial combine inside
   ``map_batches`` — each block contributes at most one row per key,
   which collapses hot-key skew *before* the shuffle (the classic
   combiner; Zipf-hot keys become one row per block instead of
   millions).
2. A hash ``repartition(B, keys=...)`` then co-locates each key in
   exactly one block.
3. ``lww_reduce`` runs again per block — now globally correct.

No stage ever materializes the dataset; every kernel is O(n log n)
Arrow sort + O(n) mask.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc


def first_occurrence_mask(table: pa.Table, keys: Sequence[str]) -> pa.Array:
    """Boolean mask marking the first row of each consecutive key run.

    Assumes ``table`` is sorted so that equal keys are adjacent.
    Vectorized: adjacent-compare each key column against itself shifted
    by one; null-safe (null != null counts as a new run only when the
    other column differs too — we treat null==null as equal via
    fill-with-sentinel on the validity bitmap).
    """
    n = table.num_rows
    if n == 0:
        return pa.array([], type=pa.bool_())
    mask = None
    for k in keys:
        col = table.column(k).combine_chunks()
        cur = col.slice(1)
        prev = col.slice(0, n - 1)
        neq = pc.not_equal(cur, prev)          # null where either is null
        validity_change = pc.xor(pc.is_null(cur), pc.is_null(prev))
        diff = pc.or_(pc.fill_null(neq, False), validity_change)
        mask = diff if mask is None else pc.or_(mask, diff)
    return pa.concat_arrays([pa.array([True]), mask.combine_chunks()
                             if isinstance(mask, pa.ChunkedArray) else mask])


def lww_reduce(
    table: pa.Table,
    keys: Sequence[str],
    lsn_col: str = "lsn",
) -> pa.Table:
    """Keep, per key, the row with the max LSN (ties: later sort
    position wins deterministically via LSN uniqueness — the fixture's
    LSNs are unique, the real binlog's are too)."""
    if table.num_rows == 0:
        return table
    sort_keys = [(k, "ascending") for k in keys] + [(lsn_col, "descending")]
    idx = pc.sort_indices(table, sort_keys=sort_keys)
    table = table.take(idx)
    return table.filter(first_occurrence_mask(table, keys))


def drop_deletes(table: pa.Table, op_col: str = "op") -> pa.Table:
    """After the final reduce, rows whose surviving op is a delete are
    tombstones — remove them (and the op bookkeeping stays). A NULL op
    (e.g. a schema-evolved block whose source lacked the column, null-
    backfilled by conform_table) is NOT a delete: fill_null keeps those
    rows — a bare not_equal yields null and Table.filter silently
    dropped 100% of such blocks."""
    if op_col not in table.column_names or table.num_rows == 0:
        return table
    return table.filter(pc.not_equal(
        pc.fill_null(table.column(op_col), ""), "delete"))
