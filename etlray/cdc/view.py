"""Incremental aggregate-view maintenance over the CDC change feed.

A materialized GROUP BY view (count + sums per group) is kept current
across epochs WITHOUT rescanning the table: each epoch's change data
feed (``CDCEngine.diff(..., include_values=True)``) is folded into the
view as additions and retractions — added keys contribute +1/+value,
deleted keys −1/−value, changed keys retract their old values and add
their new ones (including rows that MOVED between groups). Cost per
refresh ∝ changed keys, like the apply path itself; the view is small
by contract (groups ≪ rows), so the final merge is a driver-side Arrow
fold over one partial row per (group, feed block).

No counterpart in the reference (its Delta loader has no CDF); this is
the standard lakehouse incremental-view recipe expressed over the
engine's own diff.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc


def _sum_repr(t: pa.DataType) -> pa.DataType:
    """Accumulator type for a summed column: INTEGER columns keep
    exact int64 sums — retraction-based maintenance (−old + new) is
    only equality-preserving when the arithmetic is exact, and int64
    stays exact at any epoch count. Float columns accumulate in
    float64; their view can drift from a full recompute by summation
    rounding over many epochs (documented) — pre-scale decimals to
    integer cents upstream when bit-equality matters."""
    return pa.int64() if pa.types.is_integer(t) else pa.float64()


def snapshot_agg_view(engine, group_col: str,
                      sum_cols: Sequence[str] = (),
                      epoch_id=None) -> pa.Table:
    """Full (re)computation of the view from a snapshot — the
    bootstrap path and the equality oracle for the incremental path.
    Returns one row per group: ``n_rows`` + ``sum_{c}`` per sum col.
    NULL group keys form a group; NULL values add nothing. Integer
    sum columns accumulate as exact int64 (see :func:`_sum_repr`)."""
    cols = [group_col, *sum_cols]
    ds = engine.read_snapshot(epoch_id, columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        out = t.select([group_col])
        out = out.append_column(
            "n_rows", pa.array(np.ones(t.num_rows, dtype=np.int64)))
        for c in sum_cols:
            want = _sum_repr(t.schema.field(c).type)
            out = out.append_column(
                f"sum_{c}",
                pc.fill_null(pc.cast(t[c], want, safe=False),
                             pa.scalar(0).cast(want)))
        return out.group_by([group_col]).aggregate(
            [("n_rows", "sum")] + [(f"sum_{c}", "sum") for c in sum_cols])

    parts = [b for b in ds.map_batches(
        partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow")]
    merged = pa.concat_tables([pa.table(p) for p in parts],
                              promote_options="permissive")
    merged = merged.group_by([group_col]).aggregate(
        [("n_rows_sum", "sum")]
        + [(f"sum_{c}_sum", "sum") for c in sum_cols])
    names = [group_col, "n_rows"] + [f"sum_{c}" for c in sum_cols]
    return merged.rename_columns(names).sort_by(group_col)


def update_agg_view(engine, view: pa.Table, from_epoch, to_epoch=None,
                    group_col: str | None = None) -> pa.Table:
    """Fold the ``from_epoch → to_epoch`` change feed into ``view``
    (a table produced by :func:`snapshot_agg_view`) and return the
    refreshed view — equal to recomputing from the ``to_epoch``
    snapshot, at the cost of the changed keys only."""
    if group_col is None:
        group_col = view.column_names[0]
    sum_cols = [c[len("sum_"):] for c in view.column_names
                if c.startswith("sum_")]
    feed = engine.diff(from_epoch, to_epoch, include_values=True,
                       compare_cols=[group_col, *sum_cols])["dataset"]

    def deltas(t: pa.Table) -> pa.Table:
        """Per-block (group, ±count, ±sums) partials: the new side
        adds, the old side retracts; an unchanged-group update still
        nets to (−old + new) on the sums."""
        import numpy as np

        ch = t["change"]
        in_new = pc.invert(pc.equal(ch, "deleted"))
        in_old = pc.invert(pc.equal(ch, "added"))
        rows = []
        for side, present, suffix in (("new", in_new, ""),
                                      ("old", in_old, "_old")):
            sign = 1 if side == "new" else -1
            sub = t.filter(present)
            if sub.num_rows == 0:
                continue
            out = sub.select([f"{group_col}{suffix}"]) \
                .rename_columns([group_col])
            out = out.append_column(
                "n_rows", pa.array(np.full(sub.num_rows, sign,
                                           dtype=np.int64)))
            for c in sum_cols:
                # accumulate in the VIEW's own sum type: int64 stays
                # exact under retraction, float64 documentedly drifts
                want = view.schema.field(f"sum_{c}").type
                v = pc.fill_null(
                    pc.cast(sub[f"{c}{suffix}"], want, safe=False),
                    pa.scalar(0).cast(want))
                out = out.append_column(
                    f"sum_{c}",
                    pc.multiply(v, pa.scalar(sign).cast(want)))
            rows.append(out)
        if not rows:
            sch = pa.schema(
                [view.schema.field(group_col),
                 pa.field("n_rows_sum", pa.int64())]
                + [pa.field(f"sum_{c}_sum",
                            view.schema.field(f"sum_{c}").type)
                   for c in sum_cols])
            return sch.empty_table()
        part = pa.concat_tables(rows, promote_options="permissive")
        return part.group_by([group_col]).aggregate(
            [("n_rows", "sum")] + [(f"sum_{c}", "sum")
                                   for c in sum_cols])

    parts = [pa.table(b) for b in feed.map_batches(
        deltas, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow")]
    names = [group_col, "n_rows"] + [f"sum_{c}" for c in sum_cols]
    if parts:
        delta = pa.concat_tables(parts, promote_options="permissive")
        delta = delta.group_by([group_col]).aggregate(
            [("n_rows_sum", "sum")]
            + [(f"sum_{c}_sum", "sum") for c in sum_cols])
        delta = delta.rename_columns(names)
    else:
        delta = view.schema.empty_table()
    merged = pa.concat_tables(
        [view.select(names), delta.select(names)],
        promote_options="permissive")
    merged = merged.group_by([group_col]).aggregate(
        [("n_rows", "sum")] + [(f"sum_{c}", "sum") for c in sum_cols])
    merged = merged.rename_columns(names)
    # groups whose last row left drop out of the view entirely
    return merged.filter(pc.greater(merged["n_rows"], 0)) \
        .sort_by(group_col)
