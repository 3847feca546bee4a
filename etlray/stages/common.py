"""Core stateless transforms — vectorized map_batches re-expressions of
the reference's row-at-a-time transformers
(/root/reference/src/transform/common.rs).

Every transform is a tiny object with ``apply(ds: Dataset) -> Dataset``;
the hot path always runs as ``map_batches(batch_format="pyarrow",
zero_copy_batch=True)`` over Arrow blocks — never a Python loop per row.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from etlray.coerce import KERNELS
from etlray.errors import TransformError


def default_exchange_buckets() -> int:
    """Reduce-stage width for the per-group exchange transforms:
    cluster CPUs with a floor of 8 — a hardcoded 8 capped every
    per-group reduce at 8 tasks regardless of cluster size, and each
    bucket task had to hold 1/8 of all groups' rows. 1× CPUs (not the
    joins' 2×) because these kernels are light per row: at 2× the
    measured sf0.1 cost was pure per-bucket task latency (~2× wall on
    the window/pivot queries) for no extra parallelism."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:  # noqa: BLE001 — sizing only, never correctness
        ncpu = 8
    return max(ncpu, 8)


def meta_size_bytes(ds):
    """Metadata-only size probe. ``Dataset.size_bytes()`` EXECUTES the
    plan when metadata can't infer the size (Ray 2.49 falls through to
    ``self._plan.execute()``), which would materialize an arbitrarily
    large transformed input just to answer a sizing question. Returns
    None whenever the size isn't known without execution."""
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:  # noqa: BLE001 — sizing only, never correctness
        return None


def fan_out_small(ds, target: int | None = None, max_mb: int = 256):
    """Repartition a SMALL input so CPU-heavy per-batch stages
    (shingling, hashing, model scoring) use every core — a single-file
    single-row-group parquet read arrives as ONE block and would pin
    the whole stage to one task. Only engages when the plan's metadata
    size estimate is under ``max_mb`` (the repartition is then ~free
    and driver-local in cost); at scale the reader already yields many
    blocks and this is a no-op. Inputs whose size the plan can't
    estimate are left untouched — never risk materializing big data."""
    target = target or default_exchange_buckets()
    size = meta_size_bytes(ds)
    if size is None or size > (max_mb << 20):
        return ds
    # materialize: bounded by max_mb, and multi-pass consumers (e.g.
    # signature pass + verify payload scan) then reuse the blocks
    # instead of re-executing the read per consumer. Width is capped
    # by the row count — repartitioning 6 rows to 32 blocks would mint
    # 26 empty blocks, which downstream map stages re-emit as
    # ZERO-COLUMN empties.
    m = ds.materialize()
    n = m.count()
    k = min(target, n)
    if k <= 1:
        return m
    return m.repartition(k).materialize()


def key_change_mask(arrays, n: int):
    """Per-row "starts a new key group" mask over sorted key arrays:
    True where ANY key differs from the previous row; a run of nulls is
    ONE group (NaN != NaN would otherwise split it); index 0 is always
    True. One shared definition — this block was copy-pasted five times
    across the per-group exchange kernels and had to be fixed in
    lockstep.

    Accepts numpy arrays OR Arrow (Chunked)Arrays per key. Prefer
    passing the Arrow column: the Arrow path compares without a numpy
    conversion, so (a) int64 keys in a column WITH nulls keep exact
    equality — numpy would convert them to float64 (nulls→NaN) and
    collapse distinct keys past 2^53 — and (b) string keys compare in
    one vectorized kernel instead of numpy's per-element object
    loop."""
    import numpy as np
    import pandas as pd

    change = np.zeros(n, dtype=bool)
    for v in arrays:
        if n > 1:
            if isinstance(v, (pa.Array, pa.ChunkedArray)):
                col = v.combine_chunks() \
                    if isinstance(v, pa.ChunkedArray) else v
                a, b = col.slice(1), col.slice(0, n - 1)
                va, vb = pc.is_valid(a), pc.is_valid(b)
                # both valid: real compare; exactly one null: change;
                # both null: no change (null run = one group)
                diff = pc.or_(pc.fill_null(pc.not_equal(a, b), False),
                              pc.xor(va, vb))
                change[1:] |= diff.to_numpy(zero_copy_only=False)
            else:
                neq = v[1:] != v[:-1]
                both_null = pd.isna(v[1:]) & pd.isna(v[:-1])
                change[1:] |= np.asarray(neq) & ~np.asarray(both_null)
    if n:
        change[0] = True
    return change


def frame_sort(t: "pa.Table", by, ts_col: str, tie: str | None):
    """Shared per-bucket frame prep for every ordered window stage:
    drop the exchange bucket column and sort by (by…, ts, tie). One
    definition so frame-semantics fixes don't have to be applied in
    lockstep across the window transforms."""
    from etlray.cdc.apply import BUCKET_COL

    if BUCKET_COL in t.column_names:
        t = t.drop_columns([BUCKET_COL])
    sort_keys = [(c, "ascending") for c in by] + \
        [(ts_col, "ascending")] + \
        ([(tie, "ascending")] if tie else [])
    return t.take(pc.sort_indices(t, sort_keys=sort_keys))


def frame_bounds(t: "pa.Table", by, n: int, window: int):
    """Per-row frame bounds over a frame_sort-ed table: ``key_start``
    (index of the row's key-run start) and ``lo`` (inclusive lower
    frame edge, ``max(i-window+1, key_start)``)."""
    import numpy as np

    change = key_change_mask(
        [t[c] for c in by], n)
    starts = np.flatnonzero(change)
    key_start = np.repeat(starts, np.diff(np.append(starts, n)))
    lo = np.maximum(np.arange(n) - window + 1, key_start)
    return key_start, lo


class Transform:
    """Base: subclasses set ``batch_size`` (None = block-native) and
    implement ``apply``."""

    batch_size: int | None = None

    def apply(self, ds):  # pragma: no cover - interface
        raise NotImplementedError

    def _mb_kwargs(self) -> dict:
        kw: dict[str, Any] = {"batch_format": "pyarrow", "zero_copy_batch": True}
        if self.batch_size is not None:
            kw["batch_size"] = self.batch_size
        return kw


class FilterTransform(Transform):
    """Keep rows matching a predicate (reference FilterTransform,
    common.rs:10-33 — closure ``Fn(&DataRow)->bool``).

    Accepted predicates, fastest first:
    * ``pyarrow.dataset`` expression (``pc.field("age") >= 18``) —
      evaluated per block, fully vectorized;
    * callable ``pa.Table -> BooleanArray`` (mask function);
    * callable ``dict -> bool`` with ``row_level=True`` — compatibility
      shim for reference-style row closures (slow path, evaluated via
      a python loop inside the batch, still one task per block).
    """

    def __init__(self, predicate: Any, row_level: bool = False) -> None:
        self.predicate = predicate
        self.row_level = row_level

    def apply(self, ds):
        pred = self.predicate
        if isinstance(pred, pc.Expression):
            def filt_expr(t: pa.Table, _e=pred) -> pa.Table:
                return t.filter(_e)
            return ds.map_batches(filt_expr, **self._mb_kwargs())
        if self.row_level:
            def filt_rows(t: pa.Table, _p=pred) -> pa.Table:
                mask = pa.array([bool(_p(r)) for r in t.to_pylist()], type=pa.bool_())
                return t.filter(mask)
            return ds.map_batches(filt_rows, **self._mb_kwargs())

        def filt_mask(t: pa.Table, _p=pred) -> pa.Table:
            return t.filter(_p(t))
        return ds.map_batches(filt_mask, **self._mb_kwargs())


class BatchMapTransform(Transform):
    """Vectorized map: ``fn(pa.Table) -> pa.Table`` (the reference's
    MapTransform, common.rs:37-60, lifted from row to batch)."""

    def __init__(self, fn: Callable[[pa.Table], pa.Table], concurrency: int | None = None,
                 num_cpus: float | None = None) -> None:
        self.fn = fn
        self.concurrency = concurrency
        self.num_cpus = num_cpus

    def apply(self, ds):
        kw = self._mb_kwargs()
        if self.concurrency is not None:
            kw["concurrency"] = self.concurrency
        if self.num_cpus is not None:
            kw["num_cpus"] = self.num_cpus
        return ds.map_batches(self.fn, **kw)


class RowMapTransform(Transform):
    """Compatibility shim for reference-style per-row closures
    ``fn(dict) -> dict`` (MapTransform / AsyncMapTransform,
    common.rs:37-88). Runs the loop inside one task per block — correct
    but slow; prefer BatchMapTransform in hot paths."""

    def __init__(self, fn: Callable[[dict], dict]) -> None:
        self.fn = fn

    def apply(self, ds):
        def mapper(t: pa.Table, _f=self.fn) -> pa.Table:
            return pa.Table.from_pylist([_f(r) for r in t.to_pylist()])
        return ds.map_batches(mapper, **self._mb_kwargs())


class AddColumnTransform(Transform):
    """Add a constant column (reference AddColumnTransform,
    common.rs:92-116)."""

    def __init__(self, name: str, value: Any, dtype: pa.DataType | None = None) -> None:
        self.name = name
        self.value = value
        self.dtype = dtype

    def apply(self, ds):
        name, value, dtype = self.name, self.value, self.dtype

        def add(t: pa.Table) -> pa.Table:
            scalar = pa.scalar(value, type=dtype) if dtype else pa.scalar(value)
            col = pa.nulls(len(t), type=scalar.type) if value is None \
                else pa.array([value] * len(t), type=scalar.type)
            if name in t.column_names:
                t = t.drop_columns([name])
            return t.append_column(name, col)
        return ds.map_batches(add, **self._mb_kwargs())


class ComputedColumnTransform(Transform):
    """Add/replace a column computed from the batch:
    ``fn(pa.Table) -> pa.Array`` (covers the reference examples'
    computed-column closures, e.g. discount calc
    examples/example_01.rs:49-62)."""

    def __init__(self, name: str, fn: Callable[[pa.Table], pa.Array]) -> None:
        self.name = name
        self.fn = fn

    def apply(self, ds):
        name, fn = self.name, self.fn

        def add(t: pa.Table) -> pa.Table:
            col = fn(t)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if name in t.column_names:
                t = t.drop_columns([name])
            return t.append_column(name, col)
        return ds.map_batches(add, **self._mb_kwargs())


class RemoveColumnsTransform(Transform):
    """Drop columns; absent names ignored (reference common.rs:120-148)."""

    def __init__(self, columns: Sequence[str]) -> None:
        self.columns = list(columns)

    @classmethod
    def single(cls, column: str) -> "RemoveColumnsTransform":
        return cls([column])

    def apply(self, ds):
        cols = self.columns

        def drop(t: pa.Table) -> pa.Table:
            present = [c for c in cols if c in t.column_names]
            return t.drop_columns(present) if present else t
        return ds.map_batches(drop, **self._mb_kwargs())


class RenameColumnsTransform(Transform):
    """Rename by map, missing keys pass through (reference
    common.rs:152-182)."""

    def __init__(self, mapping: Mapping[str, str]) -> None:
        self.mapping = dict(mapping)

    @classmethod
    def single(cls, old: str, new: str) -> "RenameColumnsTransform":
        return cls({old: new})

    def apply(self, ds):
        mapping = self.mapping

        def rename(t: pa.Table) -> pa.Table:
            return t.rename_columns([mapping.get(c, c) for c in t.column_names])
        return ds.map_batches(rename, **self._mb_kwargs())


class SelectColumnsTransform(Transform):
    """Projection; silently drops absent columns (reference
    common.rs:428-453)."""

    def __init__(self, columns: Sequence[str]) -> None:
        self.columns = list(columns)

    def apply(self, ds):
        cols = self.columns

        def select(t: pa.Table) -> pa.Table:
            present = [c for c in cols if c in t.column_names]
            return t.select(present)
        return ds.map_batches(select, **self._mb_kwargs())


class ConvertTypesTransform(Transform):
    """Per-column lenient cast, failure → null, never raises (reference
    common.rs:186-254 + the as_* coercions in src/types.rs:206-331).
    Targets: string integer float boolean date datetime timestamp."""

    def __init__(self, conversions: Mapping[str, str]) -> None:
        bad = [t for t in conversions.values() if t.lower() not in KERNELS]
        if bad:
            raise TransformError(f"unknown conversion target(s): {bad}")
        self.conversions = {c: t.lower() for c, t in conversions.items()}

    @classmethod
    def single(cls, column: str, target: str) -> "ConvertTypesTransform":
        return cls({column: target})

    def apply(self, ds):
        conversions = self.conversions

        def convert(t: pa.Table) -> pa.Table:
            for col, target in conversions.items():
                if col not in t.column_names:
                    continue  # reference: missing column untouched
                idx = t.column_names.index(col)
                new = KERNELS[target](t.column(idx))
                if isinstance(new, pa.ChunkedArray):
                    new = new.combine_chunks()
                t = t.set_column(idx, col, new)
            return t
        return ds.map_batches(convert, **self._mb_kwargs())


class CompositeTransform(Transform):
    """Sequential chain (reference CompositeTransformer,
    common.rs:456-481). The Dataset plan is the composition."""

    def __init__(self, transforms: Sequence[Any] | None = None) -> None:
        self.transforms = list(transforms or [])

    def add(self, t: Any) -> "CompositeTransform":
        self.transforms.append(t)
        return self

    def apply(self, ds):
        for t in self.transforms:
            ds = t.apply(ds) if hasattr(t, "apply") else t(ds)
        return ds


class ParallelTransform(Transform):
    """Parity shim for the reference's ParallelTransform
    (common.rs:374-424 — chunk one Vec across tokio tasks). Ray Data
    already parallelizes map_batches across blocks; this just widens
    the block count before the inner transform."""

    def __init__(self, inner: Any, num_workers: int) -> None:
        self.inner = inner
        self.num_workers = num_workers

    def apply(self, ds):
        ds = ds.repartition(self.num_workers)
        return self.inner.apply(ds) if hasattr(self.inner, "apply") else self.inner(ds)


class SortTransform(Transform):
    """Global sort — an all-to-all range shuffle; use per-partition
    sorting inside map_groups where global order isn't required
    (SURVEY.md §2.6; reference exposes only the DataValue total order,
    src/types.rs:88-156)."""

    def __init__(self, key: str | list[str], descending: bool | list[bool] = False) -> None:
        self.key = key
        self.descending = descending

    def apply(self, ds):
        return ds.sort(self.key, descending=self.descending)


class LimitTransform(Transform):
    """First-n (reference extract_batch(n) surface, src/traits.rs:12-16)."""

    def __init__(self, n: int) -> None:
        self.n = n

    def apply(self, ds):
        return ds.limit(self.n)


class DistinctTransform(Transform):
    """Exact distinct rows over the given key columns (keeps one row per
    key; non-key columns dropped). A hash shuffle."""

    def __init__(self, columns: Sequence[str]) -> None:
        self.columns = list(columns)

    def apply(self, ds):
        cols = self.columns

        # local distinct per block first → shrink the shuffle input
        def local(t: pa.Table) -> pa.Table:
            return t.select(cols).group_by(cols).aggregate([])
        pre = ds.map_batches(local, **self._mb_kwargs())

        # per-bucket vectorized distinct (arrow group_by, no per-group task)
        def bucket_distinct(t: pa.Table) -> pa.Table:
            return t.select(cols).group_by(cols).aggregate([])

        from etlray.exchange import hash_exchange

        return hash_exchange(pre, cols, default_exchange_buckets(),
                             bucket_distinct, bucket_col=None)


class TopKPerGroupTransform(Transform):
    """Top-k rows per group under a total order — the windowed
    ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY ...) <= k`` pattern
    (a custom operator Ray Data lacks; the SQL window function is the
    oracle). ``order_by`` is a list of (column, descending) pairs and
    must be a TOTAL order (add a unique tie-break column) for
    deterministic output.

    Scale shape: per-batch PARTIAL top-k first (each block keeps at
    most k rows per group it sees), so the shuffle carries ≤ k·groups
    rows per block regardless of input size; one hash exchange on the
    group keys, then the same vectorized rank-mask per bucket."""

    def __init__(self, group_by: str | Sequence[str],
                 order_by: Sequence[tuple],
                 k: int) -> None:
        self.group_by = [group_by] if isinstance(group_by, str) else list(group_by)
        self.order_by = [(c, bool(d)) for c, d in order_by]
        self.k = int(k)

    def _topk(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        if t.num_rows == 0:
            return t
        gb, k = self.group_by, self.k
        sort_keys = [(c, "ascending") for c in gb] + \
            [(c, "descending" if d else "ascending") for c, d in self.order_by]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        # vectorized per-group rank: positions since the last group
        # change (a row starts a new group when ANY key column differs)
        change = key_change_mask(
            [t[c] for c in gb], t.num_rows)
        starts = np.flatnonzero(change)
        rank = np.arange(t.num_rows) - np.repeat(
            starts, np.diff(np.append(starts, t.num_rows)))
        return t.filter(pa.array(rank < k))

    def apply(self, ds):
        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        pre = ds.map_batches(self._topk, **self._mb_kwargs())

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            return self._topk(t)

        return hash_exchange(pre, self.group_by, default_exchange_buckets(),
                             reduce_bucket,
                             bucket_col=None)


class ExplodeTransform(Transform):
    """Unnest a list / fixed-size-list column: one output row per list
    element, parent columns repeated (SQL ``unnest`` is the oracle).
    Null and empty lists produce no rows (unnest semantics). Fully
    vectorized per batch: ``pc.list_parent_indices`` + ``take`` —
    no Python loop, no shuffle. ``with_ordinality`` appends the
    0-based position within the parent list."""

    def __init__(self, column: str, out_col: str | None = None,
                 with_ordinality: bool = False,
                 ord_col: str = "ordinality") -> None:
        self.column = column
        self.out_col = out_col or column
        self.with_ordinality = with_ordinality
        self.ord_col = ord_col

    def apply(self, ds):
        import numpy as np

        col, out_col = self.column, self.out_col
        with_ord, ord_col = self.with_ordinality, self.ord_col

        def explode(t: pa.Table) -> pa.Table:
            c = t[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            parents = pc.list_parent_indices(c)
            flat = pc.list_flatten(c)
            others = t.drop_columns([col]).take(parents)
            others = others.append_column(out_col, flat)
            if with_ord:
                p = parents.to_numpy(zero_copy_only=False)
                change = np.ones(len(p), dtype=bool)
                change[1:] = p[1:] != p[:-1]
                starts = np.flatnonzero(change)
                ordn = np.arange(len(p)) - np.repeat(
                    starts, np.diff(np.append(starts, len(p))))
                others = others.append_column(
                    ord_col, pa.array(ordn, type=pa.int64()))
            return others

        return ds.map_batches(explode, **self._mb_kwargs())


class SessionizeTransform(Transform):
    """Gap-based session windows per key — the streaming sessionization
    primitive (a custom operator Ray Data lacks; the SQL
    lag()/cumulative-sum window pattern is the oracle). Appends
    ``session_idx`` (1-based per key): a new session starts when the
    time since the key's previous event exceeds ``gap``.

    Scale shape: ONE hash exchange on the key columns (all rows of a
    key in one bucket), then a fully vectorized per-bucket pass — sort
    by (key, ts, tie-break), diff, cumulative sum segmented at key
    boundaries. ``order_tiebreak`` must make the order total for
    deterministic session numbering when timestamps collide."""

    def __init__(self, ts_col: str, by: str | Sequence[str], gap,
                 order_tiebreak: str | None = None,
                 out_col: str = "session_idx") -> None:
        self.ts_col = ts_col
        self.by = [by] if isinstance(by, str) else list(by)
        self.gap = gap
        self.order_tiebreak = order_tiebreak
        self.out_col = out_col

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        ts_col, by, gap, out_col = self.ts_col, self.by, self.gap, self.out_col
        tie = self.order_tiebreak

        def sessionize_bucket(t: pa.Table) -> pa.Table:
            import pandas as pd

            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            if t.num_rows == 0:
                return t.append_column(out_col,
                                       pa.array([], type=pa.int64()))
            sort_keys = [(c, "ascending") for c in by] + \
                [(ts_col, "ascending")] + \
                ([(tie, "ascending")] if tie else [])
            t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
            change = key_change_mask(
                [t[c] for c in by], t.num_rows)
            ts = t[ts_col].to_numpy(zero_copy_only=False)
            new_session = change.copy()
            if t.num_rows > 1:
                new_session[1:] |= (ts[1:] - ts[:-1]) > gap
            # per-key cumulative session count: global cumsum of
            # session starts, re-based at each key boundary
            starts = np.cumsum(new_session)
            key_base = np.maximum.accumulate(np.where(change, starts - 1, 0))
            idx = starts - key_base
            return t.append_column(out_col, pa.array(idx, type=pa.int64()))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             sessionize_bucket, bucket_col=None)


class GroupConcatTransform(Transform):
    """string_agg / group_concat: per group, the values joined by
    ``sep`` in a deterministic (sorted-by-value) order — SQL
    ``string_agg(v, sep ORDER BY v)`` is the oracle. One hash exchange
    on the group keys; per bucket a vectorized sort + run-length
    concat (no per-group Python)."""

    def __init__(self, group_by: str | Sequence[str], value_col: str,
                 sep: str = ",", out_col: str | None = None) -> None:
        self.group_by = [group_by] if isinstance(group_by, str) else list(group_by)
        self.value_col = value_col
        self.sep = sep
        self.out_col = out_col or f"{self.value_col}_concat"

    def apply(self, ds):
        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        gb, vc, sep, out_col = self.group_by, self.value_col, self.sep, self.out_col
        # declared key types captured DRIVER-side: a bucket whose only
        # rows carry NULL keys sees a degenerate local schema (null
        # type), and pandas promotes nullable int64 keys to float64 —
        # pinning to the dataset schema keeps every block's key types
        # identical
        _s = ds.schema()
        ktypes = dict(zip(_s.names, _s.types))

        def reduce_bucket(t: pa.Table) -> pa.Table:
            import pandas as pd

            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            t = t.filter(pc.is_valid(t[vc]))
            if t.num_rows == 0:
                cols = {c: pa.array([], type=t.schema.field(c).type) for c in gb}
                cols[out_col] = pa.array([], type=pa.string())
                return pa.table(cols)
            sort_keys = [(c, "ascending") for c in gb] + [(vc, "ascending")]
            t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
            df = t.to_pandas()
            joined = df.groupby(gb, sort=False, dropna=False)[vc] \
                .agg(lambda s: sep.join(s.astype(str)))
            outdf = joined.reset_index().rename(columns={vc: out_col})
            # pin key types: pandas promotes an int64 key with a NULL
            # group to float64, so the null-carrying bucket would emit
            # `g: double` while every other bucket emits `g: int64` —
            # mismatched block schemas break the downstream union
            cols = {}
            for c in gb:
                arr = pa.array(outdf[c], from_pandas=True)
                want = ktypes[c]
                if not pa.types.is_null(want) and not arr.type.equals(want):
                    arr = pc.cast(arr, want, safe=False)
                cols[c] = arr
            cols[out_col] = pa.array(outdf[out_col], type=pa.string(),
                                     from_pandas=True)
            return pa.table(cols)

        return hash_exchange(ds, gb, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class MovingAverageTransform(Transform):
    """Per-key trailing moving average over the last ``window`` rows in
    (ts, tie-break) order — SQL ``avg(v) OVER (PARTITION BY key ORDER
    BY ts, tie ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` is
    the oracle. One hash exchange on the key; per bucket a vectorized
    sort + cumulative-sum-difference sliding mean segmented at key
    boundaries (no per-key loop)."""

    def __init__(self, ts_col: str, by: str | Sequence[str],
                 value_col: str, window: int,
                 order_tiebreak: str | None = None,
                 out_col: str | None = None) -> None:
        self.ts_col = ts_col
        self.by = [by] if isinstance(by, str) else list(by)
        self.value_col = value_col
        self.window = int(window)
        self.order_tiebreak = order_tiebreak
        self.out_col = out_col or f"{value_col}_mavg"

    def apply(self, ds):
        import numpy as np

        from etlray.exchange import hash_exchange

        ts_col, by, vc, w = self.ts_col, self.by, self.value_col, self.window
        tie, out_col = self.order_tiebreak, self.out_col

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = frame_sort(t, by, ts_col, tie)
            if t.num_rows == 0:
                return t.append_column(out_col, pa.array([], type=pa.float64()))
            n = t.num_rows
            col = t[vc].combine_chunks() \
                if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            v = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
            # null-masked window sums: SQL's avg() ignores NULLs (a
            # NULL must not poison its windows; a window of no valid
            # values emits NULL) but a real NaN VALUE is a value —
            # sum/avg over it is NaN, exactly as the oracle computes.
            # is_null distinguishes the two (to_numpy maps both to NaN).
            null = pc.is_null(col).to_numpy(zero_copy_only=False)
            nan_val = np.isnan(v) & ~null
            valid = ~null
            key_start, lo = frame_bounds(t, by, n, w)
            cum = np.concatenate(
                ([0.0], np.cumsum(np.where(valid & ~nan_val, v, 0.0))))
            cnt = np.concatenate(([0], np.cumsum(valid)))
            ncnt = np.concatenate(([0], np.cumsum(nan_val)))
            hi = np.arange(n) + 1
            wsum = cum[hi] - cum[lo]
            wcnt = cnt[hi] - cnt[lo]
            wnan = ncnt[hi] - ncnt[lo]
            mavg = np.divide(wsum, wcnt, out=np.full(n, np.nan),
                             where=wcnt > 0)
            mavg = np.where(wnan > 0, np.nan, mavg)
            # explicit mask: NULL only for empty windows — a NaN result
            # from NaN data stays NaN (from_pandas would swallow it)
            return t.append_column(
                out_col, pa.array(np.where(wcnt == 0, 0.0, mavg),
                                  type=pa.float64(), mask=wcnt == 0))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class MovingMinMaxTransform(Transform):
    """Per-key trailing moving MIN and MAX over the last ``window``
    rows in (ts, tie-break) order — SQL ``min(v) OVER (PARTITION BY
    key ORDER BY ts, tie ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)`` (and ``max``) is the oracle. min/max SELECT an existing
    value — no arithmetic — so the output is bit-equal to SQL by
    construction (unlike sum/avg, no rounding contract needed):
    integer value columns stay int64 end to end (no 2^53 float
    truncation), floats stay float64.

    Scale shape: the same single hash exchange on the partition key as
    every per-key window stage; per bucket one vectorized sort plus
    ``window-1`` shifted elementwise min/max folds masked at key
    boundaries — O(n·window) in pure numpy, the right trade for the
    small frames (≤ a few dozen rows) bounded window queries use. A
    monotonic-deque pass would be O(n) for very large frames; swap it
    in behind this same signature if a workload needs ROWS BETWEEN
    10000 PRECEDING.

    Null semantics match the oracle exactly: NULLs are ignored and a
    window holding no valid value emits NULL; a real NaN VALUE
    (distinguished from NULL via is_null — to_numpy maps both to NaN)
    follows SQL's float total order where NaN sorts above +inf: max of
    any window containing a NaN is NaN, min is NaN only when the
    window's valid values are ALL NaN."""

    def __init__(self, ts_col: str, by: str | Sequence[str],
                 value_col: str, window: int,
                 order_tiebreak: str | None = None) -> None:
        if window < 1:
            raise ValueError("window must be >= 1")
        self.ts_col = ts_col
        self.by = [by] if isinstance(by, str) else list(by)
        self.value_col = value_col
        self.window = int(window)
        self.order_tiebreak = order_tiebreak

    def apply(self, ds):
        import numpy as np

        from etlray.exchange import hash_exchange

        ts_col, by, vc, w = self.ts_col, self.by, self.value_col, self.window
        tie = self.order_tiebreak
        min_col, max_col = f"{vc}_wmin", f"{vc}_wmax"

        def fold(vals, sentinel, op, n, w, key_start):
            """window-length shifted elementwise folds of ``op`` over
            ``vals``, frame edges masked to ``sentinel``."""
            out = vals.copy()
            idx = np.arange(n)
            for s in range(1, w):
                ok = idx - s >= key_start
                sh = np.full(n, sentinel, dtype=vals.dtype)
                if s < n:
                    sh[s:] = vals[:-s]
                op(out, np.where(ok, sh, sentinel), out=out)
            return out

        def windowed_count(flags, n, w, lo):
            cnt = np.concatenate(([0], np.cumsum(flags)))
            return cnt[np.arange(n) + 1] - cnt[lo]

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = frame_sort(t, by, ts_col, tie)
            is_int = pa.types.is_integer(t.schema.field(vc).type)
            out_type = pa.int64() if is_int else pa.float64()
            if t.num_rows == 0:
                t = t.append_column(min_col, pa.array([], type=out_type))
                return t.append_column(max_col, pa.array([], type=out_type))
            n = t.num_rows
            key_start, lo = frame_bounds(t, by, n, w)
            col = t[vc].combine_chunks() \
                if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            null = pc.is_null(col).to_numpy(zero_copy_only=False)
            valid = ~null
            empty = windowed_count(valid, n, w, lo) == 0
            if is_int:
                # exact path: int64 end to end, iinfo sentinels
                v = pc.fill_null(pc.cast(col, pa.int64()), 0) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                lo_s = np.iinfo(np.int64).min
                hi_s = np.iinfo(np.int64).max
                mins = fold(np.where(valid, v, hi_s), hi_s, np.minimum,
                            n, w, key_start)
                maxs = fold(np.where(valid, v, lo_s), lo_s, np.maximum,
                            n, w, key_start)
                t = t.append_column(
                    min_col, pa.array(np.where(empty, 0, mins), mask=empty))
                return t.append_column(
                    max_col, pa.array(np.where(empty, 0, maxs), mask=empty))
            v = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
            nan_val = np.isnan(v) & ~null  # real NaN values, not NULLs
            vno_nan = np.where(valid & ~nan_val, v, np.inf)
            mins = fold(vno_nan, np.inf, np.minimum, n, w, key_start)
            maxs = fold(np.where(valid & ~nan_val, v, -np.inf), -np.inf,
                        np.maximum, n, w, key_start)
            wnan = windowed_count(nan_val, n, w, lo)
            wvalid = windowed_count(valid, n, w, lo)
            # SQL float total order: NaN > +inf — max sees any NaN,
            # min falls to NaN only once NaNs are the only valid values
            mins = np.where((wnan > 0) & (wnan == wvalid), np.nan, mins)
            maxs = np.where(wnan > 0, np.nan, maxs)
            t = t.append_column(
                min_col, pa.array(np.where(empty, 0.0, mins),
                                  type=pa.float64(), mask=empty))
            return t.append_column(
                max_col, pa.array(np.where(empty, 0.0, maxs),
                                  type=pa.float64(), mask=empty))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class UnpivotTransform(Transform):
    """Wide→long unpivot (the inverse of PivotTransform) — SQL
    ``UNPIVOT (value FOR name IN (c1, c2, …))`` / a stacked UNION ALL
    is the oracle. Per batch each measure column becomes a
    (id_cols…, name, value) slice and the slices concatenate — pure
    per-block column rearrangement: shuffle-free, streaming, output
    rows = input rows × len(value_cols). Measure columns are cast to
    one common type (the first column's type unless ``value_type`` is
    given); pass ``drop_null=True`` for SQL UNPIVOT's default
    NULL-dropping behavior."""

    def __init__(self, id_cols: str | Sequence[str],
                 value_cols: Sequence[str], name_col: str = "name",
                 value_col: str = "value", value_type=None,
                 drop_null: bool = False) -> None:
        self.id_cols = [id_cols] if isinstance(id_cols, str) \
            else list(id_cols)
        if not value_cols:
            raise ValueError("value_cols must be non-empty")
        self.value_cols = list(value_cols)
        self.name_col = name_col
        self.value_col = value_col
        self.value_type = value_type
        self.drop_null = drop_null

    def apply(self, ds):
        ids, vcs = self.id_cols, self.value_cols
        name_col, value_col = self.name_col, self.value_col
        vtype, drop_null = self.value_type, self.drop_null

        def unpivot(t: pa.Table) -> pa.Table:
            out_vtype = vtype or t.schema.field(vcs[0]).type
            parts = []
            for c in vcs:  # __init__ guarantees at least one
                vals = pc.cast(t[c], out_vtype)
                part = t.select(ids) \
                    .append_column(name_col, pa.repeat(c, t.num_rows)) \
                    .append_column(value_col, vals)
                if drop_null:
                    part = part.filter(pc.is_valid(part[value_col]))
                parts.append(part)
            return pa.concat_tables(parts)

        return ds.map_batches(unpivot, batch_format="pyarrow",
                              zero_copy_batch=True)


class ListStatsTransform(Transform):
    """Per-row aggregates over a ``list<numeric>`` column — SQL
    ``len(l) / list_min(l) / list_max(l) / list_sum(l)`` are the
    oracle. Shuffle-free: segmented numpy reduces per batch over the
    list column's flat values (list_flatten respects slices and
    nulls), no per-row Python.

    Element semantics match DuckDB exactly (probed, 2026-08): NULL
    elements are skipped and a list with no valid element emits NULL
    aggregates (len counts NULLs); a real NaN element follows the
    float total order — max and sum of any NaN-containing list are
    NaN, min is NaN only when the valid elements are all NaN. Integer
    element types stay exact: min/max emit int64 (the element type,
    as SQL) and the sum accumulates in int64 — exact to ±2^63, a
    documented narrowing of SQL's HUGEINT list_sum. Float min/max are
    exact element selections widened to float64 (float32→float64 is
    exact); the float sum accumulates in float64."""

    def __init__(self, list_col: str, out_prefix: str | None = None) -> None:
        self.list_col = list_col
        self.out_prefix = out_prefix if out_prefix is not None else list_col

    def apply(self, ds):
        lc, prefix = self.list_col, self.out_prefix

        def stats(t: pa.Table) -> pa.Table:
            import numpy as np

            col = t[lc]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            is_int = pa.types.is_integer(col.type.value_type)
            agg_type = pa.int64() if is_int else pa.float64()
            null = pc.is_null(col).to_numpy(zero_copy_only=False)
            lens = np.asarray(
                pc.fill_null(pc.list_value_length(col), 0)
                .to_numpy(zero_copy_only=False), dtype=np.int64)
            flat_arr = pc.list_flatten(col)
            n = t.num_rows
            out = t.drop_columns([lc])
            out = out.append_column(f"{prefix}_dim",
                                    pa.array(lens, mask=null))
            if n == 0 or len(flat_arr) == 0:
                for name in ("min", "max", "sum"):
                    out = out.append_column(f"{prefix}_{name}",
                                            pa.nulls(n, type=agg_type))
                return out
            elem_null = pc.is_null(flat_arr).to_numpy(zero_copy_only=False)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # reduceat over the NONEMPTY lists' starts only — an empty
            # list contributes no flat elements and no boundary, so
            # consecutive nonempty starts delimit exact segments
            # (reduceat's empty-segment quirk — it yields the element
            # AT a repeated index — never arises); scatter back
            nonempty = (lens > 0) & ~null
            ne_starts = starts[nonempty]

            def seg(op, vals, dtype):
                full = np.zeros(n, dtype=dtype)
                full[nonempty] = op.reduceat(vals, ne_starts)
                return full

            if is_int:
                flat = np.asarray(
                    pc.fill_null(pc.cast(flat_arr, pa.int64()), 0)
                    .to_numpy(zero_copy_only=False), dtype=np.int64)
                lo_s, hi_s = np.iinfo(np.int64).min, np.iinfo(np.int64).max
                vmin = seg(np.minimum, np.where(elem_null, hi_s, flat),
                           np.int64)
                vmax = seg(np.maximum, np.where(elem_null, lo_s, flat),
                           np.int64)
                vsum = seg(np.add, np.where(elem_null, 0, flat), np.int64)
                nvalid = seg(np.add,
                             np.asarray(~elem_null, dtype=np.int64),
                             np.int64)
                mask = nvalid == 0  # covers empty, all-null, null lists
                for name, vals in (("min", vmin), ("max", vmax),
                                   ("sum", vsum)):
                    out = out.append_column(
                        f"{prefix}_{name}",
                        pa.array(np.where(mask, 0, vals), mask=mask))
                return out
            flat = np.asarray(flat_arr.to_numpy(zero_copy_only=False),
                              dtype=np.float64)
            nan_val = np.isnan(flat) & ~elem_null
            dead = elem_null | nan_val
            vmin = seg(np.minimum, np.where(dead, np.inf, flat), np.float64)
            vmax = seg(np.maximum, np.where(dead, -np.inf, flat),
                       np.float64)
            vsum = seg(np.add, np.where(dead, 0.0, flat), np.float64)
            nvalid = seg(np.add, np.asarray(~elem_null, dtype=np.int64),
                         np.int64)
            nnan = seg(np.add, np.asarray(nan_val, dtype=np.int64),
                       np.int64)
            mask = nvalid == 0
            # DuckDB float total order (probed): max/sum see any NaN;
            # min falls to NaN only once NaNs are the only valid values
            vmin = np.where((nnan > 0) & (nnan == nvalid), np.nan, vmin)
            vmax = np.where(nnan > 0, np.nan, vmax)
            vsum = np.where(nnan > 0, np.nan, vsum)
            for name, vals in (("min", vmin), ("max", vmax),
                               ("sum", vsum)):
                out = out.append_column(
                    f"{prefix}_{name}",
                    pa.array(np.where(mask, 0.0, vals),
                             type=pa.float64(), mask=mask))
            return out

        return ds.map_batches(stats, batch_format="pyarrow",
                              zero_copy_batch=True)


class WindowLagTransform(Transform):
    """Per-key ordered LAG + ROW_NUMBER — SQL ``lag(v) OVER (PARTITION
    BY key ORDER BY ts, tie)`` / ``row_number() OVER (...)`` is the
    oracle. The missing piece between MovingAverageTransform (sliding
    aggregate) and SessionizeTransform (gap splitting): raw access to
    the previous row in event order, the primitive behind
    time-since-last-event features, delta encoding and change
    detection in CDC streams.

    Scale shape: ONE hash exchange on the partition key (same
    partitioning as every other per-key window stage — reusable
    downstream); per bucket a vectorized sort + shift segmented at key
    boundaries. No per-key Python loop; output is ∝ input.

    Emits ``<value>_lag`` (the value ``lag_offset`` rows back, NULL —
    or ``lag_default`` — where the key holds fewer prior rows, exactly
    SQL ``lag(v, k, d)``), ``rn`` (1-based row number per key) and,
    when ``ts_col`` is a timestamp, ``gap_us`` (microseconds since the
    previous row, NULL at first rows; always offset 1).
    ``with_lead=True`` adds ``<value>_lead`` (the value ``lag_offset``
    rows ahead, same default rule — SQL ``lead(v, k, d) OVER w``)."""

    def __init__(self, ts_col: str, by: str | Sequence[str],
                 value_col: str, order_tiebreak: str | None = None,
                 gap_col: str | None = "gap_us",
                 rank_col: str = "rn", with_lead: bool = False,
                 lag_offset: int = 1, lag_default=None) -> None:
        if lag_offset < 1:
            raise ValueError("lag_offset must be >= 1")
        self.ts_col = ts_col
        self.by = [by] if isinstance(by, str) else list(by)
        self.value_col = value_col
        self.order_tiebreak = order_tiebreak
        self.gap_col = gap_col
        self.rank_col = rank_col
        self.with_lead = with_lead
        self.lag_offset = int(lag_offset)
        self.lag_default = lag_default

    def apply(self, ds):
        import numpy as np
        import pandas as pd

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        ts_col, by, vc = self.ts_col, self.by, self.value_col
        tie, gap_col, rank_col = (self.order_tiebreak, self.gap_col,
                                  self.rank_col)
        lag_col, with_lead = f"{vc}_lag", self.with_lead
        lead_col = f"{vc}_lead"
        k, lag_default = self.lag_offset, self.lag_default

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            vtype = t.schema.field(vc).type
            if pa.types.is_null(vtype) and lag_default is not None:
                # an all-NULL block infers the typeless null type; a
                # typed non-null default can't live in it — widen to
                # the default's type (the NULL values cast losslessly)
                vtype = pa.scalar(lag_default).type
            is_ts = pa.types.is_timestamp(t.schema.field(ts_col).type)
            if t.num_rows == 0:
                t = t.append_column(lag_col, pa.array([], type=vtype))
                if with_lead:
                    t = t.append_column(lead_col, pa.array([], type=vtype))
                if gap_col and is_ts:
                    t = t.append_column(gap_col, pa.array([], pa.int64()))
                return t.append_column(rank_col, pa.array([], pa.int64()))
            sort_keys = [(c, "ascending") for c in by] + \
                [(ts_col, "ascending")] + \
                ([(tie, "ascending")] if tie else [])
            t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
            n = t.num_rows
            change = key_change_mask(
                [t[c] for c in by], n)
            first = change  # row starts a new key
            starts = np.flatnonzero(first)
            key_start = np.repeat(starts, np.diff(np.append(starts, n)))
            pos = np.arange(n, dtype=np.int64) - key_start  # 0-based
            fill = pa.scalar(lag_default, type=vtype)
            # lag(value, k, d): shift by k, default where the key holds
            # fewer than k prior rows
            vals = pc.cast(t[vc].combine_chunks(), vtype)
            shifted = pa.concat_arrays(
                [pa.nulls(min(k, n), type=vtype), vals.slice(0, n - k)]) \
                if n > k else pa.nulls(n, type=vtype)
            lag_arr = pc.if_else(pa.array(pos < k), fill, shifted)
            t = t.append_column(lag_col, lag_arr)
            if with_lead:
                # lead(value, k, d): shift the other way, default where
                # the key holds fewer than k following rows
                key_len = np.repeat(np.diff(np.append(starts, n)),
                                    np.diff(np.append(starts, n)))
                from_end = key_len - 1 - pos
                nxt = pa.concat_arrays(
                    [vals.slice(k, n - k), pa.nulls(min(k, n), type=vtype)]) \
                    if n > k else pa.nulls(n, type=vtype)
                lead_arr = pc.if_else(pa.array(from_end < k), fill, nxt)
                t = t.append_column(lead_col, lead_arr)
            if gap_col and is_ts:
                us = t[ts_col].combine_chunks().cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                if us.dtype.kind == "f":
                    # NULL ts present (to_numpy promoted to float64 +
                    # NaN): emit NULL gaps on the null row AND its
                    # successor — casting NaN straight into int64
                    # produced INT64_MIN garbage values before
                    gaps = np.zeros(n, dtype=np.float64)
                    gaps[1:] = us[1:] - us[:-1]
                    nan = np.isnan(gaps)
                    t = t.append_column(gap_col, pa.array(
                        np.where(nan, 0, gaps).astype(np.int64),
                        mask=first | nan))
                else:
                    gaps = np.zeros(n, dtype=np.int64)
                    gaps[1:] = us[1:] - us[:-1]
                    t = t.append_column(gap_col,
                                        pa.array(gaps, mask=first))
            return t.append_column(rank_col, pa.array(pos + 1))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class RatioToReportTransform(Transform):
    """Per-row share of its partition's total — SQL ``v / sum(v) OVER
    (PARTITION BY key)`` is the oracle (Oracle's RATIO_TO_REPORT).

    Scale shape: the same single hash exchange on the partition key;
    per bucket one sort on the key only (no ordering column — the
    ratio is order-independent), segmented reduceat sums scattered
    back, one vectorized divide. NULL values are excluded from the
    partition sum and emit NULL ratios (SQL sum/NULL semantics); a
    real NaN value poisons its partition's sum exactly as SQL's
    does."""

    def __init__(self, by: str | Sequence[str], value_col: str,
                 out_col: str | None = None) -> None:
        self.by = [by] if isinstance(by, str) else list(by)
        self.value_col = value_col
        self.out_col = out_col or f"{value_col}_ratio"

    def apply(self, ds):
        import numpy as np

        from etlray.exchange import hash_exchange

        by, vc, out_col = self.by, self.value_col, self.out_col

        def reduce_bucket(t: pa.Table) -> pa.Table:
            from etlray.cdc.apply import BUCKET_COL

            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            if t.num_rows == 0:
                return t.append_column(out_col,
                                       pa.array([], type=pa.float64()))
            t = t.take(pc.sort_indices(
                t, sort_keys=[(c, "ascending") for c in by]))
            n = t.num_rows
            col = t[vc].combine_chunks() \
                if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            v = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
            null = pc.is_null(col).to_numpy(zero_copy_only=False)
            change = key_change_mask(
                [t[c] for c in by], n)
            starts = np.flatnonzero(change)
            gsum = np.add.reduceat(np.where(null, 0.0, v), starts)
            gsum = np.repeat(gsum, np.diff(np.append(starts, n)))
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = v / gsum
            # SQL double division by zero is NULL, not IEEE ±inf — a
            # partition summing to exactly 0 emits NULL ratios
            mask = null | (gsum == 0.0)
            return t.append_column(
                out_col, pa.array(np.where(mask, 0.0, ratio),
                                  type=pa.float64(), mask=mask))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class DenseRankTransform(Transform):
    """Per-key DENSE_RANK over a value ordering — SQL ``dense_rank()
    OVER (PARTITION BY key ORDER BY v)`` is the oracle: ties share a
    rank and the next distinct value increments it by exactly 1.
    ``dense=False`` switches to plain ``rank()``: ties still share,
    but the next distinct value jumps to 1 + the number of PRECEDING
    rows (gaps after tie runs).

    Scale shape: ONE hash exchange on the partition key (the same
    partitioning every other per-key window stage uses); per bucket a
    vectorized sort + two change masks (key boundary, value change) +
    one cumulative sum — no per-key Python loop. NULL values tie with
    each other and rank last (ascending), matching the engine's sort
    order."""

    def __init__(self, by: str | Sequence[str], value_col: str,
                 descending: bool = False,
                 out_col: str = "dense_rank", dense: bool = True) -> None:
        self.by = [by] if isinstance(by, str) else list(by)
        self.value_col = value_col
        self.descending = descending
        self.out_col = out_col
        self.dense = dense

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        by, vc, out_col = self.by, self.value_col, self.out_col
        vdir = "descending" if self.descending else "ascending"
        dense = self.dense

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            n = t.num_rows
            if n == 0:
                return t.append_column(out_col,
                                       pa.array([], type=pa.int64()))
            t = t.take(pc.sort_indices(
                t, sort_keys=[(c, "ascending") for c in by] + [(vc, vdir)]))
            kc = key_change_mask(
                [t[c] for c in by], n)
            # a row starts a NEW RANK when the key changes or the value
            # differs from the previous row (null runs tie — the mask
            # helper already treats consecutive nulls as equal)
            vchange = key_change_mask(
                [t[vc]], n)
            new_rank = kc | vchange
            starts = np.flatnonzero(kc)
            key_start = np.repeat(starts, np.diff(np.append(starts, n)))
            idx = np.arange(n)
            if dense:
                dr = np.cumsum(new_rank)
                base = dr[starts]
                key_idx = np.repeat(np.arange(len(starts)),
                                    np.diff(np.append(starts, n)))
                rank = dr - base[key_idx] + 1
            else:
                # plain RANK: every row carries its tie run's FIRST
                # position within the key (gaps after tie runs)
                tie_start = np.maximum.accumulate(
                    np.where(new_rank, idx, -1))
                rank = tie_start - key_start + 1
            return t.append_column(out_col,
                                   pa.array(rank.astype(np.int64)))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class NtileTransform(Transform):
    """Per-key NTILE(k) — SQL ``ntile(k) OVER (PARTITION BY key ORDER
    BY v [, tiebreak])``: rows split into k buckets of near-equal size,
    the first ``n mod k`` buckets one row larger. Pass a ``tiebreak``
    column to pin tie order (SQL leaves it unspecified; a deterministic
    oracle needs it pinned on both engines).

    Scale shape: the same single key exchange + vectorized per-bucket
    sort as the other window stages; bucket ids come from one
    arithmetic expression over the per-key row number."""

    def __init__(self, by: str | Sequence[str], order_col: str, k: int,
                 tiebreak: str | None = None,
                 out_col: str = "ntile") -> None:
        if k < 1:
            raise TransformError("ntile k must be >= 1")
        self.by = [by] if isinstance(by, str) else list(by)
        self.order_col = order_col
        self.k = int(k)
        self.tiebreak = tiebreak
        self.out_col = out_col

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        by, oc, k, out_col = self.by, self.order_col, self.k, self.out_col
        tie = self.tiebreak

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            n_rows = t.num_rows
            if n_rows == 0:
                return t.append_column(out_col,
                                       pa.array([], type=pa.int64()))
            keys = [(c, "ascending") for c in by] + [(oc, "ascending")]
            if tie:
                keys.append((tie, "ascending"))
            t = t.take(pc.sort_indices(t, sort_keys=keys))
            kc = key_change_mask(
                [t[c] for c in by], n_rows)
            starts = np.flatnonzero(kc)
            sizes = np.diff(np.append(starts, n_rows))
            key_idx = np.repeat(np.arange(len(starts)), sizes)
            rn = np.arange(n_rows) - starts[key_idx]       # 0-based
            n = sizes[key_idx].astype(np.int64)
            # SQL NTILE: first (n mod k) buckets have ceil(n/k) rows
            big = n % k
            big_sz = n // k + 1
            small_sz = np.maximum(n // k, 1)
            cut = big * big_sz
            tile = np.where(rn < cut, rn // np.maximum(big_sz, 1),
                            big + (rn - cut) // small_sz) + 1
            return t.append_column(out_col,
                                   pa.array(tile.astype(np.int64)))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class FirstLastValueTransform(Transform):
    """Per-key FIRST_VALUE / LAST_VALUE over the FULL partition — SQL
    ``first_value(v) OVER (PARTITION BY key ORDER BY o [, tiebreak]
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)`` (and
    ``last_value`` with the same explicit frame; the DEFAULT SQL frame
    makes LAST_VALUE degenerate to the current row's value, so the
    full frame is the form worth an operator — the oracle must spell
    it out too). NULL values are NOT skipped (no IGNORE NULLS), so a
    partition whose first ordered row is NULL yields NULL.

    Scale shape: the shared single key exchange; per bucket one sort +
    change mask, then ONE arrow ``take`` at the per-key first/last row
    index — value types (strings, timestamps, decimals) pass through
    untouched, no numpy round trip."""

    def __init__(self, by: str | Sequence[str], order_col: str,
                 value_col: str, tiebreak: str | None = None,
                 out_first: str | None = "first_value",
                 out_last: str | None = "last_value") -> None:
        if out_first is None and out_last is None:
            raise TransformError("need at least one of out_first/out_last")
        self.by = [by] if isinstance(by, str) else list(by)
        self.order_col = order_col
        self.value_col = value_col
        self.tiebreak = tiebreak
        self.out_first = out_first
        self.out_last = out_last

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        by, oc, vc = self.by, self.order_col, self.value_col
        tie, of, ol = self.tiebreak, self.out_first, self.out_last
        _s = ds.schema()
        vtype = dict(zip(_s.names, _s.types)).get(vc)

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            n = t.num_rows
            if n == 0:
                for name in (of, ol):
                    if name:
                        t = t.append_column(name,
                                            pa.array([], type=vtype))
                return t
            local = t.schema.field(vc).type
            if vtype is not None and not pa.types.is_null(vtype) \
                    and local != vtype:
                t = t.set_column(t.column_names.index(vc), vc,
                                 t[vc].cast(vtype))
            keys = [(c, "ascending") for c in by] + [(oc, "ascending")]
            if tie:
                keys.append((tie, "ascending"))
            t = t.take(pc.sort_indices(t, sort_keys=keys))
            kc = key_change_mask(
                [t[c] for c in by], n)
            starts = np.flatnonzero(kc)
            sizes = np.diff(np.append(starts, n))
            key_idx = np.repeat(np.arange(len(starts)), sizes)
            col = t[vc].combine_chunks() if isinstance(t[vc], pa.ChunkedArray) \
                else t[vc]
            if of:
                t = t.append_column(of, col.take(pa.array(starts[key_idx])))
            if ol:
                last_idx = starts[key_idx] + sizes[key_idx] - 1
                t = t.append_column(ol, col.take(pa.array(last_idx)))
            return t

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class NthValueTransform(Transform):
    """Per-key NTH_VALUE over the FULL partition — SQL ``nth_value(v,
    n) OVER (PARTITION BY key ORDER BY o [, tiebreak] ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``: every row carries
    the value at 1-based ordered position ``n`` of its partition, NULL
    when the partition has fewer than ``n`` rows. NULL values are NOT
    skipped (no IGNORE NULLS), matching SQL's default. Negative ``n``
    counts from the partition end (-1 = last row) — an extension SQL
    would spell as nth_value over the reversed order.

    Scale shape: the shared single key exchange
    (``default_exchange_buckets`` reduce width); per bucket one sort +
    change mask, then ONE arrow ``take`` whose index array carries
    NULLs for too-short partitions (Arrow take propagates a null index
    to a null output) — value types (strings, timestamps, decimals)
    pass through untouched, no numpy round trip."""

    def __init__(self, by: str | Sequence[str], order_col: str,
                 value_col: str, n: int,
                 tiebreak: str | None = None,
                 out_col: str = "nth_value") -> None:
        if n == 0:
            raise TransformError("nth_value position n is 1-based; "
                                 "n=0 is meaningless (negative counts "
                                 "from the end)")
        self.by = [by] if isinstance(by, str) else list(by)
        self.order_col = order_col
        self.value_col = value_col
        self.n = n
        self.tiebreak = tiebreak
        self.out_col = out_col

    def apply(self, ds):
        import numpy as np

        from etlray.exchange import hash_exchange

        by, oc, vc = self.by, self.order_col, self.value_col
        nth, tie, out = self.n, self.tiebreak, self.out_col
        _s = ds.schema()
        vtype = dict(zip(_s.names, _s.types)).get(vc)

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = frame_sort(t, by, oc, tie)
            n_rows = t.num_rows
            if n_rows == 0:
                return t.append_column(out, pa.array([], type=vtype))
            local = t.schema.field(vc).type
            if vtype is not None and not pa.types.is_null(vtype) \
                    and local != vtype:
                t = t.set_column(t.column_names.index(vc), vc,
                                 t[vc].cast(vtype))
            kc = key_change_mask(
                [t[c] for c in by], n_rows)
            starts = np.flatnonzero(kc)
            sizes = np.diff(np.append(starts, n_rows))
            key_idx = np.repeat(np.arange(len(starts)), sizes)
            if nth > 0:
                idx = starts[key_idx] + (nth - 1)
                short = sizes[key_idx] < nth
            else:
                idx = starts[key_idx] + sizes[key_idx] + nth
                short = sizes[key_idx] < -nth
            col = t[vc].combine_chunks() \
                if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            return t.append_column(
                out, col.take(pa.array(np.where(short, 0, idx),
                                       mask=short)))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class ArgMinMaxTransform(Transform):
    """Per-group ARG_MAX / ARG_MIN (SQL max_by/min_by): ONE output row
    per group — the input row whose ``order_col`` is the group's max
    (``mode="max"``) or min (``"min"``), ties broken by the REQUIRED
    ``tiebreak`` column ascending so the winner is deterministic and
    an exact SQL oracle exists (``QUALIFY row_number() OVER (PARTITION
    BY g ORDER BY o DESC, tie ASC) = 1``). All non-key columns of the
    winning row are carried through untouched. Rows whose
    ``order_col`` is NULL never win, and a group containing ONLY
    NULL-order rows is absent from the output (the QUALIFY/window
    reading; SQL's aggregate ``arg_max`` would emit a NULL row for it
    — pre-filter with ``WHERE o IS NOT NULL`` in the oracle).

    Scale shape: partial-combine — each batch keeps at most one row
    per group (one sort + change mask + take) BEFORE the exchange, so
    the shuffle carries ~|groups| rows per block regardless of input
    size, and each reduce bucket replays the same selection on the
    concatenated partials (the selection is associative: the best of
    per-batch bests is the global best)."""

    def __init__(self, group_by: str | Sequence[str], order_col: str,
                 tiebreak: str, mode: str = "max") -> None:
        if mode not in ("max", "min"):
            raise TransformError(f"mode must be 'max' or 'min', not {mode!r}")
        self.group_by = [group_by] if isinstance(group_by, str) \
            else list(group_by)
        self.order_col = order_col
        self.tiebreak = tiebreak
        self.mode = mode

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        gb, oc, tie = self.group_by, self.order_col, self.tiebreak
        direction = "descending" if self.mode == "max" else "ascending"

        def best_rows(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            t = t.filter(pc.is_valid(t[oc]))
            n = t.num_rows
            if n == 0:
                return t
            keys = [(c, "ascending") for c in gb] + \
                [(oc, direction), (tie, "ascending")]
            t = t.take(pc.sort_indices(t, sort_keys=keys))
            kc = key_change_mask(
                [t[c] for c in gb], n)
            return t.take(pa.array(np.flatnonzero(kc)))

        pre = ds.map_batches(best_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
        return hash_exchange(pre, gb, default_exchange_buckets(),
                             best_rows, bucket_col=None)


class ArrayAggTransform(Transform):
    """Per-group ordered ARRAY_AGG (SQL ``list(v ORDER BY o [, tie])``
    / ``array_agg``): ONE row per group carrying a ``list<value
    type>`` column of the group's values in deterministic order. NULL
    values are kept (SQL list() keeps them); a NULL group key is a
    group.

    Scale shape: the shared key exchange; per bucket one sort + change
    mask, then the list column is built in one shot from the sorted
    value child and the group offsets (``LargeListArray.from_arrays``
    — 64-bit offsets so a bucket is not capped at 2^31 child
    elements); no per-row Python, value types pass through untouched.
    The caveat a 100-TB plan must respect: one group's list lives in
    one bucket block, so a single group's collected values must fit a
    worker's heap — array_agg is for bounded groups by construction."""

    def __init__(self, group_by: str | Sequence[str], value_col: str,
                 order_col: str, tiebreak: str | None = None,
                 out_col: str | None = None) -> None:
        self.group_by = [group_by] if isinstance(group_by, str) \
            else list(group_by)
        self.value_col = value_col
        self.order_col = order_col
        self.tiebreak = tiebreak
        self.out_col = out_col or f"{value_col}_list"

    def apply(self, ds):
        import numpy as np

        from etlray.exchange import hash_exchange

        gb, vc, oc = self.group_by, self.value_col, self.order_col
        tie, out = self.tiebreak, self.out_col

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = frame_sort(t, gb, oc, tie)
            n = t.num_rows
            vtype = t.schema.field(vc).type
            if n == 0:
                cols = {c: pa.array([], type=t.schema.field(c).type)
                        for c in gb}
                cols[out] = pa.array([], type=pa.large_list(vtype))
                return pa.table(cols)
            kc = key_change_mask(
                [t[c] for c in gb], n)
            starts = np.flatnonzero(kc)
            offsets = pa.array(np.append(starts, n), type=pa.int64())
            child = t[vc].combine_chunks() \
                if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            first = t.take(pa.array(starts))
            cols = {c: first[c] for c in gb}
            cols[out] = pa.LargeListArray.from_arrays(offsets, child)
            return pa.table(cols)

        return hash_exchange(ds, gb, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class RangeWindowAggTransform(Transform):
    """Sliding time-window SUM/COUNT per key — SQL ``sum(v) OVER
    (PARTITION BY key ORDER BY o RANGE BETWEEN <preceding> PRECEDING
    AND CURRENT ROW)``: each row aggregates the rows of its partition
    whose order value lies in ``[o - preceding, o]``. RANGE-frame
    semantics exactly: the upper bound includes PEERS (rows tying the
    current order value), SUM skips NULL values and emits NULL when
    the window holds no valid value, COUNT counts valid values.
    ``preceding`` is in the order column's units (microseconds for
    ``timestamp[us]``). Rows with a NULL order value are rejected —
    pre-filter them (SQL's RANGE NULL-peers convention isn't worth
    emulating).

    Scale shape: the shared key exchange; per bucket one sort, then
    both frame bounds come from TWO vectorized ``searchsorted`` calls
    over a per-group-rebased composite order (group index × span so
    one monotone array serves every group — falls back to a per-group
    slice loop on int64-overflow-sized spans) and the aggregates are
    prefix-sum differences — O(n log n) per bucket, no per-row
    Python. Prefix differencing re-associates the float sum; the
    error is ~ulp-of-prefix, far below any 4-dp agreement bar."""

    def __init__(self, by: str | Sequence[str], order_col: str,
                 value_col: str, preceding: int,
                 out_sum: str | None = "range_sum",
                 out_count: str | None = "range_count") -> None:
        if preceding < 0:
            raise TransformError("preceding must be >= 0")
        if out_sum is None and out_count is None:
            raise TransformError("need at least one of out_sum/out_count")
        self.by = [by] if isinstance(by, str) else list(by)
        self.order_col = order_col
        self.value_col = value_col
        self.preceding = int(preceding)
        self.out_sum = out_sum
        self.out_count = out_count

    def apply(self, ds):
        import numpy as np

        from etlray.exchange import hash_exchange

        by, oc, vc = self.by, self.order_col, self.value_col
        prec, osum, ocnt = self.preceding, self.out_sum, self.out_count

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = frame_sort(t, by, oc, None)
            n = t.num_rows
            if n == 0:
                # same append order as the non-empty path — an empty
                # bucket's block must carry the identical schema
                if ocnt:
                    t = t.append_column(ocnt, pa.array([], pa.int64()))
                if osum:
                    t = t.append_column(osum, pa.array([], pa.float64()))
                return t
            if pc.any(pc.is_null(t[oc])).as_py():
                raise TransformError(
                    f"RangeWindowAgg order column {oc!r} has NULLs — "
                    "pre-filter them")
            order_arr = t[oc].combine_chunks() \
                if isinstance(t[oc], pa.ChunkedArray) else t[oc]
            otype = order_arr.type
            if pa.types.is_temporal(otype):
                order = order_arr.cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False)
            elif pa.types.is_integer(otype):
                order = np.asarray(
                    order_arr.to_numpy(zero_copy_only=False),
                    dtype=np.int64)
            else:
                # np.asarray(int64) would silently TRUNCATE floats —
                # an integer `preceding` has no honest meaning there
                raise TransformError(
                    f"RangeWindowAgg order column {oc!r} must be "
                    f"integer or temporal, not {otype}")
            kc = key_change_mask(
                [t[c] for c in by], n)
            starts = np.flatnonzero(kc)
            sizes = np.diff(np.append(starts, n))
            key_idx = np.repeat(np.arange(len(starts)), sizes)
            gmin = order[starts][key_idx]
            rel = order - gmin                      # >= 0 within group
            span = int(rel.max()) + prec + 2
            if span * len(starts) < (1 << 62):
                adj = rel + key_idx * span
                lo = np.searchsorted(adj, adj - prec, side="left")
                hi = np.searchsorted(adj, adj, side="right")
            else:                                   # overflow fallback
                lo = np.empty(n, dtype=np.int64)
                hi = np.empty(n, dtype=np.int64)
                for s, z in zip(starts, sizes):
                    sl = order[s:s + z]
                    lo[s:s + z] = s + np.searchsorted(sl, sl - prec,
                                                      side="left")
                    hi[s:s + z] = s + np.searchsorted(sl, sl,
                                                      side="right")
            vals_arr = t[vc]
            valid = pc.is_valid(vals_arr).to_numpy(zero_copy_only=False)
            vals = np.asarray(
                pc.fill_null(pc.cast(vals_arr, pa.float64()), 0.0)
                .to_numpy(zero_copy_only=False), dtype=np.float64)
            ccnt = np.concatenate(
                ([0], np.cumsum(valid.astype(np.int64))))
            wcnt = ccnt[hi] - ccnt[lo]
            if ocnt:
                t = t.append_column(ocnt, pa.array(wcnt, pa.int64()))
            if osum:
                csum = np.concatenate(([0.0], np.cumsum(vals)))
                wsum = csum[hi] - csum[lo]
                t = t.append_column(
                    osum, pa.array(np.where(wcnt == 0, 0.0, wsum),
                                   mask=wcnt == 0))
            return t

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class GapFillAggTransform(Transform):
    """Sparse→dense time-series densification: bucket each key's rows
    to ``stride``-wide bins of ``time_col`` (floor division, =
    ``date_trunc`` for positive epochs), aggregate count + sum of
    ``value_col`` per (key, bucket), and EMIT A ROW FOR EVERY bucket
    between the key's min and max — gaps get count 0 / NULL sum, a
    present bucket whose values are all NULL gets its count and a
    NULL sum (SQL sum-of-nothing). The oracle shape is DuckDB's
    ``generate_series`` per key LEFT JOINed to the grouped aggregate.

    Scale shape: ONE exchange keyed on ``by`` (not (key, bucket) — the
    densify needs a whole key in one reduce anyway, so the aggregate
    rides the same shuffle); per bucket one sort + change masks, then
    the dense grid is built with repeat/arange and the sparse
    aggregates scattered into it — no per-row or per-bucket Python.
    ``max_buckets`` guards the grid explosion a single key spanning an
    enormous time range would cause (raise, don't OOM — densifying a
    years-wide key at second stride is a pipeline bug, not a need)."""

    def __init__(self, by: str | Sequence[str], time_col: str,
                 stride: int, value_col: str,
                 out_bucket: str | None = None,
                 out_count: str = "n_rows",
                 out_sum: str | None = None,
                 max_buckets: int = 50_000_000) -> None:
        if stride <= 0:
            raise TransformError("stride must be a positive integer")
        self.by = [by] if isinstance(by, str) else list(by)
        self.time_col = time_col
        self.stride = int(stride)
        self.value_col = value_col
        self.out_bucket = out_bucket or f"{time_col}_bucket"
        self.out_count = out_count
        self.out_sum = out_sum or f"{value_col}_sum"
        self.max_buckets = max_buckets

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        by, oc, vc = self.by, self.time_col, self.value_col
        stride, ob = self.stride, self.out_bucket
        ocnt, osum, maxb = self.out_count, self.out_sum, self.max_buckets

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            otype = t.schema.field(oc).type
            is_ts = pa.types.is_timestamp(otype)
            if t.num_rows == 0:
                cols = {c: pa.array([], type=t.schema.field(c).type)
                        for c in by}
                cols[ob] = pa.array([], type=otype)
                cols[ocnt] = pa.array([], type=pa.int64())
                cols[osum] = pa.array([], type=pa.float64())
                return pa.table(cols)
            if pc.any(pc.is_null(t[oc])).as_py():
                raise TransformError(
                    f"GapFillAgg time column {oc!r} has NULLs — "
                    "pre-filter them")
            order_arr = t[oc].combine_chunks() \
                if isinstance(t[oc], pa.ChunkedArray) else t[oc]
            if is_ts:
                order = order_arr.cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False)
            elif pa.types.is_integer(otype):
                order = np.asarray(
                    order_arr.to_numpy(zero_copy_only=False),
                    dtype=np.int64)
            else:
                # np.asarray(int64) would silently TRUNCATE floats
                # (toward zero, not floor — wrong bucketing for
                # negatives), and non-timestamp temporals couldn't
                # round-trip back through the int64 grid; cast
                # upstream instead
                raise TransformError(
                    f"GapFillAgg time column {oc!r} must be integer "
                    f"or timestamp, not {otype}")
            bucket = (order // stride) * stride
            t2 = frame_sort(t.append_column("__b", pa.array(bucket)),
                            by, "__b", None)
            n = t2.num_rows
            key_arrays = [t2[c] for c in by]  # arrow: exact keys
            bsorted = t2["__b"].to_numpy(zero_copy_only=False)
            kc = key_change_mask(key_arrays, n)           # per-key runs
            sc = key_change_mask(key_arrays + [bsorted], n)  # per-seg
            key_starts = np.flatnonzero(kc)
            key_sizes = np.diff(np.append(key_starts, n))
            seg_starts = np.flatnonzero(sc)
            seg_sizes = np.diff(np.append(seg_starts, n))
            # which key each segment belongs to
            seg_key = np.searchsorted(key_starts, seg_starts,
                                      side="right") - 1
            seg_bucket = bsorted[seg_starts]
            vals_arr = t2[vc]
            valid = pc.is_valid(vals_arr).to_numpy(zero_copy_only=False)
            vals = np.asarray(
                pc.fill_null(pc.cast(vals_arr, pa.float64()), 0.0)
                .to_numpy(zero_copy_only=False), dtype=np.float64)

            def seg_reduce(arr, dtype):
                out = np.add.reduceat(arr, seg_starts)
                return out.astype(dtype, copy=False)

            seg_cnt = seg_sizes
            seg_nvalid = seg_reduce(valid.astype(np.int64), np.int64)
            seg_sum = seg_reduce(vals, np.float64)
            # dense grid per key
            key_last = key_starts + key_sizes - 1
            mn = bsorted[key_starts]
            mx = bsorted[key_last]
            m = (mx - mn) // stride + 1
            # per-key check FIRST: one astronomic key could wrap the
            # int64 total negative and slip past the sum check; once
            # every m <= maxb the sum of <= n of them cannot overflow
            if int(m.max()) > maxb or (total := int(m.sum())) > maxb:
                worst = int(m.max())
                raise TransformError(
                    f"GapFillAgg would emit {max(worst, int(m.sum()))} "
                    f"bucket rows in one reduce (> max_buckets={maxb});"
                    " widen the stride or narrow the time range")
            grid_starts = np.concatenate(([0], np.cumsum(m)[:-1]))
            key_full = np.repeat(np.arange(len(key_starts)), m)
            within = np.arange(total) - grid_starts[key_full]
            bucket_full = mn[key_full] + within * stride
            pos = grid_starts[seg_key] + \
                (seg_bucket - mn[seg_key]) // stride
            cnt_full = np.zeros(total, dtype=np.int64)
            cnt_full[pos] = seg_cnt
            sum_full = np.zeros(total, dtype=np.float64)
            sum_full[pos] = seg_sum
            nv_full = np.zeros(total, dtype=np.int64)
            nv_full[pos] = seg_nvalid
            keys_tbl = t2.select(by).take(pa.array(key_starts))
            cols = {c: keys_tbl[c].take(pa.array(key_full)) for c in by}
            barr = pa.array(bucket_full)
            # the bucket column keeps the INPUT type (empty buckets
            # emit it too, so every block must agree); grid values lie
            # between the input's min and max, so a narrowing cast
            # back to e.g. int32 cannot overflow
            cols[ob] = barr if otype == pa.int64() else barr.cast(otype)
            cols[ocnt] = pa.array(cnt_full)
            cols[osum] = pa.array(np.where(nv_full == 0, 0.0, sum_full),
                                  mask=nv_full == 0)
            return pa.table(cols)

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class LocfFillTransform(Transform):
    """Last-observation-carried-forward fill per key — SQL
    ``last_value(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY o
    [, tiebreak] ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)``:
    every NULL value takes the key's most recent non-NULL value in
    event order; a leading all-NULL prefix stays NULL (nothing to
    carry). The time-series densify/repair companion to
    GapFillAggTransform.

    Scale shape: the shared key exchange + frame_sort; the carry is
    ONE segmented ``np.maximum.accumulate`` over source-row indices
    (valid rows carry their own index, NULL rows inherit the running
    max, key starts reset via an offset trick) followed by ONE arrow
    ``take`` — value types pass through untouched, no numpy round
    trip of the values themselves."""

    def __init__(self, by: str | Sequence[str], order_col: str,
                 value_col: str, tiebreak: str | None = None,
                 out_col: str | None = None) -> None:
        self.by = [by] if isinstance(by, str) else list(by)
        self.order_col = order_col
        self.value_col = value_col
        self.tiebreak = tiebreak
        self.out_col = out_col or f"{value_col}_locf"

    def apply(self, ds):
        import numpy as np

        from etlray.exchange import hash_exchange

        by, oc, vc = self.by, self.order_col, self.value_col
        tie, out = self.tiebreak, self.out_col
        _s = ds.schema()
        vtype = dict(zip(_s.names, _s.types)).get(vc)

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = frame_sort(t, by, oc, tie)
            n = t.num_rows
            if n == 0:
                return t.append_column(out, pa.array([], type=vtype))
            local = t.schema.field(vc).type
            if vtype is not None and not pa.types.is_null(vtype) \
                    and local != vtype:
                t = t.set_column(t.column_names.index(vc), vc,
                                 t[vc].cast(vtype))
            kc = key_change_mask(
                [t[c] for c in by], n)
            starts = np.flatnonzero(kc)
            key_start = np.repeat(starts,
                                  np.diff(np.append(starts, n)))
            col = t[vc].combine_chunks() \
                if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            # carry source index: valid rows own their index, NULL
            # rows inherit the running max; -1 (never seen) under a
            # key start means a leading all-NULL prefix -> stays NULL
            src = np.where(valid, np.arange(n), -1)
            src = np.maximum.accumulate(src)
            lead = src < key_start      # carried from a PREVIOUS key
            return t.append_column(
                out, col.take(pa.array(np.where(lead, 0, src),
                                       mask=lead)))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class InterpFillTransform(Transform):
    """Linear-interpolation fill per key — LocfFillTransform's
    two-sided sibling: each NULL value is interpolated between its
    key's previous and next non-NULL values, weighted by the order
    column's distance (``pv + (nv - pv) * (o - po) / (no - po)``).
    Edge rows with no previous OR no next observation stay NULL; when
    the two neighbors tie on the order value the previous value
    carries (no 0/0). Output is always float64 (interpolation is
    inherently fractional). The SQL oracle spells the same rule with
    two IGNORE NULLS window scans and a CASE.

    Scale shape: the shared key exchange + frame_sort; the neighbor
    search is ONE ``np.maximum.accumulate`` forward and ONE
    ``np.minimum.accumulate`` backward over source-row indices (key
    bounds mask cross-key carries), then pure vectorized arithmetic.
    Order column must be integer or temporal — a float order would be
    silently truncated, same guard as RangeWindowAggTransform."""

    def __init__(self, by: str | Sequence[str], order_col: str,
                 value_col: str, tiebreak: str | None = None,
                 out_col: str | None = None) -> None:
        self.by = [by] if isinstance(by, str) else list(by)
        self.order_col = order_col
        self.value_col = value_col
        self.tiebreak = tiebreak
        self.out_col = out_col or f"{value_col}_interp"

    def apply(self, ds):
        import numpy as np

        from etlray.exchange import hash_exchange

        by, oc, vc = self.by, self.order_col, self.value_col
        tie, out = self.tiebreak, self.out_col

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = frame_sort(t, by, oc, tie)
            n = t.num_rows
            if n == 0:
                return t.append_column(out, pa.array([], pa.float64()))
            if pc.any(pc.is_null(t[oc])).as_py():
                raise TransformError(
                    f"InterpFill order column {oc!r} has NULLs — "
                    "pre-filter them")
            order_arr = t[oc].combine_chunks() \
                if isinstance(t[oc], pa.ChunkedArray) else t[oc]
            otype = order_arr.type
            if pa.types.is_temporal(otype):
                o = order_arr.cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False).astype(np.float64)
            elif pa.types.is_integer(otype):
                o = np.asarray(order_arr.to_numpy(zero_copy_only=False),
                               dtype=np.float64)
            else:
                raise TransformError(
                    f"InterpFill order column {oc!r} must be integer "
                    f"or temporal, not {otype}")
            col = t[vc].combine_chunks() \
                if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            vals = pc.fill_null(pc.cast(col, pa.float64()), 0.0) \
                .to_numpy(zero_copy_only=False)
            kc = key_change_mask(
                [t[c] for c in by], n)
            starts = np.flatnonzero(kc)
            sizes = np.diff(np.append(starts, n))
            key_start = np.repeat(starts, sizes)
            key_end = np.repeat(starts + sizes - 1, sizes)
            idx = np.arange(n)
            fwd = np.maximum.accumulate(np.where(valid, idx, -1))
            bwd = np.minimum.accumulate(
                np.where(valid, idx, 2 * n)[::-1])[::-1]
            has_prev = fwd >= key_start        # -1 never >= start
            has_next = bwd <= key_end
            both = has_prev & has_next & ~valid
            # clip so the gathers stay in bounds on masked-out rows
            pv = vals[np.clip(fwd, 0, n - 1)]
            nv = vals[np.clip(bwd, 0, n - 1)]
            po = o[np.clip(fwd, 0, n - 1)]
            no = o[np.clip(bwd, 0, n - 1)]
            d2 = no - po
            with np.errstate(invalid="ignore", divide="ignore"):
                interp = pv + (nv - pv) * (o - po) / d2
            filled = np.where(d2 == 0, pv, interp)
            res = np.where(valid, vals, np.where(both, filled, 0.0))
            mask = ~valid & ~both
            return t.append_column(
                out, pa.array(res, type=pa.float64(), mask=mask))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class RunningDistinctCountTransform(Transform):
    """Per-key running COUNT(DISTINCT value) in event order — the
    window SQL can't spell directly (no DISTINCT inside window
    functions), so the oracle is the standard rewrite: flag each
    (key, value) pair's FIRST occurrence in order via row_number()=1,
    then a running sum of the flag. NULL values are not counted
    (COUNT(DISTINCT) ignores NULLs) but their rows still carry the
    count so far.

    Scale shape: the shared key exchange + frame_sort; the
    first-occurrence flag is one pandas C ``duplicated`` over
    (key, value) — computed in frame order, so "first" means first in
    event time — and the running count is one segmented cumsum. The
    distinct-value SET is never materialized."""

    def __init__(self, by: str | Sequence[str], order_col: str,
                 value_col: str, tiebreak: str | None = None,
                 out_col: str | None = None) -> None:
        self.by = [by] if isinstance(by, str) else list(by)
        self.order_col = order_col
        self.value_col = value_col
        self.tiebreak = tiebreak
        self.out_col = out_col or f"{value_col}_distinct_running"

    def apply(self, ds):
        import numpy as np
        import pandas as pd

        from etlray.exchange import hash_exchange

        by, oc, vc = self.by, self.order_col, self.value_col
        tie, out = self.tiebreak, self.out_col

        def dedup_codes(col) -> "np.ndarray":
            """Dictionary codes as the pandas-duplicated key: exact
            equality for EVERY type — raw to_numpy would convert an
            int column with nulls through float64 and could collapse
            distinct values past 2^53 (and conflate NULL with a
            literal NaN). Codes are block-local small ints; nulls
            stay NaN and dedupe only with each other."""
            a = col.combine_chunks() \
                if isinstance(col, pa.ChunkedArray) else col
            return pc.dictionary_encode(a).indices.to_numpy(
                zero_copy_only=False)

        def reduce_bucket(t: pa.Table) -> pa.Table:
            t = frame_sort(t, by, oc, tie)
            n = t.num_rows
            if n == 0:
                return t.append_column(out, pa.array([], pa.int64()))
            cols = {f"k{i}": dedup_codes(t[c])
                    for i, c in enumerate(by)}
            cols["v"] = dedup_codes(t[vc])
            first = ~pd.DataFrame(cols).duplicated().to_numpy()
            # NULL values never count as a new distinct
            first &= pc.is_valid(
                t[vc].combine_chunks()
                if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            ).to_numpy(zero_copy_only=False)
            kc = key_change_mask([t[c] for c in by], n)
            run = np.cumsum(first.astype(np.int64))
            starts = np.flatnonzero(kc)
            base = (run - first.astype(np.int64))[starts]
            key_idx = np.repeat(np.arange(len(starts)),
                                np.diff(np.append(starts, n)))
            return t.append_column(
                out, pa.array(run - base[key_idx]))

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class RankStatsTransform(Transform):
    """Per-key PERCENT_RANK and CUME_DIST in one pass — SQL
    ``percent_rank() OVER (PARTITION BY key ORDER BY v)`` =
    (rank-1)/(n-1) (0.0 for a 1-row partition) and ``cume_dist()`` =
    (rows ordered <= current, i.e. end of the tie run)/n. NULL values
    sort last (ascending) and tie with each other, matching DuckDB's
    window ordering.

    Scale shape: the shared single key exchange; per bucket one sort +
    two change masks (key boundary, tie boundary) + run arithmetic —
    no per-key Python."""

    def __init__(self, by: str | Sequence[str], value_col: str,
                 out_percent: str | None = "percent_rank",
                 out_cume: str | None = "cume_dist") -> None:
        if out_percent is None and out_cume is None:
            raise TransformError("need at least one of out_percent/out_cume")
        self.by = [by] if isinstance(by, str) else list(by)
        self.value_col = value_col
        self.out_percent = out_percent
        self.out_cume = out_cume

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        by, vc = self.by, self.value_col
        op, ocd = self.out_percent, self.out_cume

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            n = t.num_rows
            if n == 0:
                for name in (op, ocd):
                    if name:
                        t = t.append_column(name,
                                            pa.array([], type=pa.float64()))
                return t
            t = t.take(pc.sort_indices(
                t, sort_keys=[(c, "ascending") for c in by]
                + [(vc, "ascending")]))
            kc = key_change_mask(
                [t[c] for c in by], n)
            vchange = key_change_mask(
                [t[vc]], n)
            starts = np.flatnonzero(kc)
            sizes = np.diff(np.append(starts, n))
            key_idx = np.repeat(np.arange(len(starts)), sizes)
            n_k = sizes[key_idx].astype(np.float64)
            ts = np.flatnonzero(kc | vchange)   # tie-run starts (per key)
            runs = np.diff(np.append(ts, n))
            tie_idx = np.repeat(np.arange(len(ts)), runs)
            if op:
                rank = ts[tie_idx] - starts[key_idx] + 1
                pr = np.where(n_k > 1, (rank - 1) / np.maximum(n_k - 1, 1),
                              0.0)
                t = t.append_column(op, pa.array(pr, type=pa.float64()))
            if ocd:
                run_end = np.append(ts[1:], n)[tie_idx]
                cd = (run_end - starts[key_idx]) / n_k
                t = t.append_column(ocd, pa.array(cd, type=pa.float64()))
            return t

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class RunningAggTransform(Transform):
    """Per-key RUNNING aggregate in event order — SQL ``agg(v) OVER
    (PARTITION BY key ORDER BY order_col [, tiebreak] ROWS BETWEEN
    UNBOUNDED PRECEDING AND CURRENT ROW)`` with agg ∈ {sum, count,
    min, max, avg}. The cumulative-state window the LAG/NTILE family
    doesn't cover (running revenue, events-so-far, high-water marks;
    avg = running sum / non-null count so far, float64 — empty
    window → NULL).

    Scale shape: the usual single key exchange; per bucket one sort +
    pandas' C-implemented grouped cumulative kernels (cumsum/cummax/
    cumcount) segmented by the key-change mask — no per-key Python.
    NULL values contribute nothing to sum/count and leave min/max
    unchanged (SQL window-aggregate semantics); their own row still
    gets the running value so far."""

    _AGGS = ("sum", "count", "min", "max", "avg")

    def __init__(self, by: str | Sequence[str], order_col: str,
                 value_col: str, agg: str = "sum",
                 tiebreak: str | None = None,
                 out_col: str | None = None) -> None:
        if agg not in self._AGGS:
            raise TransformError(f"running agg must be one of {self._AGGS}")
        self.by = [by] if isinstance(by, str) else list(by)
        self.order_col = order_col
        self.value_col = value_col
        self.agg = agg
        self.tiebreak = tiebreak
        self.out_col = out_col or f"{value_col}_running_{agg}"

    def apply(self, ds):
        import numpy as np
        import pandas as pd

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        by, oc, vc, agg = self.by, self.order_col, self.value_col, self.agg
        tie, out_col = self.tiebreak, self.out_col
        # declared value type pinned DRIVER-side: an all-null block's
        # local schema degrades vc to pa.null(), which would both lose
        # the integer-exact path and crash the pandas kernel on object
        # dtype in that bucket
        _s = ds.schema()
        declared = dict(zip(_s.names, _s.types)).get(vc)

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            n = t.num_rows
            local = t.schema.field(vc).type
            if declared is not None and not pa.types.is_null(declared) \
                    and local != declared:
                t = t.set_column(t.column_names.index(vc), vc,
                                 t[vc].cast(declared))
            vtype = pa.int64() if agg == "count" \
                else pa.float64() if agg == "avg" \
                else t.schema.field(vc).type
            if n == 0:
                return t.append_column(out_col, pa.array([], type=vtype))
            keys = [(c, "ascending") for c in by] + [(oc, "ascending")]
            if tie:
                keys.append((tie, "ascending"))
            t = t.take(pc.sort_indices(t, sort_keys=keys))
            kc = key_change_mask(
                [t[c] for c in by], n)
            gid = np.cumsum(kc) - 1
            if agg in ("sum", "min", "max") and pa.types.is_integer(vtype) \
                    and t[vc].null_count > 0:
                # EXACT integer path: to_numpy on an int column with
                # nulls promotes to float64 (silently inexact above
                # 2^53). Run the cumulative kernel on a null-filled
                # int64 array with a neutral fill (0 for sum — a NULL
                # row then naturally carries the running-so-far value;
                # ±int64 extrema for min/max) and NULL out rows whose
                # window is still empty (leading all-null prefix).
                fill = {"sum": 0, "min": np.iinfo(np.int64).max,
                        "max": np.iinfo(np.int64).min}[agg]
                valid = pc.is_valid(t[vc]).to_numpy(zero_copy_only=False)
                ints = pc.fill_null(pc.cast(t[vc], pa.int64()),
                                    fill).to_numpy(zero_copy_only=False)
                g = pd.Series(ints).groupby(gid)
                run_np = (g.cumsum() if agg == "sum"
                          else g.cummin() if agg == "min"
                          else g.cummax()).to_numpy()
                seen = pd.Series(valid.astype(np.int64)).groupby(gid) \
                    .cumsum().to_numpy()
                arr = pa.array(run_np, mask=(seen == 0))
            else:
                v = pd.Series(t[vc].to_numpy(zero_copy_only=False))
                g = v.groupby(gid)
                if agg == "sum":
                    run = g.cumsum()
                elif agg == "count":
                    # non-null values so far, INCLUDING the current row
                    run = v.notna().astype("int64").groupby(gid).cumsum()
                elif agg == "avg":
                    # running mean = running sum / non-null count so far;
                    # empty window (count 0) -> SQL NULL via NaN divide
                    sums = g.cumsum().groupby(gid).ffill()
                    cnts = v.notna().astype("int64").groupby(gid).cumsum()
                    run = sums / cnts.where(cnts > 0)
                elif agg == "min":
                    run = g.cummin()
                else:
                    run = g.cummax()
                if agg not in ("count", "avg"):
                    # SQL window-aggregate semantics at a NULL-value row:
                    # the running value SO FAR (pandas leaves NaN there) —
                    # forward-fill within the key; leading nulls stay null
                    # (an all-null prefix has an empty window → SQL NULL)
                    run = run.groupby(gid).ffill()
                arr = pa.array(run.to_numpy(), from_pandas=True)
            if not arr.type.equals(vtype) and not pa.types.is_null(vtype):
                arr = pc.cast(arr, vtype, safe=False)
            return t.append_column(out_col, arr)

        return hash_exchange(ds, by, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class ModePerGroupTransform(Transform):
    """Most frequent value per group, smallest value winning ties —
    the deterministic MODE the SQL oracle can replicate exactly
    (``row_number() OVER (... ORDER BY cnt DESC, v ASC) = 1``).

    Scale shape: same as CountDistinct — per-batch (group, value,
    count) partials collapse the shuffle to unique pairs per block;
    per bucket one count-sum + one lexsort argmax. NULL values are not
    candidates (SQL aggregate semantics); NULL groups are groups."""

    def __init__(self, group_by: str | Sequence[str], value_col: str,
                 out_col: str | None = None) -> None:
        self.group_by = [group_by] if isinstance(group_by, str) else list(group_by)
        self.value_col = value_col
        self.out_col = out_col or f"{value_col}_mode"

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        gb, vc, out_col = self.group_by, self.value_col, self.out_col
        cnt = "__cnt"

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[vc]))
            g = t.group_by(gb + [vc]).aggregate([([], "count_all")])
            return g.rename_columns(gb + [vc] + [cnt])

        pre = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            vtype = t.schema.field(vc).type
            if t.num_rows == 0:
                cols = {c: pa.array([], type=t.schema.field(c).type)
                        for c in gb}
                cols[out_col] = pa.array([], type=vtype)
                return pa.table(cols)
            t = t.group_by(gb + [vc]).aggregate([(cnt, "sum")])                 .rename_columns(gb + [vc] + [cnt])
            # sort groups asc, count DESC, value ASC → first row per
            # group IS the deterministic mode
            t = t.take(pc.sort_indices(
                t, sort_keys=[(c, "ascending") for c in gb] +
                [(cnt, "descending"), (vc, "ascending")]))
            kc = key_change_mask(
                [t[c] for c in gb], t.num_rows)
            idx = np.flatnonzero(kc)
            first = t.take(pa.array(idx))
            cols = {c: first[c] for c in gb}
            cols[out_col] = first[vc]
            return pa.table(cols)

        return hash_exchange(pre, gb, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class OrderedProductTransform(Transform):
    """Deterministic float product per group: values are sorted
    ascending inside each group and multiplied sequentially
    left-to-right — the exact rounding sequence DuckDB's
    ``product(v ORDER BY v)`` performs — so the result is bit-equal
    across engines regardless of block order. A plain partial-product
    exchange is 1-ulp order-sensitive, which flips 4-dp rounding on
    exact boundary values (0.79515 at sf0.1 — the round-5 sweep
    failure this transform fixes). Ties sort arbitrarily but equal
    factors commute bit-exactly, so ordering by value alone suffices.

    Scale shape: one hash exchange on the group keys shipping one
    float per row (an ordered fold cannot pre-combine — it needs the
    full sorted sequence); per bucket one Arrow sort +
    ``np.multiply.reduceat`` at the group starts (sequential within
    each segment; verified bit-equal to an explicit left fold and to
    DuckDB's ordered product through n=1000). NULL values are skipped
    (SQL aggregate semantics); a group whose values are ALL NULL is
    dropped rather than emitted as NULL — pair with a
    ``WHERE v IS NOT NULL`` oracle if that case can occur."""

    def __init__(self, group_by: str | Sequence[str], value_col: str,
                 out_col: str | None = None) -> None:
        self.group_by = [group_by] if isinstance(group_by, str) else list(group_by)
        self.value_col = value_col
        self.out_col = out_col or f"{value_col}_product"

    def apply(self, ds):
        import numpy as np

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        gb, vc, out_col = self.group_by, self.value_col, self.out_col

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            t = t.filter(pc.is_valid(t[vc]))
            if t.num_rows == 0:
                cols = {c: pa.array([], type=t.schema.field(c).type)
                        for c in gb}
                cols[out_col] = pa.array([], type=pa.float64())
                return pa.table(cols)
            t = t.take(pc.sort_indices(
                t, sort_keys=[(c, "ascending") for c in gb] +
                [(vc, "ascending")]))
            kc = key_change_mask([t[c] for c in gb], t.num_rows)
            starts = np.flatnonzero(kc)
            v = pc.cast(t[vc], pa.float64()).to_numpy()
            prod = np.multiply.reduceat(v, starts)
            first = t.take(pa.array(starts))
            cols = {c: first[c] for c in gb}
            cols[out_col] = pa.array(prod, type=pa.float64())
            return pa.table(cols)

        return hash_exchange(ds, gb, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


def _null_fill_scalar(t: pa.DataType):
    """A canonical in-type fill value used to make join keys null-safe
    (both sides fill NULL with the SAME value, and a companion
    is-valid column keeps filled rows distinguishable from real ones).
    Scalar types only — nested set-op keys raise."""
    import decimal

    if pa.types.is_boolean(t):
        return pa.scalar(False, t)
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return pa.scalar(0, t)
    if pa.types.is_decimal(t):
        return pa.scalar(decimal.Decimal(0), t)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", t)
    if pa.types.is_temporal(t):
        # date32/time32 only cast from int32 (int64->date32 raises
        # ArrowNotImplementedError); 64-bit temporals cast from int64
        src = pa.int32() if t.bit_width == 32 else pa.int64()
        return pa.array([0], src).cast(t)[0]
    raise TransformError(
        f"SetOpTransform: unsupported key type {t} (scalar types only)")


class SetOpTransform(Transform):
    """SQL ``EXCEPT`` / ``INTERSECT`` (DISTINCT set semantics) against
    another dataset over the full projected row.

    NULL semantics follow SQL set ops (``IS NOT DISTINCT FROM``): two
    rows with NULL in the same column compare EQUAL. A plain hash join
    would never match NULL keys, so each key column joins as a
    (null-filled value, is-valid flag) pair; original NULLs are
    restored after the join.

    Scale shape: the LEFT side distinct-collapses globally (the set-op
    output is distinct); the RIGHT side collapses per block only —
    semi/anti joins are duplicate-insensitive on the right, so a global
    right-side shuffle would be wasted work. Then ONE partitioned hash
    anti/semi join on all columns — never a broadcast of the big side,
    never raw duplicate rows through the shuffle."""

    def __init__(self, other, op: str = "except",
                 columns: Sequence[str] | None = None) -> None:
        if op not in ("except", "intersect"):
            raise TransformError("op must be 'except' or 'intersect'")
        self.other = other
        self.op = op
        self.columns = list(columns) if columns else None

    def apply(self, ds):
        from etlray.stages.joins import PartitionedHashJoinTransform

        other = self.other.read() if hasattr(self.other, "read")             else self.other
        cols = self.columns or ds.schema().names
        # declared types captured driver-side: a null-only block's local
        # schema degrades to pa.null() and would pick the wrong fill
        _s = ds.schema()
        ktypes = {n: t for n, t in zip(_s.names, _s.types) if n in cols}
        nn = {c: f"__nn_{c}" for c in cols}

        def null_safe(t: pa.Table) -> pa.Table:
            out = t.select(cols)
            for c in cols:
                typ = ktypes[c]
                col = out[c]
                if col.type != typ:
                    col = col.cast(typ)
                out = out.set_column(out.column_names.index(c), c,
                                     pc.fill_null(col, _null_fill_scalar(typ)))
                out = out.append_column(
                    nn[c], pc.cast(pc.is_valid(t[c]), pa.uint8()))
            return out

        join_cols = cols + [nn[c] for c in cols]
        left = DistinctTransform(join_cols).apply(
            ds.map_batches(null_safe, **self._mb_kwargs()))
        # right: per-block local distinct only (shrinks the shuffle;
        # right-side duplicates can't change semi/anti semantics)
        right = other.map_batches(
            lambda t: null_safe(t).group_by(join_cols).aggregate([]),
            **self._mb_kwargs())
        how = "left_anti" if self.op == "except" else "left_semi"
        joined = PartitionedHashJoinTransform(right, on=join_cols, how=how) \
            .apply(left)

        def restore_nulls(t: pa.Table) -> pa.Table:
            for c in cols:
                mask = pc.equal(t[nn[c]], pa.scalar(1, pa.uint8()))
                restored = pc.if_else(mask, t[c], pa.scalar(None, ktypes[c]))
                t = t.set_column(t.column_names.index(c), c, restored)
            return t.drop_columns([nn[c] for c in cols])

        return joined.map_batches(restore_nulls, **self._mb_kwargs())


class CountDistinctTransform(Transform):
    """Exact count(DISTINCT value) per group (SQL is the oracle).
    Scale shape: per-batch distinct (group, value) pairs first — the
    shuffle carries unique pairs per block, never raw rows — then one
    hash exchange on the group keys and a vectorized per-bucket
    distinct+count. Null values are not counted (SQL semantics);
    null group keys form their own group."""

    def __init__(self, group_by: str | Sequence[str], value_col: str,
                 out_col: str | None = None) -> None:
        self.group_by = [group_by] if isinstance(group_by, str) else list(group_by)
        self.value_col = value_col
        self.out_col = out_col or f"{value_col}_distinct"

    def apply(self, ds):
        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        gb, vc, out_col = self.group_by, self.value_col, self.out_col
        cols = gb + [vc]

        def local(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[vc]))
            return t.select(cols).group_by(cols).aggregate([])

        pre = ds.map_batches(local, **self._mb_kwargs())

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            t = t.group_by(cols).aggregate([])          # global distinct pairs
            g = t.group_by(gb).aggregate([([], "count_all")])
            return g.rename_columns(gb + [out_col])

        return hash_exchange(pre, gb, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class PivotTransform(Transform):
    """Pivot (long → wide aggregation): one output row per ``group_by``
    key, one column per listed ``values`` entry of ``pivot_col``,
    holding count(*) or sum(value_col) of the matching rows (SQL
    ``agg(...) FILTER (WHERE pivot = v)`` is the oracle). ``values``
    must be listed explicitly — discovering them would be a second
    full pass, and an unbounded pivot width is an anti-pattern at
    scale anyway.

    Scale shape: per-batch partial aggregate in LONG form (arrow
    group_by, ≤ groups·values rows per block), one hash exchange on
    the group keys, then sum-of-partials + the wide reshape per
    bucket. The shuffle never carries raw rows."""

    def __init__(self, group_by: str | Sequence[str], pivot_col: str,
                 values: Sequence, value_col: str | None = None,
                 agg: str = "count") -> None:
        if agg not in ("count", "sum"):
            raise TransformError(f"PivotTransform agg must be count|sum, got {agg}")
        if agg == "sum" and value_col is None:
            raise TransformError("PivotTransform(agg='sum') needs value_col")
        self.group_by = [group_by] if isinstance(group_by, str) else list(group_by)
        self.pivot_col = pivot_col
        self.values = list(values)
        self.value_col = value_col
        self.agg = agg

    def apply(self, ds):
        import pandas as pd

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        gb, pv, vals, agg = self.group_by, self.pivot_col, self.values, self.agg
        vc = self.value_col
        part_col = "__part"
        out_type = pa.int64() if agg == "count" else pa.float64()
        # declared key types captured driver-side (see GroupConcat)
        _s = ds.schema()
        ktypes = dict(zip(_s.names, _s.types))

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t[pv], value_set=pa.array(vals)))
            if agg == "count":
                g = t.group_by(gb + [pv]).aggregate([([], "count_all")])
                g = g.rename_columns(gb + [pv] + [part_col])
            else:
                g = t.group_by(gb + [pv]).aggregate([(vc, "sum")])
                g = g.rename_columns(gb + [pv] + [part_col])
            return g

        pre = ds.map_batches(partial, **self._mb_kwargs())

        col_names = [str(v) for v in vals]

        def widen(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            df = t.to_pandas()
            if len(df) == 0:
                empty = {c: pa.array([], type=t.schema.field(c).type) for c in gb}
                empty.update({c: pa.array([], type=out_type) for c in col_names})
                return pa.table(empty)
            # groupby(dropna=False) + unstack, NOT pivot_table: pandas
            # pivot_table silently DROPS NaN index keys, so a NULL
            # group vanished from the result while SQL GROUP BY (and
            # every sibling transform here) keeps it as its own group
            wide = df.groupby(gb + [pv], sort=False,
                              dropna=False)[part_col].sum() \
                .unstack(pv, fill_value=0)
            wide = wide.reindex(columns=vals, fill_value=0)
            wide.columns = col_names
            wide = wide.reset_index()
            # pin key types (a NULL int64 key promotes to float64 in
            # pandas — see GroupConcat above)
            cols = {}
            for c in gb:
                arr = pa.array(wide[c], from_pandas=True)
                want = ktypes[c]
                if not pa.types.is_null(want) and not arr.type.equals(want):
                    arr = pc.cast(arr, want, safe=False)
                cols[c] = arr
            for c in col_names:
                cols[c] = pa.array(pd.to_numeric(wide[c]).to_numpy(),
                                   type=out_type, from_pandas=True)
            return pa.table(cols)

        return hash_exchange(pre, gb, default_exchange_buckets(),
                             widen, bucket_col=None)


class UnionTransform(Transform):
    """Append other datasets (bag semantics, like SQL UNION ALL)."""

    def __init__(self, *others) -> None:
        self.others = list(others)

    def apply(self, ds):
        others = [(_o.read() if hasattr(_o, "read") else _o) for _o in self.others]
        return ds.union(*others)


class AsyncMapTransform(Transform):
    """Reference AsyncMapTransform (common.rs:63-88): per-row async
    closures joined concurrently — for I/O-bound per-row work (API
    calls etc.). Here: an asyncio event loop INSIDE each batch task
    gathers the coroutine per row; batches still flow in parallel
    across the cluster."""

    def __init__(self, async_fn, max_concurrency: int = 64) -> None:
        self.async_fn = async_fn
        self.max_concurrency = max_concurrency

    def apply(self, ds):
        fn, limit = self.async_fn, self.max_concurrency

        def mapper(t: pa.Table) -> pa.Table:
            import asyncio

            async def run_all(rows):
                sem = asyncio.Semaphore(limit)

                async def one(r):
                    async with sem:
                        return await fn(r)
                return await asyncio.gather(*[one(r) for r in rows])

            rows = t.to_pylist()
            out = asyncio.run(run_all(rows))
            return pa.Table.from_pylist(list(out))
        return ds.map_batches(mapper, **self._mb_kwargs())


def count_value_types(ds_or_table) -> dict[str, dict]:
    """Type census (reference DataFormatter.count_value_types,
    /root/reference/src/load/common.rs:52-74): per column → arrow type,
    null count, non-null count. Streams; never materializes rows."""
    import pyarrow as pa

    if isinstance(ds_or_table, pa.Table):
        batches = [ds_or_table]
    else:
        batches = ds_or_table.iter_batches(batch_format="pyarrow")
    out: dict[str, dict] = {}
    for t in batches:
        for name in t.column_names:
            col = t.column(name)
            d = out.setdefault(name, {"type": str(col.type), "nulls": 0, "values": 0})
            d["nulls"] += col.null_count
            d["values"] += len(col) - col.null_count
    return out


class ValidateTransform(Transform):
    """Row validation with per-stage error policy (reference trait
    Validator src/traits.rs + ErrorHandling config, src/config.rs:311-317).

    ``checks``: dict col → vectorized predicate fn(array) -> bool mask
    (True = valid). Policy: ``skip`` drops invalid rows, ``log`` keeps
    them and adds a ``__invalid`` flag column, ``fail`` raises on the
    first invalid row.
    """

    def __init__(self, checks: Mapping[str, Callable], policy: str = "skip") -> None:
        if policy not in ("skip", "fail", "log"):
            raise TransformError(f"unsupported validation policy: {policy}")
        self.checks = dict(checks)
        self.policy = policy

    def apply(self, ds):
        checks, policy = self.checks, self.policy

        def validate(t: pa.Table) -> pa.Table:
            mask = None
            for col, fn in checks.items():
                if col not in t.column_names:
                    continue
                m = fn(t.column(col))
                if isinstance(m, pa.ChunkedArray):
                    m = m.combine_chunks()
                m = pc.fill_null(m, False)
                mask = m if mask is None else pc.and_(mask, m)
            if mask is None:
                return t
            if policy == "skip":
                return t.filter(mask)
            if policy == "log":
                inv = pc.invert(mask)
                return t.append_column("__invalid",
                                       inv.combine_chunks()
                                       if isinstance(inv, pa.ChunkedArray) else inv)
            # pc.sum over an EMPTY mask is null (min_count=1) — coerce
            # to 0 so an empty block can't TypeError a clean pipeline
            n_ok = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            n_bad = t.num_rows - n_ok
            if n_bad:
                raise TransformError(f"validation failed for {n_bad} rows")
            return t
        return ds.map_batches(validate, **self._mb_kwargs())


def _json_to_i64(v) -> int:
    """DuckDB ``CAST(col->>'$.k' AS BIGINT)`` semantics for a decoded
    JSON value: integers pass through exactly, fractional values (and
    fractional numeric STRINGS) round half away from zero ('2.5' -> 3,
    '-2.5' -> -3), booleans and garbage raise like SQL's conversion
    error. Shared by both JsonScalarExtractTransform paths so they
    cannot drift."""
    import math

    if isinstance(v, bool):
        # DuckDB: ->> renders 'true'/'false', CAST to BIGINT errors
        raise ValueError(f"cannot cast JSON boolean to int64: {v}")
    if isinstance(v, int):
        return v
    if isinstance(v, str):
        try:
            return int(v)  # exact for integer strings, 2^53-safe
        except ValueError:
            v = float(v)  # raises on garbage, like SQL CAST
    return int(math.floor(v + 0.5)) if v >= 0 \
        else int(math.ceil(v - 0.5))


class JsonScalarExtractTransform(Transform):
    """Extract one top-level scalar field from a JSON-string column —
    SQL ``col->>'$.key'`` (DuckDB) is the oracle. Two paths:

    * default (``strict=False``): ONE Arrow C++ ``extract_regex`` per
      batch matches ``"key": <number|string|true|false|null>`` —
      zero per-row Python for numeric outputs (string outputs unescape
      matches in a Python pass). Assumes FLAT objects: a same-named
      key in a nested object or inside a string value would also
      match; use strict mode for such payloads.
    * ``strict=True``: per-row ``json.loads`` (correct for any shape,
      the documented slow baseline — same trade as the JPEG codec).

    ``out_type`` casts the extracted text (``'int64'``, ``'float64'``,
    ``'string'``); absent keys and JSON ``null`` yield NULL either
    way. String values are unescaped via ``json.loads`` only on the
    (string-typed) match itself.
    """

    def __init__(self, col: str, key: str, out_col: str | None = None,
                 out_type: str = "string", strict: bool = False) -> None:
        if out_type not in ("int64", "float64", "string"):
            raise TransformError(f"unsupported out_type: {out_type}")
        self.col = col
        self.key = key
        self.out_col = out_col or key
        self.out_type = out_type
        self.strict = strict

    def apply(self, ds):
        import json
        import re

        col, key, out = self.col, self.key, self.out_col
        want = {"int64": pa.int64(), "float64": pa.float64(),
                "string": pa.string()}[self.out_type]
        pattern = (
            '"' + re.escape(key) + '"\\s*:\\s*'
            '(?P<val>"(?:[^"\\\\]|\\\\.)*"'
            '|-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?'
            '|true|false|null)')
        strict = self.strict

        def extract(t: pa.Table) -> pa.Table:
            if strict:
                vals = []
                for s in t[col].to_pylist():
                    try:
                        v = json.loads(s).get(key) if s else None
                    except (ValueError, AttributeError):
                        v = None
                    if v is None:
                        vals.append(None)
                    elif want == pa.string():
                        vals.append(v if isinstance(v, str)
                                    else json.dumps(v))
                    elif want == pa.int64():
                        vals.append(_json_to_i64(v))
                    else:
                        vals.append(float(v))
                return t.append_column(out, pa.array(vals, type=want))
            m = pc.extract_regex(t[col], pattern)
            raw = pc.struct_field(m, "val")
            # JSON null -> SQL NULL
            raw = pc.if_else(pc.equal(raw, "null"),
                             pa.scalar(None, pa.string()), raw)
            if want == pa.string():
                # unescape only actual string values, via json.loads
                # on the matched literal itself
                vals = [None if v is None else
                        json.loads(v) if v.startswith('"') else v
                        for v in raw.to_pylist()]
                return t.append_column(out, pa.array(vals, pa.string()))
            quoted = pc.match_substring_regex(raw, '^"')
            raw = pc.if_else(pc.fill_null(quoted, False),
                             pc.utf8_trim(raw, '"'), raw)
            if want == pa.int64():
                # DuckDB CAST(text AS BIGINT): integer strings convert
                # EXACTLY (no float64 round trip — 2^53-safe), forms
                # with a fraction or exponent round HALF AWAY FROM
                # ZERO ('2.5' -> 3, '-2.5' -> -3); garbage raises
                none_s = pa.scalar(None, pa.string())
                frac = pc.fill_null(
                    pc.match_substring_regex(raw, "[.eE]"), False)
                ints = pc.cast(pc.if_else(frac, none_s, raw),
                               pa.int64())
                rounded = pc.cast(
                    pc.round(pc.cast(pc.if_else(frac, raw, none_s),
                                     pa.float64()),
                             round_mode="half_towards_infinity"),
                    pa.int64())
                return t.append_column(
                    out, pc.if_else(frac, rounded, ints))
            return t.append_column(out, pc.cast(raw, want))

        return ds.map_batches(extract, batch_format="pyarrow",
                              zero_copy_batch=True)
