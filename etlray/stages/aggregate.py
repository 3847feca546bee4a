"""Group-by aggregation — Ray-native hash aggregate with the
reference's naming and coercion semantics.

Reference: /root/reference/src/transform/common.rs:258-371 —
single-thread HashMap group-by; functions Count/Sum/Average/Min/Max/
First/Last over one value column each; output column named
``{col}_{func}`` lowercased (common.rs:363); Sum/Average/Min/Max
coerce values through ``as_float`` and emit Float; Sum of an empty /
all-null group is 0.0 while Average/Min/Max are Null
(common.rs:285-325); Count counts all present values incl. nulls
(i.e. group size for a typed column).

Deviations (documented, SURVEY.md §7.3):
* the reference accepts ``HashMap<col, func>`` — one function per
  column max; we accept a list of ``(col, func)`` pairs.
* reference First/Last order is HashMap-iteration-undefined; we define
  it as order of ``order_by`` (ascending) when given, else dataset
  block order (still nondeterministic after a shuffle — pass order_by).

Scale: the numeric path is two stages — a vectorized per-batch coerce
(``map_batches``) followed by Ray's hash ``groupby().aggregate(...)``,
which partially aggregates per block before the shuffle, so only one
row per (key, block) crosses the exchange.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from etlray.coerce import as_float
from etlray.errors import TransformError
from etlray.stages.common import Transform

_NUMERIC_FUNCS = {"sum", "average", "min", "max"}
_ALL_FUNCS = _NUMERIC_FUNCS | {"count", "first", "last"}


def _normalize(aggregations) -> list[tuple[str, str]]:
    if isinstance(aggregations, Mapping):
        pairs = [(c, f) for c, f in aggregations.items()]
    else:
        pairs = [(c, f) for c, f in aggregations]
    out = []
    for col, func in pairs:
        f = func.lower()
        if f in ("avg", "mean"):
            f = "average"
        if f not in _ALL_FUNCS:
            raise TransformError(f"unknown aggregate function: {func}")
        out.append((col, f))
    return out


class AggregateTransform(Transform):
    """``AggregateTransform(group_by=[...], aggregations=[(col, func), ...])``.

    Output columns: the group keys plus one ``{col}_{func}`` per pair.
    """

    def __init__(
        self,
        group_by: Sequence[str],
        aggregations: Mapping[str, str] | Sequence[tuple[str, str]],
        order_by: str | None = None,
        deterministic: bool = False,
        exact_int: bool = False,
    ) -> None:
        self.group_by = list(group_by)
        self.aggregations = _normalize(aggregations)
        self.order_by = order_by
        # exact_int=True skips the reference's as_float coercion and
        # aggregates the RAW columns: integer sums then stay int64 end
        # to end — associative, so bit-deterministic at any block order
        # and exactly comparable to SQL's integer aggregates. Caller
        # contract: the aggregated columns are already numeric (ints
        # for sums that must be exact).
        self.exact_int = exact_int
        # deterministic=True routes numeric aggs through the bucketed
        # exchange: each group is summed ONCE with numpy's pairwise
        # summation over a deterministically-ordered table, so float
        # results are reproducible across runs and parallelism levels
        # (Ray's native Sum accumulates partials in nondeterministic
        # block order — 1e8-scale float sums wobble past 4-decimal
        # rounding at high num_cpus). Use for low-cardinality summary
        # queries; the native path stays the default for high-cardinality.
        self.deterministic = deterministic

    # ------------------------------------------------------------------
    def apply(self, ds):
        if not self.group_by:
            return GlobalAggregateTransform(self.aggregations, self.order_by).apply(ds)
        needs_order = any(f in ("first", "last") for _, f in self.aggregations)
        if needs_order or self.deterministic:
            return self._apply_map_groups(ds)
        return self._apply_partial_exchange(ds)

    # ----- default path: arrow partials + one small exchange -----------
    def _apply_partial_exchange(self, ds):
        """Map-side combine: each block collapses to ≤|groups| partial
        rows with pyarrow's C++ hash aggregate, then ONE hash_exchange
        of those partials and an associative merge per bucket. The
        shuffle carries one row per (key, block) — at 100 TB the
        exchange is sized by group cardinality, not input rows.
        Measured vs Ray-native groupby().aggregate at sf0.1
        (pricing_summary, 322k rows, 6 groups): ~0.9 s vs ~1.6-2.8 s —
        Ray's sort-based shuffle machinery dominates small aggregates
        and its actor pool dominates large ones."""
        from etlray.exchange import hash_exchange
        from etlray.stages.common import default_exchange_buckets

        keys = list(self.group_by)
        # key/raw types pinned from the DRIVER-side schema, BEFORE the
        # float-shadow stage; None (schema-less empty input) → the
        # native path handles the degenerate case
        s = ds.schema()
        if s is None:
            return self._apply_native(ds)
        in_types = dict(zip(s.names, s.types))
        ds, shadow = self._coerce_stage(ds)
        exact_int = self.exact_int

        # one partial slot per distinct (source-col, arrow-fn); average
        # needs sum+count of the same source
        partials: list[tuple[str | None, str, str]] = []  # (src, fn, pname)
        seen: dict[tuple[str | None, str], str] = {}

        def slot(src: str | None, fn: str) -> str:
            k = (src, fn)
            if k not in seen:
                seen[k] = f"__p{len(seen)}"
                partials.append((src, fn, seen[k]))
            return seen[k]

        plan: list[tuple[str, str, str, dict]] = []  # (out_name, func, ...)
        for col, func in self.aggregations:
            name = f"{col}_{func}"
            src = None if func == "count" else shadow[col]
            if func == "count":
                plan.append((name, "count", slot(None, "count_all"), {}))
            elif func == "sum":
                plan.append((name, "sum", slot(src, "sum"), {}))
            elif func == "average":
                plan.append((name, "average", slot(src, "sum"),
                             {"cnt": slot(src, "count")}))
            elif func == "min":
                plan.append((name, "min", slot(src, "min"), {}))
            else:
                plan.append((name, "max", slot(src, "max"), {}))

        agg_list = [([], fn) if src is None else (src, fn)
                    for src, fn, _p in partials]
        pnames = [p for _s, _f, p in partials]

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(keys).aggregate(agg_list)
            return g.rename_columns(keys + pnames)

        pre = ds.map_batches(partial, **self._mb_kwargs())

        # pinned output schema (empty buckets / all-null blocks must not
        # skew the union)
        fields = [pa.field(k, in_types[k]) for k in keys]
        for col, func in self.aggregations:
            name = f"{col}_{func}"
            if func == "count":
                fields.append(pa.field(name, pa.int64()))
            elif exact_int:
                src_t = in_types[col]
                if func == "sum":
                    fields.append(pa.field(
                        name, pa.int64() if pa.types.is_integer(src_t)
                        else src_t))
                else:
                    fields.append(pa.field(
                        name, pa.float64() if func == "average" else src_t))
            else:
                fields.append(pa.field(name, pa.float64()))
        out_schema = pa.schema(fields)
        merge_fn = {"count_all": "sum", "sum": "sum", "count": "sum",
                    "min": "min", "max": "max"}
        merge_list = [(p, merge_fn[fn]) for _s, fn, p in partials]

        def reduce_bucket(t: pa.Table) -> pa.Table:
            from etlray.cdc.apply import BUCKET_COL

            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            if t.num_rows == 0:
                return out_schema.empty_table()
            g = t.group_by(keys).aggregate(merge_list)
            g = g.rename_columns(keys + pnames)
            cols = [g[k] for k in keys]
            names = list(keys)
            for name, func, p, extra in plan:
                want = out_schema.field(name).type
                if func == "count":
                    v = pc.fill_null(pc.cast(g[p], pa.int64()), 0)
                elif func == "sum":
                    # cast BEFORE the fill: an all-null block degrades
                    # its partial to pa.null(), which can't host a 0.
                    # safe=False: SQL CAST(BIGINT AS DOUBLE) rounds past
                    # 2^53 where Arrow's safe cast would RAISE — int
                    # sums above 2^53 are routine at scale
                    v = pc.fill_null(pc.cast(g[p], want, safe=False),
                                     pa.scalar(0).cast(want))
                elif func == "average":
                    cnt = pc.cast(g[extra["cnt"]], pa.float64(),
                                  safe=False)
                    v = pc.if_else(
                        pc.greater(cnt, 0.0),
                        pc.divide(pc.cast(g[p], pa.float64(),
                                          safe=False), cnt),
                        pa.scalar(None, pa.float64()))
                else:
                    v = g[p]
                if not v.type.equals(want):
                    v = pc.cast(v, want,
                                safe=not pa.types.is_floating(want))
                cols.append(v.combine_chunks()
                            if isinstance(v, pa.ChunkedArray) else v)
                names.append(name)
            out = pa.table(dict(zip(names, cols)))
            return out.cast(out_schema)

        return hash_exchange(pre, keys, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)

    # ----- fast path: built-in Ray aggregates --------------------------
    def _coerce_stage(self, ds):
        """Add float64 shadow columns for the numeric aggregations."""
        numeric_cols = sorted({c for c, f in self.aggregations if f in _NUMERIC_FUNCS})
        if not numeric_cols:
            return ds, {}
        if self.exact_int:
            # aggregate raw columns — no float shadow (see __init__)
            return ds, {c: c for c in numeric_cols}
        shadow = {c: f"__f_{c}" for c in numeric_cols}

        def coerce(t: pa.Table) -> pa.Table:
            for col, name in shadow.items():
                arr = as_float(t.column(col))
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                t = t.append_column(name, arr)
            return t
        return ds.map_batches(coerce, **self._mb_kwargs()), shadow

    def _apply_native(self, ds):
        from ray.data.aggregate import Count, Max, Mean, Min, Sum

        ds, shadow = self._coerce_stage(ds)
        aggs = []
        sum_names = []
        for col, func in self.aggregations:
            name = f"{col}_{func}"
            if func == "count":
                aggs.append(Count(alias_name=name))
            elif func == "sum":
                aggs.append(Sum(shadow[col], alias_name=name, ignore_nulls=True))
                sum_names.append(name)
            elif func == "average":
                aggs.append(Mean(shadow[col], alias_name=name, ignore_nulls=True))
            elif func == "min":
                aggs.append(Min(shadow[col], alias_name=name, ignore_nulls=True))
            elif func == "max":
                aggs.append(Max(shadow[col], alias_name=name, ignore_nulls=True))
        out = ds.groupby(self.group_by).aggregate(*aggs)
        if sum_names:
            keep_type = self.exact_int

            def fix_sum(t: pa.Table) -> pa.Table:
                # reference: Sum over empty/all-null group is 0.0, not
                # null (exact_int keeps the column's own type and fills
                # with integer 0 instead of casting to float)
                import pyarrow.compute as pc
                for name in sum_names:
                    idx = t.column_names.index(name)
                    col = t.column(idx)
                    if not keep_type:
                        # safe=False: int64 sums past 2^53 round (SQL
                        # CAST semantics) instead of raising
                        col = pc.cast(col, pa.float64(), safe=False)
                    col = pc.fill_null(col, pa.scalar(0).cast(col.type)
                                       if keep_type else 0.0)
                    t = t.set_column(idx, name, col.combine_chunks()
                                     if isinstance(col, pa.ChunkedArray) else col)
                return t
            out = out.map_batches(fix_sum, **self._mb_kwargs())
        return out

    # ----- general path: bucketed exchange (first/last) ----------------
    def _apply_map_groups(self, ds, num_buckets: int | None = None):
        """One hash_exchange on the group keys; the per-group python
        work runs inside each bucket's task (Ray's map_groups would
        cost ~0.13 s of task overhead PER GROUP)."""
        from etlray.stages.common import default_exchange_buckets

        num_buckets = num_buckets or default_exchange_buckets()
        import numpy as np
        import pandas as pd

        from etlray.exchange import hash_exchange

        group_by, aggregations, order_by = self.group_by, self.aggregations, self.order_by

        # fixed output schema so empty buckets don't skew the union
        s = ds.schema()
        in_types = dict(zip(s.names, s.types))
        fields = [pa.field(k, in_types[k]) for k in group_by]
        for col, func in aggregations:
            name = f"{col}_{func}"
            if func == "count":
                fields.append(pa.field(name, pa.int64()))
            elif func in ("first", "last"):
                fields.append(pa.field(name, in_types[col]))
            else:
                fields.append(pa.field(name, pa.float64()))
        out_schema = pa.schema(fields)

        def per_group(g: "pd.DataFrame") -> dict:
            if order_by is not None:
                g = g.sort_values(order_by, kind="stable")
            row: dict[str, Any] = {k: g[k].iloc[0] for k in group_by}
            for col, func in aggregations:
                name = f"{col}_{func}"
                if func == "count":
                    row[name] = int(len(g))
                elif func in ("first", "last"):
                    v = (g[col].iloc[0] if func == "first" else g[col].iloc[-1]) \
                        if len(g) else None
                    if v is not None and pd.isna(v):
                        v = None  # pandas promotes nullable ints to float+nan
                    if v is not None and pa.types.is_integer(in_types[col]):
                        v = int(v)
                    row[name] = v
                else:
                    vals = pd.to_numeric(g[col], errors="coerce").dropna() \
                        .to_numpy(dtype=np.float64)
                    if func == "sum":
                        row[name] = float(vals.sum()) if len(vals) else 0.0
                    elif func == "average":
                        row[name] = float(vals.mean()) if len(vals) else None
                    elif func == "min":
                        row[name] = float(vals.min()) if len(vals) else None
                    elif func == "max":
                        row[name] = float(vals.max()) if len(vals) else None
            return row

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return out_schema.empty_table()
            df = t.to_pandas()
            # dropna=False: null group keys form a group of their own,
            # matching the native Ray path and the reference's HashMap
            # group-by (common.rs:271 — key is the raw Value incl. Null)
            rows = [per_group(g)
                    for _k, g in df.groupby(group_by, sort=False, dropna=False)]
            return pa.Table.from_pylist(rows, schema=out_schema)

        return hash_exchange(ds, group_by, num_buckets, reduce_bucket,
                             bucket_col=None)


class GlobalAggregateTransform(Transform):
    """group_by=[] — single output row (reference common.rs:330-370)."""

    def __init__(
        self,
        aggregations: Mapping[str, str] | Sequence[tuple[str, str]],
        order_by: str | None = None,
        exact_int: bool = False,
    ) -> None:
        self.aggregations = _normalize(aggregations)
        self.order_by = order_by
        self.exact_int = exact_int

    def apply(self, ds):
        import ray.data

        needs_order = any(f in ("first", "last") for _, f in self.aggregations)
        if needs_order:
            # take first/last via limit; global order = dataset order
            raise TransformError("global first/last: use AggregateTransform with a "
                                 "synthetic constant key and order_by instead")
        from ray.data.aggregate import Count, Max, Mean, Min, Sum

        agg = AggregateTransform(["__k"], self.aggregations,
                                 exact_int=self.exact_int)
        ds2, shadow = agg._coerce_stage(ds)
        aggs = []
        sum_names = []
        for col, func in self.aggregations:
            name = f"{col}_{func}"
            if func == "count":
                aggs.append(Count(alias_name=name))
            elif func == "sum":
                aggs.append(Sum(shadow[col], alias_name=name, ignore_nulls=True))
                sum_names.append(name)
            elif func == "average":
                aggs.append(Mean(shadow[col], alias_name=name, ignore_nulls=True))
            elif func == "min":
                aggs.append(Min(shadow[col], alias_name=name, ignore_nulls=True))
            elif func == "max":
                aggs.append(Max(shadow[col], alias_name=name, ignore_nulls=True))
        res = ds2.aggregate(*aggs)  # dict
        for name in sum_names:
            if res.get(name) is None:
                res[name] = 0 if self.exact_int else 0.0
        return ray.data.from_items([res])


class QuantilePerGroupTransform(Transform):
    """Exact quantiles per group. ``interpolation="lower"`` (default)
    is DuckDB ``quantile_disc`` (element at index ``ceil(q·n) - 1`` of
    the sorted non-null values, verified empirically);
    ``interpolation="linear"`` is SQL ``percentile_cont`` / DuckDB
    ``quantile_cont`` (linear interpolation at position ``q·(n−1)``,
    output float64). Output: one row per group with a column per
    requested quantile (``names`` or ``q{percent}``).

    Scale shape: exact quantiles cannot be finalized map-side, but the
    shuffle input CAN be collapsed to (group, value, count) partials
    per block (arrow group_by) — the exchange then carries one row per
    distinct (group, value) per block instead of one per input row.
    Per bucket: sort the (value, count) runs, cumulative counts, and
    one searchsorted per quantile. All vectorized."""

    def __init__(self, group_by: str | Sequence[str], value_col: str,
                 qs: Sequence[float], names: Sequence[str] | None = None,
                 interpolation: str = "lower") -> None:
        if interpolation not in ("lower", "linear"):
            raise TransformError(
                "interpolation must be 'lower' (quantile_disc) or "
                "'linear' (percentile_cont)")
        self.interpolation = interpolation
        self.group_by = [group_by] if isinstance(group_by, str) else list(group_by)
        self.value_col = value_col
        self.qs = [float(q) for q in qs]
        self.names = (list(names) if names is not None
                      else [f"q{int(round(q * 100))}" for q in self.qs])
        if len(set(self.names)) != len(self.names):
            raise TransformError(
                f"quantile output names collide: {self.names} — pass "
                "explicit `names` for finer-grained quantiles")

    def apply(self, ds):
        import math

        import numpy as np
        import pandas as pd

        from etlray.cdc.apply import BUCKET_COL
        from etlray.exchange import hash_exchange

        gb, vc, qs, names = self.group_by, self.value_col, self.qs, self.names
        linear = self.interpolation == "linear"
        cnt = "__cnt"

        def partial(t: pa.Table) -> pa.Table:
            # NULL values stay as their own (group, NULL) run so a
            # group whose values are ALL NULL still reaches the reduce
            # and emits a NULL quantile row — SQL GROUP BY keeps the
            # group, quantile_cont/disc return NULL (review finding:
            # filtering here silently dropped such groups)
            g = t.group_by(gb + [vc]).aggregate([([], "count_all")])
            return g.rename_columns(gb + [vc] + [cnt])

        pre = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)

        def reduce_bucket(t: pa.Table) -> pa.Table:
            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            vtype = pa.float64() if linear else t.schema.field(vc).type
            if t.num_rows == 0:
                cols = {c: pa.array([], type=t.schema.field(c).type) for c in gb}
                cols.update({n: pa.array([], type=vtype) for n in names})
                return pa.table(cols)
            # merge partial runs, then per-group sorted sweep
            t = t.group_by(gb + [vc]).aggregate([(cnt, "sum")]) \
                .rename_columns(gb + [vc] + [cnt])
            t = t.take(pc.sort_indices(
                t, sort_keys=[(c, "ascending") for c in gb] +
                [(vc, "ascending")]))
            df = t.to_pandas()
            vcol = t[vc].combine_chunks() if isinstance(t[vc], pa.ChunkedArray) else t[vc]
            isnull = pc.is_null(vcol).to_numpy(zero_copy_only=False)
            # fill nulls BEFORE the numpy conversion so an int64 column
            # with nulls does not round-trip through float64 (which
            # would lose exactness above 2^53); the filled positions
            # are trimmed off the sweep below and never read
            if pa.types.is_integer(vcol.type):
                vals = pc.fill_null(vcol, pa.scalar(0, vcol.type)) \
                    .to_numpy(zero_copy_only=False)
            else:
                vals = vcol.to_numpy(zero_copy_only=False)
            counts = df[cnt].to_numpy()
            from etlray.stages.common import key_change_mask

            # arrow columns: exact key equality (int keys with nulls
            # would float-convert through pandas and can collapse
            # distinct keys past 2^53)
            change = key_change_mask([t[c] for c in gb], len(df))
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(df))
            out = {c: df[c].to_numpy()[starts] for c in gb}
            qcols = {n: np.zeros(len(starts),
                                 dtype=np.float64 if linear
                                 else vals.dtype)
                     for n in names}
            null_out = np.zeros(len(starts), dtype=bool)
            for gi, (s, e) in enumerate(zip(starts, ends)):
                # NULL runs sort to the end of the group (sort_indices
                # null_placement default); trim them off the sweep —
                # a group with ONLY null runs emits a NULL row
                e = e - int(isnull[s:e].sum())
                if e == s:
                    null_out[gi] = True  # zeros stay masked below
                    continue
                cum = np.cumsum(counts[s:e])
                n = int(cum[-1])
                for q, name in zip(qs, names):
                    if linear:
                        # percentile_cont: position q·(n−1) over the
                        # EXPANDED sorted values, interpolated between
                        # the two straddling elements (weighted runs:
                        # element at 0-based rank r is vals[
                        # searchsorted(cum, r+1)])
                        p = q * (n - 1)
                        lo = int(math.floor(p))
                        hi = int(math.ceil(p))
                        vlo = float(vals[s + int(np.searchsorted(
                            cum, lo + 1))])
                        vhi = float(vals[s + int(np.searchsorted(
                            cum, hi + 1))])
                        qcols[name][gi] = vlo + (vhi - vlo) * (p - lo)
                    else:
                        idx = max(math.ceil(q * n) - 1, 0)
                        pos = int(np.searchsorted(cum, idx + 1))
                        qcols[name][gi] = vals[s + pos]
            cols = {c: pa.array(out[c]) for c in gb}
            mask = null_out if null_out.any() else None
            for name in names:
                arr = pa.array(qcols[name], mask=mask)
                cols[name] = arr if vtype == pa.float64() \
                    else pc.cast(arr, vtype)
            return pa.table(cols)

        from etlray.stages.common import default_exchange_buckets

        return hash_exchange(pre, gb, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)


class RollupTransform(Transform):
    """SQL ``GROUP BY ROLLUP (c1, c2, …)``: the finest-level aggregate
    plus every prefix subtotal up to the grand total, with the rolled-
    away key columns NULL (exactly DuckDB's row shape, so the SQL
    oracle compares directly).

    Scale shape: the RAW data is scanned ONCE — the finest aggregate.
    Every coarser level re-aggregates the FINEST RESULT (|distinct
    key combos| rows, ≪ input by definition of an aggregate), so
    subtotals cost one tiny exchange each instead of a full pass per
    level. Only decomposable aggregations are accepted (sum, count,
    min, max — a subtotal is then sum-of-sums / sum-of-counts /
    min-of-mins / max-of-maxes over the finest partials); avg is the
    caller's ``sum/count`` division.
    """

    _REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    def __init__(self, group_by: Sequence[str],
                 aggregations: Sequence[tuple[str, str]],
                 mode: str = "rollup", exact_int: bool = False,
                 subtotals: str = "auto",
                 driver_row_limit: int = 2_000_000,
                 grouping_sets: Sequence[Sequence[str]] | None = None) -> None:
        if not group_by:
            raise TransformError("rollup needs at least one group column")
        if mode not in ("rollup", "cube", "sets"):
            raise TransformError("mode must be 'rollup', 'cube' or 'sets'")
        if mode == "sets":
            # GROUP BY GROUPING SETS ((...), ...): every listed set
            # must be ⊆ group_by; each derives from the same finest
            # aggregate (duplicate sets are deduplicated — list a set
            # once). The full set is emitted only if listed.
            if not grouping_sets:
                raise TransformError("mode='sets' needs grouping_sets")
            gbset = set(group_by)
            norm: list[tuple[str, ...]] = []
            for s in grouping_sets:
                extra = [c for c in s if c not in gbset]
                if extra:
                    raise TransformError(
                        f"grouping set columns {extra} not in group_by")
                key = tuple(c for c in group_by if c in set(s))
                if key not in norm:
                    norm.append(key)
            self.grouping_sets = norm
        elif grouping_sets is not None:
            raise TransformError("grouping_sets requires mode='sets'")
        else:
            self.grouping_sets = None
        bad = [f for _, f in aggregations if f not in self._REAGG]
        if bad:
            raise TransformError(
                f"rollup supports decomposable aggs {sorted(self._REAGG)}, "
                f"got {bad} (derive avg as sum/count)")
        if subtotals not in ("auto", "driver", "distributed"):
            raise TransformError("subtotals must be 'auto', 'driver' or "
                                 "'distributed'")
        self.group_by = list(group_by)
        self.aggregations = [(c, f) for c, f in aggregations]
        self.mode = mode
        # exact_int: integer inputs stay int64 through BOTH the finest
        # aggregate and every subtotal fold (see AggregateTransform)
        self.exact_int = exact_int
        # subtotals="driver" folds levels with Arrow group_by on the
        # driver — the finest table's row count is the distinct
        # key-combo count, small by definition of an aggregate, and a
        # Ray groupby job costs ~1 s of setup per level. "distributed"
        # re-aggregates the finest Dataset per level through Ray — for
        # combo cardinalities too large to hold on the driver. "auto"
        # (default) picks per run on the measured finest row count vs
        # driver_row_limit, so a pathological cardinality can never
        # silently land on the driver path (same auto-cutover shape as
        # dup_clusters(driver_pair_limit=...)).
        self.subtotals = subtotals
        self.driver_row_limit = int(driver_row_limit)

    def _empty_grand_total(self, ds, gb, aggs, out_names) -> pa.Table:
        """One grand-total row for an empty input: key columns NULL
        (typed from the INPUT schema — an empty groupby result has no
        usable output schema), count 0, sum 0 (int64 under exact_int,
        else float64), min/max NULL float64 (the non-exact aggregate
        path coerces numerics to float; exact_int keeps the raw type)."""
        s = ds.schema()
        in_types = dict(zip(s.names, s.types))
        cols: dict[str, pa.Array] = {
            c: pa.nulls(1, type=in_types.get(c, pa.null())) for c in gb}
        for n, (c, f) in zip(out_names, aggs):
            vtype = (in_types.get(c, pa.int64()) if self.exact_int
                     else pa.float64())
            if f == "count":
                cols[n] = pa.array([0], type=pa.int64())
            elif f == "sum":
                cols[n] = pa.array([0], type=vtype)
            else:  # min / max over nothing
                cols[n] = pa.nulls(1, type=vtype)
        return pa.table(cols).select(gb + out_names)

    def _subtotal_key_sets(self) -> list[tuple[str, ...]]:
        """ROLLUP: strict key prefixes, coarsest last. CUBE: every
        proper subset of the key set (SQL ``GROUP BY CUBE``). SETS:
        the listed grouping sets minus the full set (emitted as the
        finest directly when listed). Each derives from the same
        finest aggregate."""
        gb = self.group_by
        if self.mode == "sets":
            full = tuple(gb)
            return [s for s in self.grouping_sets if s != full]
        if self.mode == "rollup":
            return [tuple(gb[:k]) for k in range(len(gb) - 1, -1, -1)]
        from itertools import combinations

        out: list[tuple[str, ...]] = []
        for k in range(len(gb) - 1, -1, -1):
            out.extend(combinations(gb, k))
        return out

    def _emit_finest(self) -> bool:
        return self.mode != "sets" or tuple(self.group_by) in self.grouping_sets

    def apply(self, ds):
        from etlray.stages.common import UnionTransform

        gb, aggs = self.group_by, self.aggregations
        out_names = [f"{c}_{f}" for c, f in aggs]
        # materialize: the finest aggregate is small (it IS an
        # aggregate) and every coarser level re-consumes it — without
        # this each level would re-execute the full raw-data scan
        finest = AggregateTransform(gb, aggs, exact_int=self.exact_int) \
            .apply(ds).materialize()
        n_finest = finest.count()
        if n_finest == 0:
            # SQL GROUP BY ROLLUP/CUBE over an empty relation still
            # emits the grand-total row (grouping set ()): count 0,
            # sum per the engine's Sum-empty convention (0 int64 under
            # exact_int, else 0.0 — GlobalAggregateTransform parity),
            # min/max NULL. Without this the transform returned 0 rows
            # and diverged from the oracle on empty inputs. Checked
            # before the subtotal fold because neither fold path can
            # derive output types from an empty groupby result.
            # mode='sets': the grand-total row exists only if the
            # empty set () is LISTED; otherwise zero typed rows.
            import ray.data
            gt = self._empty_grand_total(ds, gb, aggs, out_names)
            if self.mode == "sets" and () not in self.grouping_sets:
                gt = gt.slice(0, 0)
            return ray.data.from_arrow(gt)

        # key column types (for typed NULLs on subtotal rows) and
        # aggregate column types (Ray's Sum re-aggregation returns
        # float64 even for int64 inputs — cast folded columns back so
        # the union doesn't promote every level to float)
        schema = finest.schema()
        ktypes = {n: t for n, t in zip(schema.names, schema.types)}
        atypes = {n: ktypes[n] for n in out_names}

        subtotals = self.subtotals
        if subtotals == "auto":
            subtotals = ("driver" if n_finest <= self.driver_row_limit
                         else "distributed")
        if subtotals == "distributed":
            return self._subtotals_distributed(finest, gb, aggs,
                                               out_names, ktypes, atypes)
        # subtotals fold ON THE DRIVER over the materialized finest
        # table (see __init__ for the trade)
        import ray.data

        fin = pa.concat_tables(
            [b for b in finest.iter_batches(batch_format="pyarrow")],
            promote_options="permissive")
        sub_tables: list[pa.Table] = []
        for keep in self._subtotal_key_sets():
            keep = list(keep)
            # fold the finest: {col}_{func} columns re-aggregate with
            # the level-up function (count folds by SUM)
            g = fin.group_by(keep).aggregate(
                [(n, self._REAGG[f])
                 for n, (_, f) in zip(out_names, aggs)])
            for n, (_, f) in zip(out_names, aggs):
                folded = f"{n}_{self._REAGG[f]}"
                idx = g.column_names.index(folded)
                col = pc.cast(g.column(idx), atypes[n])
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                g = g.set_column(idx, n, col)
            for c in gb:
                if c not in keep:
                    g = g.append_column(c, pa.nulls(g.num_rows,
                                                    type=ktypes[c]))
            sub_tables.append(g.select(gb + out_names))
        if not sub_tables:
            return finest
        subs = ray.data.from_arrow(pa.concat_tables(sub_tables))
        if not self._emit_finest():
            return subs
        return UnionTransform(subs).apply(finest)

    def _subtotals_distributed(self, finest, gb, aggs, out_names,
                               ktypes, atypes):
        """Per-level Ray re-aggregation of the finest Dataset — the
        ``subtotals="distributed"`` path for combo cardinalities too large
        to fold on the driver. Identical output to the driver fold (the
        equality pytest enforces it); costs one Ray groupby job per level."""
        from etlray.stages.common import UnionTransform

        levels = []
        for keep in self._subtotal_key_sets():
            keep = list(keep)
            re_aggs = [(n, self._REAGG[f])
                       for n, (_, f) in zip(out_names, aggs)]
            ei = self.exact_int
            lvl = AggregateTransform(keep, re_aggs, exact_int=ei) \
                .apply(finest) if keep \
                else GlobalAggregateTransform(re_aggs, exact_int=ei) \
                .apply(finest)

            def finish(t: pa.Table, _keep=tuple(keep)) -> pa.Table:
                for n, (_, f) in zip(out_names, aggs):
                    folded = f"{n}_{self._REAGG[f]}"
                    if folded in t.column_names:
                        idx = t.column_names.index(folded)
                        col = pc.cast(t.column(idx), atypes[n])
                        if isinstance(col, pa.ChunkedArray):
                            col = col.combine_chunks()
                        t = t.set_column(idx, n, col)
                for c in gb:
                    if c not in _keep:
                        t = t.append_column(c, pa.nulls(t.num_rows,
                                                        type=ktypes[c]))
                return t.select(gb + out_names)

            levels.append(lvl.map_batches(finish, batch_format="pyarrow"))
        out = finest if self._emit_finest() else None
        for extra in levels:
            out = extra if out is None else UnionTransform(extra).apply(out)
        return out if out is not None else finest


class CorrStatsTransform(Transform):
    """Per-group Pearson correlation + population covariance of two
    INTEGER-VALUED columns, computed from EXACT int64 partial sums —
    the bit-determinism companion to ``exact_int`` sums. A naive
    streaming-float corr accumulates partials in nondeterministic
    block order, so its low bits wobble across runs/parallelism and
    can never hash-match a SQL oracle; here every moment (n, Σx, Σy,
    Σxy, Σx², Σy²) is an exact integer, and the closed forms

        corr      = num / (sqrt(denx) · sqrt(deny))
        covar_pop = num / n²
        num  = n·Σxy − Σx·Σy
        denx = n·Σx² − (Σx)²,  deny = n·Σy² − (Σy)²

    are evaluated with ONE IEEE op per node (int→double cast, sqrt,
    mul, div — each correctly rounded in both engines), so the float64
    output is bit-equal to a SQL oracle that writes the same
    expression over integer SUMs. Zero-variance groups emit NULL corr
    (mirror the SQL with a CASE, not a 0/0).

    Caller contract: x/y are non-null integer-valued columns (route
    decimals through the shared round-to-int scaling first) and every
    intermediate — per-group n·Σx² and the like — fits int64;
    ``multiply_checked`` raises rather than wrapping if a batch
    violates the square/product bound. For bit-equality the moments
    must also stay below 2^53 (exact int→double); that holds through
    sf0.1-scale groups of small ints by orders of magnitude.

    Scale shape: one vectorized product stage (map_batches), then the
    shared partial-exchange aggregate — the shuffle carries one
    6-moment row per (group, block) — then a driver-light finish over
    the ≤|groups| result rows (Python-int bigint math on a handful of
    rows, not a data-sized loop).

    ``with_regression=True`` adds ``regr_slope`` (num/denx — one
    division over exact casts) and ``regr_intercept`` (ȳ − slope·x̄,
    evaluated as ``(Σy − slope·Σx)/n`` — mul, sub, div over already-
    identical doubles, so still bit-equal; the all-integer single-
    division form would push numerators past 2^53 where HUGEINT→double
    rounding is engine-defined). Zero-variance x → NULL slope and
    intercept, mirroring SQL regr_slope."""

    def __init__(self, group_by: Sequence[str], x_col: str, y_col: str,
                 n_col: str = "n", corr_col: str = "corr",
                 covar_col: str = "covar_pop",
                 with_regression: bool = False) -> None:
        self.group_by = list(group_by)
        self.x_col = x_col
        self.y_col = y_col
        self.n_col = n_col
        self.corr_col = corr_col
        self.covar_col = covar_col
        self.with_regression = with_regression

    def apply(self, ds):
        gb, x, y = self.group_by, self.x_col, self.y_col
        n_col, corr_col, covar_col = self.n_col, self.corr_col, self.covar_col
        with_regression = self.with_regression
        xy, x2, y2 = "__xy", "__x2", "__y2"

        def prods(t: pa.Table) -> pa.Table:
            xa = pc.cast(t[x], pa.int64())
            ya = pc.cast(t[y], pa.int64())
            if isinstance(xa, pa.ChunkedArray):
                xa = xa.combine_chunks()
            if isinstance(ya, pa.ChunkedArray):
                ya = ya.combine_chunks()
            # replace x/y with their int64 casts so Σx/Σy aggregate as
            # exact integers too — summing a float-typed (but
            # integer-valued) source column would mix block-order-
            # dependent float partial sums into the exact moments
            t = t.set_column(t.column_names.index(x), x, xa)
            t = t.set_column(t.column_names.index(y), y, ya)
            t = t.append_column(xy, pc.multiply_checked(xa, ya))
            t = t.append_column(x2, pc.multiply_checked(xa, xa))
            return t.append_column(y2, pc.multiply_checked(ya, ya))

        ds = ds.map_batches(prods, batch_format="pyarrow",
                            zero_copy_batch=True)
        agg = AggregateTransform(
            gb, [(x, "count"), (x, "sum"), (y, "sum"),
                 (xy, "sum"), (x2, "sum"), (y2, "sum")],
            exact_int=True).apply(ds)

        def finish(t: pa.Table) -> pa.Table:
            import math

            n = t[f"{x}_count"].to_pylist()
            sx = t[f"{x}_sum"].to_pylist()
            sy = t[f"{y}_sum"].to_pylist()
            sxy = t[f"{xy}_sum"].to_pylist()
            sx2 = t[f"{x2}_sum"].to_pylist()
            sy2 = t[f"{y2}_sum"].to_pylist()
            corr, covar, slope, intercept = [], [], [], []
            for i in range(t.num_rows):
                num = n[i] * sxy[i] - sx[i] * sy[i]
                denx = n[i] * sx2[i] - sx[i] * sx[i]
                deny = n[i] * sy2[i] - sy[i] * sy[i]
                if denx == 0 or deny == 0:
                    corr.append(None)
                else:
                    corr.append(float(num)
                                / (math.sqrt(float(denx))
                                   * math.sqrt(float(deny))))
                covar.append(float(num) / float(n[i] * n[i]))
                if denx == 0:
                    slope.append(None)
                    intercept.append(None)
                else:
                    b = float(num) / float(denx)
                    slope.append(b)
                    intercept.append((float(sy[i]) - b * float(sx[i]))
                                     / float(n[i]))
            out = t.select(gb)
            out = out.append_column(n_col, pa.array(n, type=pa.int64()))
            out = out.append_column(corr_col,
                                    pa.array(corr, type=pa.float64()))
            out = out.append_column(covar_col,
                                    pa.array(covar, type=pa.float64()))
            if with_regression:
                out = out.append_column(
                    "regr_slope", pa.array(slope, type=pa.float64()))
                out = out.append_column(
                    "regr_intercept",
                    pa.array(intercept, type=pa.float64()))
            return out

        return agg.map_batches(finish, batch_format="pyarrow")


_UFUNC_AGGS: dict[str, tuple[str, Any, str]] = {
    # fn -> (numpy ufunc name — associative+commutative, looked up
    #        lazily so numpy import stays off module load —, identity,
    #        value kind)
    "bit_and": ("bitwise_and", -1, "int"),
    "bit_or": ("bitwise_or", 0, "int"),
    "bit_xor": ("bitwise_xor", 0, "int"),
    "product": ("multiply", 1.0, "float"),
    "bool_and": ("bitwise_and", 1, "bool"),
    "bool_or": ("bitwise_or", 0, "bool"),
}


class UfuncAggTransform(Transform):
    """Per-group aggregates whose combine step is an associative,
    commutative ufunc — SQL ``bit_and / bit_or / bit_xor``, ``product``
    and ``bool_and / bool_or`` (DuckDB names; each is the oracle).
    Beyond the reference surface (its AggregateTransform stops at
    count/sum/avg/min/max — /root/reference/src/transform/common.rs:
    258-371); added because fold-style reductions are the natural next
    family once the partial-exchange shape exists.

    NULL semantics probed against DuckDB: NULLs are ignored
    (``bool_and(TRUE, NULL) = TRUE``); an empty or all-NULL group
    yields NULL. Output column ``{col}_{fn}``; ``bit_*`` emit int64
    (inputs cast from any integer width; two's-complement matches SQL),
    ``product`` float64, ``bool_*`` bool.

    Scale shape: identical to AggregateTransform's partial-exchange
    path — every block collapses to one row per (group, block) with a
    single argsort + ``ufunc.reduceat`` sweep, ONE hash exchange moves
    those partials, and the same kernel merges each bucket (all six
    folds compose: and-of-ands, product-of-products, ...). The shuffle
    is sized by group cardinality, never input rows.
    """

    def __init__(self, group_by: str | Sequence[str],
                 aggregations: Sequence[tuple[str, str]],
                 batch_size: int | None = None) -> None:
        self.group_by = ([group_by] if isinstance(group_by, str)
                         else list(group_by))
        if not self.group_by:
            raise TransformError("UfuncAggTransform needs group keys")
        self.aggregations = []
        for col, fn in aggregations:
            f = fn.lower()
            if f not in _UFUNC_AGGS:
                raise TransformError(
                    f"unknown ufunc aggregate: {fn} "
                    f"(supported: {sorted(_UFUNC_AGGS)})")
            self.aggregations.append((col, f))
        self.batch_size = batch_size

    @staticmethod
    def _op(fn: str):
        import numpy as np

        return getattr(np, _UFUNC_AGGS[fn][0])

    def apply(self, ds):
        from etlray.exchange import hash_exchange
        from etlray.stages.common import default_exchange_buckets

        keys = list(self.group_by)
        aggs = list(self.aggregations)
        s = ds.schema()
        if s is None:
            raise TransformError("UfuncAggTransform: input has no schema")
        in_types = dict(zip(s.names, s.types))
        missing = [c for c in keys + [c for c, _ in aggs]
                   if c not in in_types]
        if missing:
            raise TransformError(f"UfuncAggTransform: missing {missing}")

        fields = [pa.field(k, in_types[k]) for k in keys]
        for col, fn in aggs:
            kind = _UFUNC_AGGS[fn][2]
            t = {"int": pa.int64(), "float": pa.float64(),
                 "bool": pa.bool_()}[kind]
            fields.append(pa.field(f"{col}_{fn}", t))
        out_schema = pa.schema(fields)
        op_of, ident_of, kind_of = self._op, {}, {}
        for col, fn in aggs:
            _u, ident, kind = _UFUNC_AGGS[fn]
            ident_of[(col, fn)] = ident
            kind_of[(col, fn)] = kind

        def collapse(t: pa.Table) -> pa.Table:
            """One row per group: fold each agg column with its ufunc.

            Used for BOTH stages — the per-block partial reads raw
            input columns, the per-bucket merge reads partial columns
            (same names, same fold; "output NULL iff every input is
            NULL" composes across stages because a NULL partial marks
            an all-NULL block)."""
            import numpy as np

            if t.num_rows == 0:
                return out_schema.empty_table()
            if len(keys) == 1:
                karr = t[keys[0]]
                if isinstance(karr, pa.ChunkedArray):
                    karr = karr.combine_chunks()
                # NULL keys form one group (SQL GROUP BY): sentinel -1
                # BEFORE the numpy cast — null indices otherwise surface
                # as NaN in float64 and NaN->int64 is platform-defined
                codes = pc.fill_null(
                    karr.dictionary_encode().indices, -1).to_numpy(
                    zero_copy_only=False).astype(np.int64)
            else:
                import pandas as pd

                mi = pd.MultiIndex.from_arrays(
                    [t[k].to_numpy(zero_copy_only=False) for k in keys])
                codes, _uniq = pd.factorize(mi, use_na_sentinel=False)
                codes = np.asarray(codes, dtype=np.int64)
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(sc)) + 1))
            first_idx = pa.array(order[starts])
            cols = {k: pc.take(t[k], first_idx) for k in keys}
            for colname, fn in aggs:
                # merge stage reads the partial column {col}_{fn}; the
                # partial stage reads the raw column
                src = (f"{colname}_{fn}"
                       if f"{colname}_{fn}" in t.column_names else colname)
                arr = t[src]
                kind = kind_of[(colname, fn)]
                ident = ident_of[(colname, fn)]
                cast_t = {"int": pa.int64(), "float": pa.float64(),
                          "bool": pa.uint8()}[kind]
                valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                vals = pc.fill_null(pc.cast(arr, cast_t), ident) \
                    .to_numpy(zero_copy_only=False)
                red = op_of(fn).reduceat(vals[order], starts)
                nv = np.add.reduceat(
                    valid[order].astype(np.int64), starts)
                mask = nv == 0
                if kind == "bool":
                    out = pa.array(red.astype(bool), mask=mask)
                else:
                    out = pa.array(red, mask=mask)
                cols[f"{colname}_{fn}"] = out
            return pa.table(cols).cast(out_schema)

        pre = ds.map_batches(collapse, **self._mb_kwargs())

        def reduce_bucket(t: pa.Table) -> pa.Table:
            from etlray.cdc.apply import BUCKET_COL

            if BUCKET_COL in t.column_names:
                t = t.drop_columns([BUCKET_COL])
            return collapse(t)

        return hash_exchange(pre, keys, default_exchange_buckets(),
                             reduce_bucket, bucket_col=None)
