"""Joins — covering the reference's declared-but-unimplemented Joiner
surface (/root/reference/src/traits.rs:109-125: JoinType
{Inner, Left, Right, Full, Cross}; no concrete impl exists in the
crate).

Two physical strategies:

* **BroadcastJoinTransform** — small side materialized once on the
  driver, shipped to the object store with ``ray.put`` ONCE, and
  joined per batch with pyarrow's hash-join kernel inside an
  actor-pool ``map_batches`` (the actor fetches the table in
  ``__init__``, not per batch). No shuffle; the right choice for
  dimension tables / lookups.
* **HashJoinTransform** — both sides large: Ray Data's native
  hash-partitioned ``Dataset.join`` (Ray 2.49).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

from etlray.errors import TransformError
from etlray.stages.common import Transform

_PA_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "left_semi": "left semi",
    "left_anti": "left anti",
}


class _BroadcastJoiner:
    """Per-batch join against the broadcast table. A plain TASK-pool
    callable, not an actor pool: the broadcast pa.Table is READ-ONLY
    and ``ray.get`` of it is a zero-copy shared-memory map after the
    object reaches a node — per-task fetch costs ~µs locally and the
    object still ships once per node on a cluster, so an actor pool
    would add its 1-2 s spin-up for nothing. (Actor pools stay the
    right tool for state that is expensive to DESERIALIZE — compiled
    regexes, models — not for plasma-resident Arrow/numpy.)"""

    def __init__(self, table_ref, keys: list[str], right_keys: list[str],
                 join_type: str, suffix: str) -> None:
        self.table_ref = table_ref
        self.keys = keys
        self.right_keys = right_keys
        self.join_type = join_type
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        small = ray.get(self.table_ref)  # zero-copy local read
        return batch.join(
            small,
            keys=self.keys,
            right_keys=self.right_keys,
            join_type=self.join_type,
            right_suffix=self.suffix,
        )


class BroadcastJoinTransform(Transform):
    """Join against a SMALL right side without a shuffle.

    ``right`` may be a pyarrow Table, pandas DataFrame, Dataset (will be
    materialized — must be small), or a source with ``read()``.
    """

    def __init__(
        self,
        right,
        on: str | Sequence[str],
        right_on: str | Sequence[str] | None = None,
        how: str = "inner",
        suffix: str = "_r",
        concurrency: int | tuple[int, int] = (1, 8),
    ) -> None:
        if how not in _PA_JOIN_TYPE:
            raise TransformError(f"unsupported join type: {how}")
        if how in ("right", "full"):
            # a per-batch join cannot express right/full outer: unmatched
            # RIGHT rows would be re-emitted once per input block
            # (phantom duplicates). Those modes need the shuffle join.
            raise TransformError(
                f"broadcast join cannot express how={how!r} (unmatched "
                "right-side rows would duplicate per block); use "
                "PartitionedHashJoinTransform instead")
        self.right = right
        self.keys = [on] if isinstance(on, str) else list(on)
        self.right_keys = (
            self.keys if right_on is None
            else ([right_on] if isinstance(right_on, str) else list(right_on))
        )
        self.how = how
        self.suffix = suffix
        self.concurrency = concurrency

    def _right_table(self) -> pa.Table:
        r = self.right
        if hasattr(r, "read"):
            r = r.read()
        if isinstance(r, pa.Table):
            return r
        try:
            import pandas as pd
            if isinstance(r, pd.DataFrame):
                return pa.Table.from_pandas(r, preserve_index=False)
        except ImportError:
            pass
        # assume Dataset — small side only (dimension table)
        return pa.Table.from_pandas(r.to_pandas(), preserve_index=False)

    def apply(self, ds):
        import ray

        table = self._right_table().combine_chunks()
        ref = ray.put(table)  # broadcast ONCE, not re-shipped per batch
        kw = self._mb_kwargs()
        return ds.map_batches(
            _BroadcastJoiner(ref, self.keys, self.right_keys,
                             _PA_JOIN_TYPE[self.how], self.suffix),
            **kw,
        )


class _SideTag:
    LEFT = 0
    RIGHT = 1


class PartitionedHashJoinTransform(Transform):
    """Explicit partitioned hash join for large×large inputs.

    Physical plan (the portable pattern from the Ray Data guide; Ray's
    built-in ``Dataset.join`` in 2.49 spins a heavyweight actor pool
    that is ~30× slower on mid-size inputs — measured 111 s vs 4 s at
    sf0.1):

    1. conform both sides to the union schema + a ``__side`` tag and a
       ``__jbucket`` hash of the join key (same stable SipHash as the
       CDC engine, so skew diagnostics line up);
    2. union → one ``groupby(__jbucket).map_groups``: every bucket gets
       both sides' rows in one Arrow table; split by tag and join with
       pyarrow's C++ hash-join kernel.

    One shuffle total, vectorized join per bucket, any join type pa
    supports (inner / left / right / full / semi / anti).
    """

    def __init__(
        self,
        right,
        on: str | Sequence[str],
        right_on: str | Sequence[str] | None = None,
        how: str = "inner",
        num_buckets: int | None = None,
        suffix: str = "_r",
        bloom_prefilter: bool = False,
        bloom_capacity: int = 1 << 20,
    ) -> None:
        if how not in _PA_JOIN_TYPE:
            raise TransformError(f"unsupported join type: {how}")
        if bloom_prefilter and how not in ("inner", "left_semi"):
            # dropping unmatched LEFT rows changes the result for
            # left/full/anti — the prefilter is only sound where they
            # are dropped anyway
            raise TransformError(
                f"bloom_prefilter is only valid for inner/semi joins, not {how!r}")
        self.right = right
        self.keys = [on] if isinstance(on, str) else list(on)
        self.right_keys = (self.keys if right_on is None else
                           ([right_on] if isinstance(right_on, str) else list(right_on)))
        self.how = how
        self.num_buckets = num_buckets
        self.suffix = suffix
        self.bloom_prefilter = bloom_prefilter
        self.bloom_capacity = bloom_capacity

    def _bloom_prefilter(self, ds, right):
        """Shuffle-byte saver for selective inner/semi joins: per-block
        Bloom sketches of the RIGHT keys OR-merge on the driver (bloom
        union == union bloom), broadcast once, and probe rows that
        can't match are dropped BEFORE the all-to-all exchange. False
        positives cost only shuffle bytes; there are no false
        negatives, so the per-bucket join output is unchanged."""
        import ray

        from etlray.functions.sketch import BloomFilter

        keys, right_keys = self.keys, self.right_keys
        # fixed capacity (no serial count() job over the right side);
        # keys beyond capacity only raise the false-positive rate —
        # correctness is unaffected, the join re-checks every pair
        nkeys = max(int(self.bloom_capacity), 1)

        def key_strings(t: pa.Table, cols) -> list:
            import pyarrow.compute as pc

            joined = pc.binary_join_element_wise(
                *[pc.cast(t.column(c), pa.string()) for c in cols], "\x1f")
            return joined.to_pylist()

        def block_bloom(t: pa.Table) -> pa.Table:
            bf = BloomFilter(nkeys)
            ks = [k for k in key_strings(t, right_keys) if k is not None]
            bf.add_array(ks)
            return pa.table({"bits": pa.array([bf.bits.tobytes()],
                                              type=pa.binary())})

        import numpy as np

        merged = BloomFilter(nkeys)
        for r in right.map_batches(block_bloom, batch_format="pyarrow",
                                   zero_copy_batch=True).take_all():
            part = BloomFilter(nkeys)
            part.bits = np.frombuffer(r["bits"], dtype=np.uint64).copy()
            merged.merge(part)
        ref = ray.put(merged)

        def prefilter(t: pa.Table) -> pa.Table:
            bf = ray.get(ref)  # zero-copy numpy from plasma
            mask = bf.contains_array(key_strings(t, keys))
            return t.filter(pa.array(mask))

        return ds.map_batches(prefilter, batch_format="pyarrow",
                              zero_copy_batch=True)

    def apply(self, ds):
        import pyarrow as pa

        from etlray.cdc.apply import stable_bucket

        right = self.right.read() if hasattr(self.right, "read") else self.right
        if self.bloom_prefilter:
            ds = self._bloom_prefilter(ds, right)
        nb = self.num_buckets
        if nb is None:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            nb = max(2 * ncpu, 8)

        ls, rs = ds.schema(), right.schema()
        lfields = list(zip(ls.names, ls.types))
        rfields = [(n, t) for n, t in zip(rs.names, rs.types)]
        # collision-free union schema (right non-key collisions suffixed)
        lnames = set(ls.names)
        rmap = {}
        for n, _t in rfields:
            rmap[n] = n + self.suffix if (n in lnames and n not in self.right_keys) else n
        union_fields = lfields + [(rmap[n], t) for n, t in rfields
                                  if rmap[n] not in ls.names]
        union_schema = pa.schema([pa.field(n, t) for n, t in union_fields]
                                 + [pa.field("__side", pa.int8())])
        lcols, rcols = [n for n, _ in lfields], [rmap[n] for n, _ in rfields]
        keys, right_keys = self.keys, self.right_keys
        jt = _PA_JOIN_TYPE[self.how]
        suffix = self.suffix

        def conform(side: int, rename: dict | None):
            def fn(t: pa.Table) -> pa.Table:
                if rename:
                    t = t.rename_columns([rename.get(c, c) for c in t.column_names])
                arrays = []
                for f in union_schema:
                    if f.name == "__side":
                        arrays.append(pa.array(
                            [side] * t.num_rows, type=pa.int8()))
                    elif f.name in t.column_names:
                        c = t[f.name]
                        arrays.append(c.combine_chunks()
                                      if isinstance(c, pa.ChunkedArray) else c)
                    else:
                        arrays.append(pa.nulls(t.num_rows, type=f.type))
                out = pa.Table.from_arrays(arrays, schema=union_schema)
                bkeys = keys if side == _SideTag.LEFT else [rmap[k] for k in right_keys]
                return out.append_column(
                    "__jbucket", pa.array(stable_bucket(out, bkeys, nb)))
            return fn

        tagged_l = ds.map_batches(conform(_SideTag.LEFT, None),
                                  batch_format="pyarrow", zero_copy_batch=True)
        tagged_r = right.map_batches(conform(_SideTag.RIGHT, rmap),
                                     batch_format="pyarrow", zero_copy_batch=True)
        both = tagged_l.union(tagged_r)

        rkeys_mapped = [rmap[k] for k in right_keys]

        def join_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if "__side" not in t.column_names:
                # every part feeding this bucket was a zero-column
                # empty block (Ray map_batches emits schema-less
                # empties; happens only when BOTH inputs are entirely
                # empty) — return a correctly-schema'd empty result
                names = lcols if jt in ("left semi", "left anti") else \
                    lcols + [c for c in rcols if c not in rkeys_mapped]
                return pa.table(
                    {n: pa.array([], type=union_schema.field(n).type)
                     for n in names})
            side = t.column("__side")
            lmask = pc.equal(side, 0)
            left_t = t.filter(lmask).select(lcols)
            right_t = t.filter(pc.invert(lmask)).select(rcols)
            joined = left_t.join(right_t, keys=keys, right_keys=rkeys_mapped,
                                 join_type=jt, right_suffix=suffix)
            return joined

        from etlray.exchange import hash_exchange

        return hash_exchange(both, keys, nb, join_bucket, bucket_col="__jbucket")


class HashJoinTransform(Transform):
    """Large×large: Ray Data native hash join (shuffles both sides).
    NOTE: measured far slower than PartitionedHashJoinTransform on this
    Ray version — kept for API parity; prefer the partitioned join."""

    def __init__(
        self,
        right,
        on: str | Sequence[str],
        right_on: str | Sequence[str] | None = None,
        how: str = "inner",
        num_partitions: int | None = None,
    ) -> None:
        self.right = right
        self.on = (on,) if isinstance(on, str) else tuple(on)
        self.right_on = None if right_on is None else (
            (right_on,) if isinstance(right_on, str) else tuple(right_on))
        self.how = how
        self.num_partitions = num_partitions

    def apply(self, ds):
        right = self.right.read() if hasattr(self.right, "read") else self.right
        num_partitions = self.num_partitions
        if num_partitions is None:
            # ~2× CPUs keeps every core busy without tiny-partition overhead
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            num_partitions = max(2 * ncpu, 8)
        return ds.join(
            right,
            join_type=self.how,
            num_partitions=num_partitions,
            on=self.on,
            right_on=self.right_on,
        )


class CrossJoinTransform(Transform):
    """Cross join (reference JoinType::Cross, src/traits.rs:117-124):
    broadcast the (small) right side and emit the cartesian product per
    batch. Guarded: right side must be small enough to broadcast."""

    def __init__(self, right, max_right_rows: int = 100_000) -> None:
        self.right = right
        self.max_right_rows = max_right_rows

    def apply(self, ds):
        import numpy as np
        import ray

        right = self.right.read() if hasattr(self.right, "read") else self.right
        if isinstance(right, pa.Table):
            rt = right
        else:
            rt = pa.Table.from_pandas(right.to_pandas(), preserve_index=False)
        if rt.num_rows > self.max_right_rows:
            raise TransformError(
                f"cross join right side too large to broadcast "
                f"({rt.num_rows} > {self.max_right_rows})")
        ref = ray.put(rt.combine_chunks())

        def cross(t: pa.Table) -> pa.Table:
            r = ray.get(ref)
            n, m = t.num_rows, r.num_rows
            li = np.repeat(np.arange(n), m)      # empty when n or m is 0
            ri = np.tile(np.arange(m), n)
            arrays = [t.column(i).take(pa.array(li)) for i in range(t.num_columns)]
            arrays += [r.column(i).take(pa.array(ri)) for i in range(r.num_columns)]
            return pa.Table.from_arrays(arrays, names=t.column_names + r.column_names)
        return ds.map_batches(cross, **self._mb_kwargs())


class AsofJoinTransform(Transform):
    """As-of join (nearest earlier match per key) — a custom operator
    Ray Data lacks (SURVEY.md: custom operators category; DuckDB's
    ASOF JOIN is the oracle).

    Physical plan: tag + conform both sides to a union schema, ONE
    hash_exchange on the ``by`` keys, then per bucket a pandas
    ``merge_asof`` over the time-sorted sides. Partitioning assumption:
    all rows of a ``by`` key land in one bucket (guaranteed by the
    exchange); time order is established per bucket by an in-memory
    sort, so no global sort is needed.
    """

    def __init__(self, right, on: str, by: str | Sequence[str],
                 direction: str = "backward", suffix: str = "_r",
                 num_buckets: int | None = None) -> None:
        self.right = right
        self.on = on
        self.by = [by] if isinstance(by, str) else list(by)
        self.direction = direction
        self.suffix = suffix
        self.num_buckets = num_buckets

    def apply(self, ds):
        import pandas as pd

        from etlray.exchange import hash_exchange

        right = self.right.read() if hasattr(self.right, "read") else self.right
        nb = self.num_buckets
        if nb is None:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            nb = max(ncpu, 8)

        ls, rs = ds.schema(), right.schema()
        on, by, suffix, direction = self.on, self.by, self.suffix, self.direction
        shared = set(ls.names) & set(rs.names)
        rmap = {n: (n + suffix if (n in shared and n != on and n not in by) else n)
                for n in rs.names}
        lcols = list(ls.names)
        rcols = [rmap[n] for n in rs.names]
        union_names = lcols + [c for c in rcols if c not in lcols] + ["__side"]
        ltypes = dict(zip(ls.names, ls.types))
        rtypes = {rmap[n]: t for n, t in zip(rs.names, rs.types)}

        def conform(side):
            def fn(t: pa.Table) -> pa.Table:
                if side == 1:
                    t = t.rename_columns([rmap.get(c, c) for c in t.column_names])
                arrays, fields = [], []
                for name in union_names:
                    if name == "__side":
                        arrays.append(pa.array([side] * t.num_rows, type=pa.int8()))
                        fields.append(pa.field(name, pa.int8()))
                    elif name in t.column_names:
                        c = t[name]
                        arrays.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
                        fields.append(pa.field(name, c.type))
                    else:
                        typ = ltypes.get(name, rtypes.get(name))
                        arrays.append(pa.nulls(t.num_rows, type=typ))
                        fields.append(pa.field(name, typ))
                return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
            return fn

        both = ds.map_batches(conform(0), batch_format="pyarrow", zero_copy_batch=True) \
            .union(right.map_batches(conform(1), batch_format="pyarrow",
                                     zero_copy_batch=True))

        # fixed output schema: every bucket (incl. empty ones) must emit
        # identical types or the downstream union silently promotes
        # (int64 → float64 was observed)
        out_fields = [pa.field(n, ltypes[n]) for n in lcols]
        out_fields += [pa.field(c, rtypes[c]) for c in rcols if c not in lcols]
        out_schema = pa.schema(out_fields)

        def asof_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            df = t.to_pandas()
            # NULL 'on' keys: pd.merge_asof REJECTS null merge keys
            # (ValueError) — drop them on both sides, matching the
            # interval join's notna() guard and SQL semantics (a NULL
            # timestamp can never satisfy the asof predicate)
            df = df[df[on].notna()]
            left = df[df["__side"] == 0][lcols].sort_values(on, kind="stable")
            rt = df[df["__side"] == 1][rcols].sort_values(on, kind="stable")
            if len(left) == 0:
                merged = left
            else:
                merged = pd.merge_asof(left, rt, on=on, by=by, direction=direction,
                                       suffixes=("", suffix))
            raw = pa.Table.from_pandas(merged, preserve_index=False)
            cols = []
            for f in out_schema:
                if f.name in raw.column_names:
                    c = raw[f.name]
                    if isinstance(c, pa.ChunkedArray):
                        c = c.combine_chunks()
                    if not c.type.equals(f.type):
                        c = _pc.cast(c, f.type, safe=False)
                else:
                    c = pa.nulls(raw.num_rows, type=f.type)
                cols.append(c)
            return pa.Table.from_arrays(cols, schema=out_schema)

        return hash_exchange(both, by, nb, asof_bucket, bucket_col=None)


class IntervalJoinTransform(Transform):
    """Range (interval) join — a custom operator Ray Data lacks
    (SURVEY.md custom-operators category; DuckDB's range predicate is
    the oracle): emit every (L, R) pair sharing the ``by`` key with
    ``R[on] ∈ [L[on] + lower, L[on] + upper]`` (inclusive bounds).

    Physical plan: tag + conform both sides to a union schema, ONE
    hash_exchange on the ``by`` keys, then per bucket a vectorized
    per-key sweep — right side sorted by time once, each key group's
    matches found with two ``np.searchsorted`` calls over the LEFT
    rows of that group, pairs materialized with the segmented-arange
    trick (O(output), no candidate cross-product). Partitioning
    assumption: all rows of a ``by`` key land in one bucket
    (guaranteed by the exchange); a pathologically hot key bounds a
    bucket's output at |L_key|·|R_key| — the inherent output size of
    the join — so salt hot keys upstream if that product is huge.
    """

    def __init__(self, right, on: str, by: str | Sequence[str],
                 lower, upper, suffix: str = "_r",
                 num_buckets: int | None = None) -> None:
        self.right = right
        self.on = on
        self.by = [by] if isinstance(by, str) else list(by)
        self.lower = lower
        self.upper = upper
        self.suffix = suffix
        self.num_buckets = num_buckets

    def apply(self, ds):
        import numpy as np
        import pandas as pd

        from etlray.exchange import hash_exchange

        right = self.right.read() if hasattr(self.right, "read") else self.right
        nb = self.num_buckets
        if nb is None:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            nb = max(ncpu, 8)

        ls, rs = ds.schema(), right.schema()
        on, by, suffix = self.on, self.by, self.suffix
        lower, upper = self.lower, self.upper
        shared = set(ls.names) & set(rs.names)
        rmap = {n: (n + suffix if (n in shared and n not in by) else n)
                for n in rs.names}
        lcols = list(ls.names)
        rcols = [rmap[n] for n in rs.names]
        ron = rmap[on]
        union_names = lcols + [c for c in rcols if c not in lcols] + ["__side"]
        ltypes = dict(zip(ls.names, ls.types))
        rtypes = {rmap[n]: t for n, t in zip(rs.names, rs.types)}

        def conform(side):
            def fn(t: pa.Table) -> pa.Table:
                if side == 1:
                    t = t.rename_columns([rmap.get(c, c) for c in t.column_names])
                arrays, fields = [], []
                for name in union_names:
                    if name == "__side":
                        arrays.append(pa.array([side] * t.num_rows, type=pa.int8()))
                        fields.append(pa.field(name, pa.int8()))
                    elif name in t.column_names:
                        c = t[name]
                        arrays.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
                        fields.append(pa.field(name, c.type))
                    else:
                        typ = ltypes.get(name, rtypes.get(name))
                        arrays.append(pa.nulls(t.num_rows, type=typ))
                        fields.append(pa.field(name, typ))
                return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
            return fn

        both = ds.map_batches(conform(0), batch_format="pyarrow", zero_copy_batch=True) \
            .union(right.map_batches(conform(1), batch_format="pyarrow",
                                     zero_copy_batch=True))

        out_fields = [pa.field(n, ltypes[n]) for n in lcols]
        out_fields += [pa.field(c, rtypes[c]) for c in rcols if c not in lcols]
        out_schema = pa.schema(out_fields)

        def interval_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            df = t.to_pandas()
            left = df[df["__side"] == 0]
            rt = df[df["__side"] == 1].sort_values(by + [ron], kind="stable")
            # null timestamps never match (SQL range-predicate
            # semantics) — and NaT poisons searchsorted ordering
            left = left[left[on].notna()]
            rt = rt[rt[ron].notna()]
            frames = []
            if len(left) and len(rt):
                r_groups = {k: g for k, g in rt.groupby(by, sort=False, dropna=True)}
                for k, lg in left.groupby(by, sort=False, dropna=True):
                    rg = r_groups.get(k)
                    if rg is None:
                        continue
                    l_on = lg[on].to_numpy()
                    r_on = rg[ron].to_numpy()
                    lo = np.searchsorted(r_on, l_on + lower, side="left")
                    hi = np.searchsorted(r_on, l_on + upper, side="right")
                    counts = hi - lo
                    total = int(counts.sum())
                    if total == 0:
                        continue
                    reps = np.repeat(np.arange(len(lg)), counts)
                    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
                    within = np.arange(total) - np.repeat(offs, counts)
                    ridx = lo[reps] + within
                    lt = lg.iloc[reps][lcols].reset_index(drop=True)
                    rcols_only = [c for c in rcols if c not in lcols]
                    rtab = rg.iloc[ridx][rcols_only].reset_index(drop=True)
                    frames.append(pd.concat([lt, rtab], axis=1))
            merged = (pd.concat(frames, ignore_index=True) if frames
                      else pd.DataFrame(columns=[f.name for f in out_schema]))
            raw = pa.Table.from_pandas(merged, preserve_index=False)
            cols = []
            for f in out_schema:
                if f.name in raw.column_names:
                    c = raw[f.name]
                    if isinstance(c, pa.ChunkedArray):
                        c = c.combine_chunks()
                    if not c.type.equals(f.type):
                        c = _pc.cast(c, f.type, safe=False)
                else:
                    c = pa.nulls(raw.num_rows, type=f.type)
                cols.append(c)
            return pa.Table.from_arrays(cols, schema=out_schema)

        return hash_exchange(both, by, nb, interval_bucket, bucket_col=None)
