"""hash_exchange — explicit all-to-all bucket shuffle built from raw
Ray tasks (the one place the Dataset API genuinely can't express the
semantics efficiently: Ray 2.49's ``groupby().map_groups`` costs
~0.13 s *per group* and ``repartition(keys=...)`` requires the
hash-shuffle actor pool with ~10 s spin-up — measured in
/tmp/join_prof.py; both dwarf the actual work on mid-size data and add
per-epoch latency at any size).

Plan::

    input Dataset (already partially combined per block)
      └─ iter block refs (streaming)
           └─ split task per block: bucket rows by stable hash → nb sub-tables
                └─ gather task per bucket: concat sub-tables → reduce_fn → block
                     └─ ray.data.from_arrow_refs(blocks)

Properties:
* one task per input block + one per bucket — no actor pools, no sort;
* object-store exchange only (sub-tables never touch the driver);
* deterministic bucketing (same SipHash as the CDC engine) so the
  bucket id doubles as the checkpoint partition id;
* every gather sees its ENTIRE bucket in one call → reduce_fn can be
  a vectorized whole-partition kernel (LWW reduce, pa join, dedup).

Skew note: the caller is expected to pre-combine per block (e.g. the
CDC combiner) so a Zipf-hot key contributes ≤1 row per input block;
the gather for a hot bucket then holds O(blocks) rows, not O(events).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyarrow as pa

from etlray.cdc.apply import BUCKET_COL, stable_bucket


def _split_block(table: pa.Table, keys: list[str], num_buckets: int,
                 precomputed_col: str | None,
                 pre_fn: Callable[[pa.Table], pa.Table] | None = None) -> list[pa.Table]:
    import numpy as np

    if pre_fn is not None:
        # map-side fusion: conform/filter/combine run INSIDE the split
        # task — one object-store round trip per block instead of one
        # per pipeline stage
        table = pre_fn(table)
    if table.num_rows == 0:
        return [table] * num_buckets
    if precomputed_col and precomputed_col in table.column_names:
        buckets = table.column(precomputed_col).to_numpy(zero_copy_only=False)
    else:
        buckets = stable_bucket(table, keys, num_buckets)
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = table.take(pa.array(order))
    sorted_buckets = buckets[order]
    bounds = np.searchsorted(sorted_buckets, np.arange(num_buckets + 1))
    return [sorted_tbl.slice(bounds[b], bounds[b + 1] - bounds[b])
            for b in range(num_buckets)]


def _gather_bucket(reduce_fn, bucket_id: int, pass_bucket_id: bool,
                   *parts: pa.Table) -> pa.Table:
    tables = [p for p in parts if p.num_rows > 0]
    if not tables:
        # empty buckets still run reduce_fn so every output block has
        # the REDUCED schema (from_arrow_refs requires uniform schemas)
        merged = parts[0].slice(0, 0) if parts else pa.table({})
    else:
        merged = pa.concat_tables(tables, promote_options="permissive")
    if BUCKET_COL not in merged.column_names:
        merged = merged.append_column(
            BUCKET_COL, pa.array([bucket_id] * merged.num_rows, type=pa.int32()))
    if reduce_fn is None:
        return merged
    return reduce_fn(merged, bucket_id) if pass_bucket_id else reduce_fn(merged)


def hash_exchange(
    ds,
    keys: Sequence[str],
    num_buckets: int,
    reduce_fn: Callable[[pa.Table], pa.Table] | None = None,
    bucket_col: str | None = BUCKET_COL,
    pass_bucket_id: bool = False,
    as_refs: bool = False,
    pre_fn: Callable[[pa.Table], pa.Table] | None = None,
):
    """Shuffle ``ds`` so each of ``num_buckets`` hash partitions of
    ``keys`` is reduced by ONE ``reduce_fn(table)`` call; returns the
    reduced Dataset (one block per bucket, carrying ``bucket_col``).

    ``ds`` may also be a LIST of Datasets (their blocks shuffle
    together without needing a schema-matching union — ``pre_fn`` can
    conform them per block). ``pre_fn`` runs inside each split task
    (map-side fusion). ``pass_bucket_id=True`` calls
    ``reduce_fn(table, bucket_id)`` — needed when an EMPTY bucket must
    still know which bucket it is (the CDC writer's carry-forward)."""
    import ray
    import ray.data

    keys = list(keys)
    split = ray.remote(num_returns=num_buckets)(_split_block)
    gather = ray.remote(_gather_bucket)

    datasets = ds if isinstance(ds, (list, tuple)) else [ds]
    # stream input block refs; submit one split task per block
    per_bucket: list[list] = [[] for _ in range(num_buckets)]
    for d in datasets:
        for bundle in d.iter_internal_ref_bundles():
            for block_ref in bundle.block_refs:
                out = split.remote(block_ref, keys, num_buckets, bucket_col,
                                   pre_fn)
                if num_buckets == 1:
                    out = [out]
                for b in range(num_buckets):
                    per_bucket[b].append(out[b])

    reduced = [gather.remote(reduce_fn, b, pass_bucket_id, *refs)
               for b, refs in enumerate(per_bucket) if refs]
    if as_refs:
        # caller ray.get()s the (small) reduced tables directly — skips
        # spinning a second Dataset executor just to read tiny stats
        return reduced
    if not reduced:
        return datasets[0]
    return ray.data.from_arrow_refs(reduced)


def _split_file(path: str, row_groups: list[int], keys: list[str],
                num_buckets: int, bucket_col: str | None,
                pre_fn) -> list[pa.Table]:
    """Split task that READS its own parquet row groups — no Ray Data
    pipeline, no driver streaming: the driver only lists footer
    metadata and submits one task per row-group chunk."""
    import pyarrow.parquet as pq

    table = pq.ParquetFile(path).read_row_groups(row_groups)
    return _split_block(table, keys, num_buckets, bucket_col, pre_fn)


def hash_exchange_files(
    paths: Sequence[str],
    keys: Sequence[str],
    num_buckets: int,
    reduce_fn=None,
    bucket_col: str | None = BUCKET_COL,
    pass_bucket_id: bool = False,
    as_refs: bool = False,
    pre_fn=None,
    rows_per_task: int = 200_000,
):
    """File-direct variant of hash_exchange: for each parquet file the
    driver reads ONLY the footer, chunks row groups into ~rows_per_task
    units, and submits self-reading split tasks. Removes the Ray Data
    executor + driver ref-streaming from the critical path entirely
    (the measured ~severals-of-seconds serial floor per epoch)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    keys = list(keys)
    split = ray.remote(num_returns=num_buckets)(_split_file)
    gather = ray.remote(_gather_bucket)

    per_bucket: list[list] = [[] for _ in range(num_buckets)]
    for path in paths:
        md = pq.ParquetFile(path).metadata
        chunk: list[int] = []
        rows = 0
        chunks: list[list[int]] = []
        for rg in range(md.num_row_groups):
            chunk.append(rg)
            rows += md.row_group(rg).num_rows
            if rows >= rows_per_task:
                chunks.append(chunk)
                chunk, rows = [], 0
        if chunk:
            chunks.append(chunk)
        for rgs in chunks:
            out = split.remote(path, rgs, keys, num_buckets, bucket_col, pre_fn)
            if num_buckets == 1:
                out = [out]
            for b in range(num_buckets):
                per_bucket[b].append(out[b])

    reduced = [gather.remote(reduce_fn, b, pass_bucket_id, *refs)
               for b, refs in enumerate(per_bucket) if refs]
    if as_refs:
        return reduced
    return ray.data.from_arrow_refs(reduced)
