"""hash_exchange — explicit all-to-all bucket shuffle built from raw
Ray tasks (the one place the Dataset API genuinely can't express the
semantics efficiently: Ray 2.49's ``groupby().map_groups`` costs
~0.13 s *per group* and ``repartition(keys=...)`` requires the
hash-shuffle actor pool with ~10 s spin-up — measured in
/tmp/join_prof.py; both dwarf the actual work on mid-size data and add
per-epoch latency at any size).

Plan (bounded-memory wave pipeline)::

    input units (Dataset blocks, or parquet row-group chunks)
      └─ WAVES of ≤ wave_tasks split tasks (≤3 waves in flight:
           2 awaiting their combines + 1 accumulating)
           └─ split task per unit: bucket rows by stable hash → nb sub-tables
                └─ per-wave per-bucket PARTIAL COMBINE task:
                     concat wave's sub-tables (+ combine_fn, e.g. LWW) →
                     (partial table, applied-row count); split outputs freed
                └─ finalize task per bucket: concat wave partials →
                     reduce_fn → block
                     └─ ray.data.from_arrow_refs(blocks)

Properties:
* in-flight split output is bounded to ~3 waves regardless of input
  size — two flushed waves whose combines may still be running plus
  the wave currently accumulating; the backpressure wait fires at >2
  pending (round 1 held ``num_blocks × num_buckets`` sub-tables until
  the last split finished — at 32M events ≈ the whole epoch live in
  the object store at once, which collapsed throughput at every CPU
  count);
* with an associative ``combine_fn`` (the CDC LWW reduce) each wave's
  partials shrink to ≤ unique-keys-per-bucket, so the live footprint is
  ~final-table-sized even for a 10^10-event log;
* single-wave inputs skip the combine layer entirely — identical task
  graph and latency to the direct split→gather plan;
* deterministic ordering end to end (waves in submission order, units
  in input order) so downstream pairwise float reductions are
  reproducible across runs and parallelism levels;
* deterministic bucketing (same SipHash as the CDC engine) so the
  bucket id doubles as the checkpoint partition id.

Closure-shipping note: pre_fn/combine_fn/reduce_fn ride each task
submit as pickled closures ON PURPOSE — an attempt to ray.put them
once and pass ObjectRefs measured 10-20 % SLOWER end-to-end at 32M
events / 16 cpus (per-task dependency resolution beats the ~1 ms/task
driver-side pickle, which pipelines with execution anyway).

Skew note: the caller is expected to pre-combine per block (e.g. the
CDC combiner) so a Zipf-hot key contributes ≤1 row per input block;
the gather for a hot bucket then holds O(blocks) rows, not O(events).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Sequence

import pyarrow as pa

from etlray.cdc.apply import BUCKET_COL, stable_bucket


def _split_block(table: pa.Table, keys: list[str], num_buckets: int,
                 precomputed_col: str | None,
                 pre_fn: Callable[[pa.Table], pa.Table] | None = None) -> list[pa.Table]:
    import numpy as np

    if pre_fn is not None and (table.num_rows > 0 or table.num_columns > 0):
        # map-side fusion: conform/filter/combine run INSIDE the split
        # task — one object-store round trip per block instead of one
        # per pipeline stage. Zero-column empties (Ray map_batches
        # emits them for empty input blocks) skip the pre_fn: it would
        # KeyError on its expected columns.
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


SRC_FILE_COL = "__src_file"
SRC_ROW_COL = "__src_row"


def row_group_offsets(md) -> "tuple":
    """(sizes, starts) arrays for a parquet FileMetaData: sizes[g] =
    rows in row group g, starts[g] = global ordinal of its first row
    (starts has num_row_groups+1 entries; the last is the row count).
    One shared definition for every locator computation — _split_file's
    stamping and the payload fetch must agree bit-for-bit."""
    import numpy as np

    sizes = np.array([md.row_group(i).num_rows
                      for i in range(md.num_row_groups)], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(sizes)))
    return sizes, starts


def _split_file(path: str, row_groups: list[int], keys: list[str],
                num_buckets: int, bucket_col: str | None,
                pre_fn, file_index: int | None = None,
                columns: list | None = None) -> list[pa.Table]:
    """Split task that READS its own parquet row groups — no Ray Data
    pipeline, no driver streaming: the driver only lists footer
    metadata and submits one task per row-group chunk.

    ``file_index`` (payload-pruned exchange): stamp every row with its
    source locator — ``__src_file`` (the caller's index into its path
    list, int32) and ``__src_row`` (global row ordinal within the file,
    int64) — BEFORE ``pre_fn``, so a downstream consumer can drop a
    wide payload column at the map side and late-materialize only the
    winning rows' payloads from the source file (12 B/row through the
    shuffle instead of the payload)."""
    import numpy as np
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    # ``columns``: projection pushed into the parquet decode — the
    # payload-pruned exchange drops the content column HERE, so blob
    # payloads are never even decompressed on the map side (their sha
    # stamps at the bucket writer from the fetched winners instead)
    table = pf.read_row_groups(row_groups, columns=columns)
    if file_index is not None:
        sizes, starts = row_group_offsets(pf.metadata)
        idx = (np.concatenate([starts[g] + np.arange(sizes[g]) for g in row_groups])
               if row_groups else np.array([], dtype=np.int64))
        table = table.append_column(SRC_FILE_COL, pa.array(
            np.full(table.num_rows, file_index, dtype=np.int32)))
        table = table.append_column(SRC_ROW_COL, pa.array(idx))
    return _split_block(table, keys, num_buckets, bucket_col, pre_fn)


def _concat(parts: Sequence[pa.Table]) -> pa.Table:
    tables = [p for p in parts if p.num_rows > 0]
    if not tables:
        # empty buckets keep a schema'd empty table so every output
        # block has a uniform schema (from_arrow_refs requires it).
        # Prefer a part that HAS a schema: Ray map_batches emits
        # ZERO-COLUMN empties for empty input blocks (the UDF never
        # runs on them), and parts[0] being one of those used to leak
        # a schema-less table into reduce_fn.
        for p in parts:
            if p.num_columns > 0:
                return p.slice(0, 0)
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


def _combine_wave(combine_fn, *parts: pa.Table):
    """Per-wave per-bucket partial: consolidate this wave's sub-tables
    into ONE object (frees the split outputs) and optionally shrink it
    with an associative combine_fn. Returns (table, rows-entered)."""
    count = sum(p.num_rows for p in parts)
    merged = _concat(parts)
    if combine_fn is not None and merged.num_rows:
        merged = combine_fn(merged)
    return merged, count


def _finalize_bucket(reduce_fn, bucket_id: int, pass_bucket_id: bool,
                     pass_applied: bool, combined: bool, *parts) -> pa.Table:
    """Final gather for one bucket: merge wave partials (or raw split
    sub-tables on the single-wave fast path) and run reduce_fn."""
    if combined:
        applied = sum(c for _t, c in parts)
        merged = _concat([t for t, _c in parts])
    else:
        applied = sum(p.num_rows for p in parts)
        merged = _concat(parts)
    if BUCKET_COL not in merged.column_names:
        merged = merged.append_column(
            BUCKET_COL, pa.array([bucket_id] * merged.num_rows, type=pa.int32()))
    if reduce_fn is None:
        return merged
    args: list = [merged]
    if pass_bucket_id:
        args.append(bucket_id)
    if pass_applied:
        args.append(applied)
    return reduce_fn(*args)


def _default_wave_tasks() -> int:
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(ncpu, 4)


def _wave_exchange(
    submit_units: Iterator[Callable[[], list]],
    num_buckets: int,
    reduce_fn,
    pass_bucket_id: bool,
    pass_applied: bool,
    as_refs: bool,
    combine_fn,
    wave_tasks: int | None,
):
    """Core wave pipeline shared by the Dataset and file-direct fronts.

    ``submit_units`` yields thunks; each thunk submits one split task
    and returns its ``num_buckets`` output refs. Units are consumed
    lazily (a streaming Dataset executes as we iterate)."""
    import ray
    import ray.data

    wave_tasks = wave_tasks or _default_wave_tasks()
    combine = ray.remote(_combine_wave)
    finalize = ray.remote(_finalize_bucket)

    per_bucket: list[list] = [[] for _ in range(num_buckets)]
    first_wave_raw: list[list] | None = None   # single-wave fast path
    pending_waves: list[list] = []             # partial refs awaiting completion
    combined = False

    def flush_wave(wave_outs: list[list]):
        """Consolidate one wave's split outputs into per-bucket partials."""
        nonlocal combined
        combined = True
        refs = []
        for b in range(num_buckets):
            r = combine.remote(combine_fn, *[out[b] for out in wave_outs])
            per_bucket[b].append(r)
            refs.append(r)
        pending_waves.append(refs)

    wave_outs: list[list] = []
    for submit in submit_units:
        if len(wave_outs) >= wave_tasks:
            # a second wave exists → the combine layer is on
            flush_wave(wave_outs)
            wave_outs = []
            # backpressure: ≤2 flushed waves pending (plus the wave now
            # accumulating → ≤3 waves of split output alive at peak)
            while len(pending_waves) > 2:
                ray.wait(pending_waves[0], num_returns=len(pending_waves[0]),
                         fetch_local=False)
                pending_waves.pop(0)
        wave_outs.append(submit())

    if wave_outs:
        if combined:
            flush_wave(wave_outs)
        else:
            # everything fit in one wave: finalize straight from the
            # split outputs — no combine layer, round-1 task graph
            first_wave_raw = wave_outs

    if first_wave_raw is not None:
        for out in first_wave_raw:
            for b in range(num_buckets):
                per_bucket[b].append(out[b])

    reduced = [finalize.remote(reduce_fn, b, pass_bucket_id, pass_applied,
                               combined, *refs)
               for b, refs in enumerate(per_bucket) if refs]
    if as_refs:
        # caller ray.get()s the (small) reduced tables directly — skips
        # spinning a second Dataset executor just to read tiny stats
        return reduced
    if not reduced:
        return None
    return ray.data.from_arrow_refs(reduced)


def hash_exchange(
    ds,
    keys: Sequence[str],
    num_buckets: int,
    reduce_fn: Callable[[pa.Table], pa.Table] | None = None,
    bucket_col: str | None = BUCKET_COL,
    pass_bucket_id: bool = False,
    as_refs: bool = False,
    pre_fn: Callable[[pa.Table], pa.Table] | None = None,
    combine_fn: Callable[[pa.Table], pa.Table] | None = None,
    pass_applied: bool = False,
    wave_tasks: int | None = None,
):
    """Shuffle ``ds`` so each of ``num_buckets`` hash partitions of
    ``keys`` is reduced by ONE ``reduce_fn(table)`` call; returns the
    reduced Dataset (one block per bucket, carrying ``bucket_col``).

    ``ds`` may also be a LIST of Datasets (their blocks shuffle
    together without needing a schema-matching union — ``pre_fn`` can
    conform them per block). ``pre_fn`` runs inside each split task
    (map-side fusion). ``pass_bucket_id=True`` calls
    ``reduce_fn(table, bucket_id)`` — needed when an EMPTY bucket must
    still know which bucket it is (the CDC writer's carry-forward).
    ``combine_fn`` (associative, e.g. an LWW partial reduce) shrinks
    each wave's per-bucket partials so in-flight memory stays bounded
    on arbitrarily long inputs. ``pass_applied=True`` additionally
    passes the count of rows that entered the bucket (pre-combine) as
    the last reduce_fn argument — lineage survives the combine layer."""
    import ray

    keys = list(keys)
    split = ray.remote(num_returns=num_buckets)(_split_block)

    datasets = ds if isinstance(ds, (list, tuple)) else [ds]

    def units():
        # skip empty blocks (their split tasks contribute nothing and
        # their post-map zero-column form trips pre_fns); keep ONE as a
        # fallback so an all-empty input still finalizes every bucket
        # (the CDC writer's zero-row-epoch carry-forward relies on it)
        def make_submit(ref):
            def submit():
                out = split.remote(ref, keys, num_buckets, bucket_col,
                                   pre_fn)
                return [out] if num_buckets == 1 else out
            return submit

        fallback = None
        yielded = False
        for d in datasets:
            for bundle in d.iter_internal_ref_bundles():
                for block_ref, meta in bundle.blocks:
                    if getattr(meta, "num_rows", None) == 0:
                        fallback = block_ref
                        continue
                    yielded = True
                    yield make_submit(block_ref)
        if not yielded and fallback is not None:
            yield make_submit(fallback)

    result = _wave_exchange(units(), num_buckets, reduce_fn, pass_bucket_id,
                            pass_applied, as_refs, combine_fn, wave_tasks)
    if result is None:
        return datasets[0]
    return result


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
    combine_fn=None,
    pass_applied: bool = False,
    wave_tasks: int | None = None,
    stamp_locator: bool = False,
    metas: Sequence | None = None,
    bytes_per_task: int = 256 << 20,
    columns: Sequence | None = None,
):
    """File-direct variant of hash_exchange: for each parquet file the
    driver reads ONLY the footer, chunks row groups into ~rows_per_task
    units, and submits self-reading split tasks. Removes the Ray Data
    executor + driver ref-streaming from the critical path entirely
    (the measured ~severals-of-seconds serial floor per epoch).
    ``stamp_locator=True`` adds (__src_file, __src_row) source locators
    to every row before ``pre_fn`` — see ``_split_file``. ``metas``:
    already-read FileMetaData aligned with ``paths`` so the chunking
    reuses the caller's footer pass instead of re-opening every file."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    keys = list(keys)
    split = ray.remote(num_returns=num_buckets)(_split_file)

    def units():
        for fi, path in enumerate(paths):
            md = metas[fi] if metas is not None \
                else pq.ParquetFile(path).metadata
            chunk: list[int] = []
            rows = 0
            nbytes = 0
            chunks: list[list[int]] = []
            for rg in range(md.num_row_groups):
                chunk.append(rg)
                rows += md.row_group(rg).num_rows
                # total_byte_size = UNCOMPRESSED bytes: units must also
                # be byte-bounded — 200k rows of blob-scale (~17 KB)
                # contents is a 3.4 GB unit whose string columns
                # overflow int32 arrow offsets and blow worker heaps
                nbytes += md.row_group(rg).total_byte_size
                if rows >= rows_per_task or nbytes >= bytes_per_task:
                    chunks.append(chunk)
                    chunk, rows, nbytes = [], 0, 0
            if chunk:
                chunks.append(chunk)
            cols = columns[fi] if columns is not None else None
            for rgs in chunks:
                def submit(p=path, r=rgs, fi=fi, c=cols):
                    out = split.remote(p, r, keys, num_buckets, bucket_col,
                                       pre_fn,
                                       fi if stamp_locator else None, c)
                    return [out] if num_buckets == 1 else out
                yield submit

    result = _wave_exchange(units(), num_buckets, reduce_fn, pass_bucket_id,
                            pass_applied, as_refs, combine_fn, wave_tasks)
    if result is None:
        return ray.data.from_arrow(pa.table({}))
    return result
