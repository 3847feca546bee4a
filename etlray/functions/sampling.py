"""Sampling and sharding operators for training-data pipelines.

* ``deterministic_sample`` — hash-based Bernoulli sampling: a row is
  kept iff ``md5(salt || id) mod 10_000 < rate·10_000``. Deterministic,
  repartition-stable, and side-channel-free (no RNG state), so any
  worker, any retry, any cluster size selects the identical subset —
  the property training-data pipelines need for reproducible mixes.
  md5 matches DuckDB's ``md5_number_lower`` bit-for-bit, so a SQL
  oracle recomputes the exact selection. For hot paths that don't need
  SQL parity, ``method="sip"`` uses the vectorized SipHash
  (``pd.util.hash_array``) instead.

* ``pack_token_shards`` — assign each document a shard index so every
  shard holds ~``budget`` tokens in reading order (the token-stream
  packing step before tokenizer sharding). Needs a GLOBAL running sum:
  implemented as the classic two-phase distributed prefix scan — one
  tiny task per block computes its local token sum, the driver does an
  exclusive scan over those scalars (O(blocks), not O(rows)), and a
  second wave stamps each block with its offset. No shuffle, no
  materialization; driver traffic is one int per block.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _md5_u64(ids, salt: str) -> np.ndarray:
    """uint64 of md5(salt‖str(id)) — bytes [8:16] little-endian, the
    EXACT value DuckDB's ``md5_number_lower`` computes. Every sampling
    operator's SQL-parity contract routes through this ONE helper; do
    not re-implement the byte layout elsewhere."""
    out = np.empty(len(ids), dtype=np.uint64)
    pre = salt.encode("utf-8")
    for i, v in enumerate(ids):
        d = hashlib.md5(pre + str(v).encode("utf-8")).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out


def _md5_mod_10k(ids, salt: str) -> np.ndarray:
    return (_md5_u64(ids, salt) % np.uint64(10_000)).astype(np.int64)


def deterministic_sample(ds, id_col: str, rate: float, salt: str = "",
                         method: str = "md5"):
    """Keep ~``rate`` of rows, selected by a pure function of
    ``id_col`` (+ salt). ``method='md5'`` is SQL-reproducible
    (DuckDB: ``md5_number_lower(salt || id) % 10000 < rate*10000``);
    ``method='sip'`` is the faster vectorized SipHash variant."""
    threshold = int(round(rate * 10_000))

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        if method == "md5":
            h = _md5_mod_10k(ids, salt)
        else:
            h = (pd.util.hash_array(
                np.array([f"{salt}{v}" for v in ids], dtype=object),
                hash_key="etlray_sample_01") % np.uint64(10_000)).astype(np.int64)
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sample_per_group(ds, group_by, id_col: str, k: int, salt: str = ""):
    """Deterministic uniform sample of ``k`` rows per group: keep the
    rows with the ``k`` smallest ``md5(salt || id)`` values (ties by
    id). A pure function of the data — repartition/retry-stable — and
    SQL-reproducible: ``row_number() OVER (PARTITION BY g ORDER BY
    md5_number_lower(salt || id), id) <= k``. Built on the
    TopKPerGroup partial-top-k shape (shuffle carries ≤ k·groups rows
    per block)."""
    from etlray.stages.common import TopKPerGroupTransform

    h = "__sample_h"

    def add_h(t: pa.Table) -> pa.Table:
        vals = _md5_u64(t[id_col].to_pylist(), salt)
        return t.append_column(h, pa.array(vals.view(np.int64) ^ np.int64(-2**63),
                                           type=pa.int64()))

    with_h = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    out = TopKPerGroupTransform(group_by, [(h, False), (id_col, False)],
                                k=k).apply(with_h)

    def drop_h(t: pa.Table) -> pa.Table:
        return t.drop_columns([h]) if h in t.column_names else t

    return out.map_batches(drop_h, batch_format="pyarrow", zero_copy_batch=True)


def zip_with_index(ds, out_col: str = "row_idx"):
    """Append a 0-based global row index under the dataset's existing
    block order (``row_number() - 1`` over that order is the oracle).
    Same two-phase prefix scan as ``pack_token_shards``, but over
    block ROW COUNTS — the counts are already in block metadata, so
    phase one is free (no task reads any data)."""
    import ray
    import ray.data

    @ray.remote
    def stamp(t: pa.Table, offset: int) -> pa.Table:
        return t.append_column(
            out_col, pa.array(offset + np.arange(t.num_rows), type=pa.int64()))

    refs, counts = [], []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            refs.append(block_ref)
            counts.append(meta.num_rows)
    if any(c is None for c in counts):
        import pyarrow.compute as _pc  # noqa: F401  (fallback path)

        @ray.remote
        def block_rows(t: pa.Table) -> int:
            return t.num_rows

        counts = ray.get([block_rows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    return ray.data.from_arrow_refs(
        [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)])


def pack_token_shards(ds, token_col: str, budget: int,
                      out_col: str = "shard_idx"):
    """Append ``out_col`` = which ~``budget``-token shard this row's
    tokens start in, under the dataset's existing block order:
    ``shard_idx = floor(exclusive_running_sum(token_col) / budget)``
    (SQL window-cumsum oracle). Two-phase distributed prefix scan —
    see module docstring. The input's block order must be
    deterministic (a sorted parquet read is; a post-shuffle Dataset
    is not — sort first)."""
    import ray
    import ray.data

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        return int(pc.sum(pc.cast(t[token_col], pa.int64())).as_py() or 0)

    @ray.remote
    def stamp(t: pa.Table, offset: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        # fill_null(0): a NULL token count contributes nothing to the
        # running sum — matching block_sum's null-skipping pc.sum; a
        # bare cast->to_numpy yields float64 NaN that poisons cumsum
        # and crashes the int64 conversion only in phase 2
        toks = pc.fill_null(pc.cast(t[token_col], pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        excl = offset + np.concatenate(([0], np.cumsum(toks)[:-1]))
        return t.append_column(out_col, pa.array(excl // budget,
                                                 type=pa.int64()))

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    sums = ray.get([block_sum.remote(r) for r in refs])  # one int per block
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1])).astype(np.int64)
    out = [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)


def weighted_sample(ds, id_col: str, weight_col: str, k: int,
                    salt: str = ""):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-Res): each row gets key
    ``u^(1/w)`` with ``u = md5(salt‖id) / 2^64`` uniform in (0,1) and
    ``w`` the row's weight; the k largest keys are the sample —
    inclusion probability ∝ weight, and the pure-function key makes
    the draw stable across retries, partitionings and engines (SQL
    recomputes the identical key via ``pow(md5_number_lower(..), 1/w)``
    — the importance-sampling primitive behind data-mixture weighting).

    Scale shape: keys are per-row arithmetic; the top-k runs through
    ``TopKPerGroupTransform`` on a constant group, whose per-block
    partial keeps ≤ k rows per block — the exchange never carries more
    than k·blocks rows. Rows with weight ≤ 0 or NULL are excluded
    (SQL: ``WHERE w > 0``)."""
    from etlray.stages import TopKPerGroupTransform

    key_col, grp = "__wskey", "__wsg"

    def keyed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = np.asarray(pc.cast(t[weight_col], pa.float64())
                       .to_numpy(zero_copy_only=False), dtype=np.float64)
        u = _md5_u64(ids, salt).astype(np.float64)
        u /= 18446744073709551616.0     # / 2^64 → uniform (0,1)
        with np.errstate(invalid="ignore", divide="ignore"):
            key = np.power(u, 1.0 / w)
        keep = np.isfinite(key) & (w > 0)
        t = t.filter(pa.array(keep))
        t = t.append_column(key_col, pa.array(key[keep]))
        return t.append_column(
            grp, pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True)
    top = TopKPerGroupTransform(grp, [(key_col, True), (id_col, False)],
                                k=k).apply(keyed_ds)

    def drop(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in (key_col, grp)
                               if c in t.column_names])

    return top.map_batches(drop, batch_format="pyarrow")
