"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk`` — the exact baseline: the (small) query matrix
  is broadcast ONCE via ``ray.put``; every batch does one numpy
  matmul against it and emits its local top-k; a final tiny reduce
  merges per-batch candidates. The dataset streams; only k rows per
  (query, batch) cross the wire.
* ``ivf_topk`` — the scale path: a coarse k-means codebook (trained on
  a driver-side sample), cluster assignment per batch, then search
  only batches' vectors belonging to the ``nprobe`` closest clusters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def vectors_to_numpy(col) -> np.ndarray:
    """Arrow list<float>/fixed_size_list<float> column → (n, d) float32
    matrix. Zero-copy (flatten + reshape) whenever the layout allows —
    ``to_pylist()`` materializes n·d Python floats and was the measured
    per-batch tax on every vector operator."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 0), dtype=np.float32)
    if col.null_count == 0:
        if pa.types.is_fixed_size_list(col.type):
            d = col.type.list_size
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(col), d).astype(np.float32, copy=False)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            if len(np.unique(lens)) == 1:
                flat = col.flatten().to_numpy(zero_copy_only=False)
                return flat.reshape(len(col), int(lens[0])) \
                    .astype(np.float32, copy=False)
    return np.array(col.to_pylist(), dtype=np.float32)


class _BatchTopK:
    """Task-pool stage: the broadcast query matrix is plasma-resident
    numpy (zero-copy ``ray.get`` per task, ships once per node), so no
    actor pool / spin-up; per batch computes cosine to every query and
    emits the batch-local top-k rows per query."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int) -> None:
        self.queries_ref = queries_ref
        self.q_unit = None
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        if self.q_unit is None:
            self.q_unit = _unit(np.asarray(ray.get(self.queries_ref),
                                           dtype=np.float32))
        vecs = vectors_to_numpy(t[self.vec_col])
        if len(vecs) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int32()),
                             self.id_col: pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        sims = _unit(vecs) @ self.q_unit.T            # (n, q)
        ids = np.asarray(t[self.id_col].to_pylist())
        k = min(self.k, len(vecs))
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            part = np.argpartition(-sims[:, qi], k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[part].tolist())
            out_s.extend(sims[part, qi].astype(float).tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int32()),
                         self.id_col: pa.array(out_id, type=pa.int64()),
                         "cosine": pa.array(out_s, type=pa.float64())})


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     concurrency=(1, 8)):
    """Exact cosine top-k of each query row against the dataset.
    Returns a Dataset (query_id, <id_col>, cosine) of k rows per query."""
    import ray

    ref = ray.put(np.asarray(queries, dtype=np.float32))
    candidates = ds.map_batches(
        _BatchTopK(ref, vec_col, id_col, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # final merge through the bucketed exchange — NOT groupby().map_groups,
    # whose ~0.13 s/group Ray overhead is 0.13·q seconds of pure latency
    # at q queries; each bucket merges thousands of query groups with one
    # vectorized pandas sort+head
    from etlray.cdc.apply import BUCKET_COL
    from etlray.exchange import hash_exchange

    def merge_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int32()),
                             id_col: pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        df = t.to_pandas().sort_values(["query_id", "cosine", id_col],
                                       ascending=[True, False, True],
                                       kind="stable")
        out = df.groupby("query_id", sort=False).head(k)
        return pa.table({"query_id": pa.array(out["query_id"], type=pa.int32()),
                         id_col: pa.array(out[id_col], type=pa.int64()),
                         "cosine": pa.array(out["cosine"], type=pa.float64())})

    return hash_exchange(candidates, ["query_id"], 8, merge_bucket,
                         bucket_col=None)


class _SimJoiner:
    """Task-pool stage: ``ray.get`` of the broadcast (ids, unit-matrix)
    is a zero-copy shared-memory read after the object reaches a node,
    so fetching per task costs ~µs and skips an actor pool's spin-up
    (the numpy matrix is plasma-resident, nothing to deserialize)."""

    def __init__(self, ref, vec_col: str, id_col: str, threshold: float) -> None:
        self.ref = ref
        self.vec_col = vec_col
        self.id_col = id_col
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        self.ids, self.mat = ray.get(self.ref)
        empty = pa.table({"vec_id_a": pa.array([], type=pa.int64()),
                          "vec_id_b": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if t.num_rows == 0:
            return empty
        bids = np.asarray(t[self.id_col].to_pylist(), dtype=np.int64)
        bv = _unit(vectors_to_numpy(t[self.vec_col]).astype(np.float64))
        # round BEFORE thresholding, deliberately: the DuckDB oracle for
        # embedding_sim_join filters on round(cosine, 3) >= threshold,
        # and matching its predicate exactly keeps threshold-edge pairs
        # identical on both engines. Consequence (documented): this
        # operator's edge behavior differs from embedding_near_dups'
        # un-rounded verify by up to 5e-4 of cosine — callers comparing
        # the two must round both or widen the threshold.
        sims = np.round(bv @ self.mat.T, 3)
        mask = (sims >= self.threshold) & (bids[:, None] < self.ids[None, :])
        rr, cc = np.where(mask)
        if len(rr) == 0:
            return empty
        return pa.table({"vec_id_a": pa.array(bids[rr], type=pa.int64()),
                         "vec_id_b": pa.array(self.ids[cc], type=pa.int64()),
                         "cosine": pa.array(sims[rr, cc], type=pa.float64())})


def cosine_sim_join(ds, threshold: float = 0.5, vec_col: str = "embedding",
                    id_col: str = "vec_id", concurrency=(1, 8)):
    """EXACT cosine similarity self-join: every (a, b) pair with
    cosine ≥ threshold, a < b — the precise baseline to the
    hyperplane-LSH ``embedding_near_dups``.

    The full (id, unit-vector) matrix is broadcast ONCE via ray.put and
    each batch does one matmul against it — O(n²·d) total work spread
    across batches, zero shuffle. Valid while one side fits a worker's
    memory (n·d·8 bytes — 10M × 256-dim ≈ 20 GB is the practical
    ceiling); beyond that, LSH-bucket first."""
    import ray
    import ray.data

    # materialize: the input is consumed TWICE (broadcast-side gather +
    # probe pass) — without this an expensive/nondeterministic upstream
    # pipeline would re-execute, and the two passes could even disagree.
    # Fine to pin: this operator's validity contract already requires
    # the (id, vector) side to fit in memory.
    ds = ds.materialize()
    side = ds.select_columns([id_col, vec_col])
    tables = [t for t in ray.get(side.to_arrow_refs()) if t.num_rows]
    if not tables:
        return ray.data.from_arrow(pa.table(
            {"vec_id_a": pa.array([], type=pa.int64()),
             "vec_id_b": pa.array([], type=pa.int64()),
             "cosine": pa.array([], type=pa.float64())}))
    full = pa.concat_tables(tables, promote_options="permissive")
    ids = np.asarray(full[id_col].to_pylist(), dtype=np.int64)
    mat = _unit(vectors_to_numpy(full[vec_col]).astype(np.float64))
    ref = ray.put((ids, mat))
    return ds.map_batches(
        _SimJoiner(ref, vec_col, id_col, threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def train_codebook(sample: np.ndarray, n_clusters: int, iters: int = 10,
                   seed: int = 5) -> np.ndarray:
    """Tiny driver-side k-means (numpy Lloyd's) on a sample — the IVF
    coarse quantizer."""
    rng = np.random.default_rng(seed)
    x = _unit(np.asarray(sample, dtype=np.float32))
    centers = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centers.T, axis=1)
        for c in range(len(centers)):
            m = assign == c
            if m.any():
                centers[c] = x[m].mean(axis=0)
        centers = _unit(centers)
    return centers


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
             nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 2048, seed: int = 5):
    """IVF-style ANN: assign every vector to its nearest codebook
    cluster (map_batches), keep only vectors in the ``nprobe`` clusters
    closest to any query, then exact top-k on the survivors."""
    import ray

    sample = np.array(
        ds.limit(sample_size).to_pandas()[vec_col].tolist(), dtype=np.float32)
    centers = train_codebook(sample, n_clusters, seed=seed)
    q_unit = _unit(np.asarray(queries, dtype=np.float32))
    probe = set()
    for qi in range(len(q_unit)):
        top = np.argsort(-(q_unit[qi] @ centers.T))[:nprobe]
        probe.update(top.tolist())
    probe_arr = np.array(sorted(probe))
    centers_ref = ray.put(centers)

    def keep_probed(t: pa.Table) -> pa.Table:
        c = ray.get(centers_ref)
        vecs = _unit(vectors_to_numpy(t[vec_col]))
        if len(vecs) == 0:
            return t
        assign = np.argmax(vecs @ c.T, axis=1)
        return t.filter(pa.array(np.isin(assign, probe_arr)))

    pruned = ds.map_batches(keep_probed, batch_format="pyarrow", zero_copy_batch=True)
    return brute_force_topk(pruned, queries, k=k, vec_col=vec_col, id_col=id_col)


def centroid_per_group(ds, group_col: str, vec_col: str = "embedding",
                       num_buckets: int = 8):
    """Mean vector per group — cluster centroids over an embedding
    column, the aggregate behind k-means refinement, class prototypes
    and per-source embedding drift monitoring.

    Scale shape: per batch the (n, d) matrix is summed into one
    (groups_in_batch, d) partial with a single ``np.add.at`` scatter
    (no per-row loop); the exchange then carries one d-vector per
    (group, block) — never raw embeddings — and a per-bucket sum /
    count finishes. Output is LONG format (group, pos, centroid_v),
    one row per vector component, so results stay join- and
    oracle-friendly (no list-column representation skew between
    engines).

    ``pos`` is 1-based to match SQL ``generate_subscripts``."""
    import pandas as pd
    import pyarrow.compute as pc

    from etlray.cdc.apply import BUCKET_COL
    from etlray.exchange import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], t.schema.field(group_col).type),
                             "__sum": pa.array([], pa.binary()),
                             "__n": pa.array([], pa.int64())})
        gtype = t.schema.field(group_col).type
        mat = vectors_to_numpy(t[vec_col]).astype(np.float64)
        keys = t[group_col].to_numpy(zero_copy_only=False)
        # use_na_sentinel=False: a NULL group is a REAL group (SQL
        # GROUP BY semantics) — the default -1 sentinel would scatter
        # its rows into the last group's sum and crash bincount
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        acc = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(acc, codes, mat)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        # type=gtype: inference from the factorized uniques would emit
        # a different schema than the empty branch for e.g. dictionary
        # or large_string columns, breaking concat in the exchange
        return pa.table({group_col: pa.array(uniq, type=gtype,
                                             from_pandas=True),
                         "__sum": pa.array([r.tobytes() for r in acc],
                                           pa.binary()),
                         "__n": pa.array(cnt)})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if BUCKET_COL in t.column_names:
            t = t.drop_columns([BUCKET_COL])
        gtype = t.schema.field(group_col).type
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "pos": pa.array([], pa.int64()),
                             "centroid_v": pa.array([], pa.float64()),
                             "n_vecs": pa.array([], pa.int64())})
        keys = t[group_col].to_numpy(zero_copy_only=False)
        sums = np.stack([np.frombuffer(b, dtype=np.float64)
                         for b in t["__sum"].to_pylist()])
        ns = t["__n"].to_numpy()
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        # deterministic partial order: sort partials by (group, then
        # original order) so the float sum is partition-stable
        order = np.argsort(codes, kind="stable")
        acc = np.zeros((len(uniq), sums.shape[1]))
        np.add.at(acc, codes[order], sums[order])
        cnt = np.bincount(codes, weights=ns.astype(np.float64),
                          minlength=len(uniq)).astype(np.int64)
        cent = acc / cnt[:, None]
        g, d = cent.shape
        return pa.table({
            group_col: pa.array(np.repeat(uniq, d), type=gtype,
                                from_pandas=True),
            "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), g)),
            "centroid_v": pa.array(cent.reshape(-1)),
            "n_vecs": pa.array(np.repeat(cnt, d))})

    return hash_exchange(pre, [group_col], num_buckets, reduce_bucket,
                         bucket_col=None)
