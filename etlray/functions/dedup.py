"""Deduplication operators for training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard verify, embedding-cosine.

Scale shapes (ray_guide patterns):
* exact dedup reuses the CDC LWW machinery — per-batch partial
  min-keeper per content hash, then bucket-groupby finalize. One
  shuffle over already-collapsed data.
* MinHash-LSH: shingle→minhash per batch (numpy, vectorized over the
  signature dimension), explode to (band, band_hash, doc_id) rows,
  groupby band buckets, verify candidate pairs with n-gram Jaccard
  inside the group — candidates never leave their bucket, no global
  pairwise pass.
* SimHash: 64-bit signatures per batch; exact-signature grouping
  (distance 0) plus Hamming-band buckets for ≤ k-bit near-dups.
* embedding cosine: random-hyperplane LSH buckets then in-bucket
  pairwise cosine (numpy matmul per bucket).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from etlray.cdc.apply import BUCKET_COL, with_bucket
from etlray.cdc.lww import lww_reduce

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _sha_col(arr) -> pa.Array:
    return pa.array([None if v is None else
                     hashlib.sha256(v.encode("utf-8")).hexdigest()
                     for v in arr.to_pylist()], type=pa.string())


def exact_dedup(ds, text_col: str = "text", order_col: str = "doc_id",
                num_buckets: int = 32):
    """Keep, per distinct ``text_col`` value, the row with MIN
    ``order_col`` (deterministic keeper). Returns the surviving rows
    with their original columns."""
    neg = "__neg_order"
    sha = "__text_sha"

    def prep(t: pa.Table) -> pa.Table:
        t = t.append_column(sha, _sha_col(t[text_col]))
        t = t.append_column(neg, pc.negate_checked(
            pc.cast(t[order_col], pa.int64())))
        # partial reduce: min order_col per sha within the batch
        t = lww_reduce(t, [sha], neg)
        return with_bucket(t, [sha], num_buckets)

    pre = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        t = lww_reduce(t, [sha], neg)
        return t.drop_columns([c for c in (sha, neg, BUCKET_COL)
                               if c in t.column_names])

    from etlray.exchange import hash_exchange

    return hash_exchange(pre, [sha], num_buckets, finalize, bucket_col=BUCKET_COL)


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Unique k-char shingle hashes of the whitespace-normalized text
    as a uint64 array. Vectorized: sliding-window view over the utf-8
    bytes dotted with a power vector (deterministic across processes —
    python hash() is salted per process and would give every Ray
    worker different signatures)."""
    norm = " ".join(text.lower().split())
    data = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        pad = np.zeros(k, dtype=np.uint8)
        pad[:len(data)] = data
        data = pad
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    powers = np.uint64(1000003) ** np.arange(k, dtype=np.uint64)  # wraps mod 2^64
    return np.unique(win @ powers)


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """m universal-hash permutations h_i(x) = (a_i x + b_i) mod p,
    coefficients fixed by seed — identical in every worker."""

    def __init__(self, num_perm: int = 64, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        x = shingles.astype(np.uint64)
        # (m, n) hash matrix → min over shingles; wraps mod 2^64 are fine
        hashed = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return hashed.min(axis=1)


def minhash_lsh_candidates(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
):
    """MinHash+LSH near-dup detection.

    Pipeline: per-batch signatures → explode to one row per (band,
    band_hash, doc) → groupby band bucket → within-bucket n-gram
    Jaccard verify against the bucket's first doc → emit verified
    pairs (doc_id, dup_of, jaccard). ~O(n·m) work, one shuffle of
    (bands × n) tiny rows.
    """
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm)

    def sigs(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_band, out_hash, out_id, out_text = [], [], [], []
        for i, txt in zip(ids, texts):
            if txt is None:
                continue
            sig = hasher.signature(char_shingles(txt, shingle_k))
            for b in range(bands):
                band = sig[b * rows_per_band:(b + 1) * rows_per_band]
                h = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
                out_band.append(b)
                out_hash.append(h)
                out_id.append(i)
                out_text.append(txt)
        return pa.table({
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.string()),
            id_col: pa.array(out_id),
            text_col: pa.array(out_text),
        })

    exploded = ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            return pd.DataFrame({id_col: [], "dup_of": [], "jaccard": []})
        docs = list(zip(g[id_col], g[text_col]))
        keeper_id, keeper_text = docs[0]
        ks = char_shingles(keeper_text, shingle_k)
        out_id, out_dup, out_j = [], [], []
        for did, dtext in docs[1:]:
            s = char_shingles(dtext, shingle_k)
            inter = len(np.intersect1d(ks, s, assume_unique=True))
            j = inter / max(len(ks) + len(s) - inter, 1)
            if j >= jaccard_threshold:
                out_id.append(did)
                out_dup.append(keeper_id)
                out_j.append(j)
        return pd.DataFrame({id_col: out_id, "dup_of": out_dup, "jaccard": out_j})

    # many tiny (band, band_hash) groups → one hash_exchange bucket holds
    # thousands of them; the per-group python work happens in-process
    # (no per-group Ray task — Ray's map_groups would cost 0.13 s each)
    def verify_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "dup_of": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        df = t.to_pandas()
        out = df.groupby(["band", "band_hash"], sort=False).apply(verify_group)
        out = out.reset_index(drop=True)
        if len(out) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "dup_of": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        return pa.table({id_col: pa.array(out[id_col], type=pa.int64()),
                         "dup_of": pa.array(out["dup_of"], type=pa.int64()),
                         "jaccard": pa.array(out["jaccard"], type=pa.float64())})

    from etlray.exchange import hash_exchange

    pairs = hash_exchange(exploded, ["band_hash"], 16, verify_bucket,
                          bucket_col=None)

    # a pair can surface from several bands — keep max-jaccard row per doc
    def best_per_doc(t: pa.Table) -> pa.Table:
        t = lww_reduce(t, [id_col], "jaccard") if t.num_rows else t
        return t.drop_columns([c for c in (BUCKET_COL,) if c in t.column_names])

    return hash_exchange(pairs, [id_col], 8, best_per_doc, bucket_col=None)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (weight 1 each)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                           "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 63) if out >= (1 << 63) else out  # store as int64


def add_simhash(ds, text_col: str = "text"):
    def f(t: pa.Table) -> pa.Table:
        vals = [None if v is None else simhash64(v) for v in t[text_col].to_pylist()]
        return t.append_column("simhash", pa.array(vals, type=pa.int64()))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_groups(ds, text_col: str = "text", id_col: str = "doc_id",
                       num_buckets: int = 8):
    """Docs sharing an identical 64-bit simhash → (doc_id, dup_of).
    One hash_exchange on the signature; grouping within each bucket is
    a vectorized pandas groupby (no per-group Ray task)."""
    with_sig = add_simhash(ds, text_col).select_columns([id_col, "simhash"])

    def bucket_groups(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "dup_of": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas().sort_values([("simhash"), id_col])
        keeper = df.groupby("simhash", sort=False)[id_col].transform("first")
        dups = df[df[id_col] != keeper]
        if len(dups) == 0:
            return empty
        return pa.table({id_col: pa.array(dups[id_col], type=pa.int64()),
                         "dup_of": pa.array(keeper[dups.index], type=pa.int64())})

    from etlray.exchange import hash_exchange

    return hash_exchange(with_sig, ["simhash"], num_buckets, bucket_groups,
                         bucket_col=None)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random hyperplane LSH)
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    cosine_threshold: float = 0.95,
    seed: int = 11,
):
    """Bucket by sign pattern under ``num_planes`` random hyperplanes,
    then exact pairwise cosine within each bucket (numpy matmul).
    Near-identical vectors agree on every plane with high probability."""

    def bucketize(t: pa.Table) -> pa.Table:
        vecs = np.array(t[vec_col].to_pylist(), dtype=np.float32)
        dim = vecs.shape[1]
        planes = np.random.default_rng(seed).standard_normal((dim, num_planes)) \
            .astype(np.float32)
        signs = (vecs @ planes) > 0
        codes = (signs * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
        return pa.table({
            id_col: t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col],
            "lsh_bucket": pa.array(codes),
            vec_col: t[vec_col].combine_chunks() if isinstance(t[vec_col], pa.ChunkedArray) else t[vec_col],
        })

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def pairwise_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: [], "dup_of": [], "cosine": []})
        g = g.sort_values(id_col)
        vecs = np.array(g[vec_col].tolist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        sim = unit @ unit.T
        ids = g[id_col].to_numpy()
        ii, jj = np.where(np.triu(sim >= cosine_threshold, k=1))
        return pd.DataFrame({id_col: ids[jj], "dup_of": ids[ii],
                             "cosine": sim[ii, jj].astype(float)})

    def pairwise_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "dup_of": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        out = df.groupby("lsh_bucket", sort=False)[[id_col, vec_col]].apply(
            pairwise_group).reset_index(drop=True)
        if len(out) == 0:
            return empty
        return pa.table({id_col: pa.array(out[id_col], type=pa.int64()),
                         "dup_of": pa.array(out["dup_of"], type=pa.int64()),
                         "cosine": pa.array(out["cosine"], type=pa.float64())})

    from etlray.exchange import hash_exchange

    return hash_exchange(bucketed, ["lsh_bucket"], 8, pairwise_bucket,
                         bucket_col=None)
