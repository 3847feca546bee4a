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


def exact_dedup(ds, text_col: str = "text", order_col: str = "doc_id",
                num_buckets: int = 32):
    """Keep, per distinct ``text_col`` value, the row with MIN
    ``order_col`` (deterministic keeper). Returns the surviving rows
    with their original columns.

    Grouping is by the CONTENT column itself (Arrow sort inside each
    bucket — vectorized, zero collision risk); the shuffle bucket comes
    from the vectorized SipHash in ``stable_bucket``, where a collision
    merely co-buckets two texts. No per-row Python hashing anywhere."""
    neg = "__neg_order"

    def prep(t: pa.Table) -> pa.Table:
        t = t.append_column(neg, pc.negate_checked(
            pc.cast(t[order_col], pa.int64())))
        # partial reduce: min order_col per text within the batch
        t = lww_reduce(t, [text_col], neg)
        return with_bucket(t, [text_col], num_buckets)

    pre = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(t: pa.Table) -> pa.Table:
        t = lww_reduce(t, [text_col], neg)
        return t.drop_columns([c for c in (neg, BUCKET_COL)
                               if c in t.column_names])

    from etlray.exchange import hash_exchange

    return hash_exchange(pre, [text_col], num_buckets, finalize,
                         bucket_col=BUCKET_COL)


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------


def _windowed_shingles(text: str, k: int, encoding: str, dtype,
                       multiplier: int) -> np.ndarray:
    """Shared shingle kernel: whitespace-normalize + lowercase, window
    the encoded text, dot each window with a ``multiplier``-power
    vector (wraps mod 2^64 — deterministic across processes, unlike
    salted python hash()), return the unique uint64 hashes. Texts
    shorter than ``k`` produce exactly one (zero-padded) shingle.
    ``char_shingles``/``codepoint_shingles`` differ ONLY in the
    (encoding, dtype, multiplier) triple — keep any change here so the
    two variants can't drift apart."""
    norm = " ".join(text.lower().split())
    data = np.frombuffer(norm.encode(encoding), dtype=dtype)
    if len(data) < k:
        pad = np.zeros(k, dtype=dtype)
        pad[:len(data)] = data
        data = pad
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    powers = np.uint64(multiplier) ** np.arange(k, dtype=np.uint64)
    return np.unique(win @ powers)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Unique k-char shingle hashes of the whitespace-normalized text
    as a uint64 array — windows over utf-8 BYTES (see
    ``_windowed_shingles``)."""
    return _windowed_shingles(text, k, "utf-8", np.uint8, 1000003)


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """One-permutation hashing (Li, Owen & Zhang 2012) with rotation
    densification (Shrivastava & Li 2014): hash every shingle ONCE with
    a seeded multiply-shift hash, partition the 64-bit hash space into
    ``num_perm`` bins by the top bits, keep the min per bin, and fill
    empty bins by borrowing the next non-empty bin cyclically.

    One hash pass over the shingles instead of ``num_perm`` — the
    k-permutation scheme cost 64× the arithmetic plus a slow uint64
    modulo (measured 3.0 s for 5k docs; this is ~0.15 s) — while the
    signature keeps the property that matters: the expected fraction
    of matching components between two docs estimates their Jaccard.
    Coefficients are fixed by seed — identical in every worker."""

    def __init__(self, num_perm: int = 64, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = np.uint64(int(rng.integers(1, 1 << 63)) * 2 + 1)  # odd
        self.b = rng.integers(0, np.iinfo(np.uint64).max, dtype=np.uint64)
        self.num_perm = num_perm
        self.bin_bits = int(num_perm).bit_length() - 1
        if (1 << self.bin_bits) != num_perm:
            raise ValueError("num_perm must be a power of two")

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        return self.signature_batch([shingles])[0]

    def signature_batch(self, shingle_arrays: list) -> np.ndarray:
        """(n_docs, num_perm) signature matrix in one vectorized pass.
        Docs with zero shingles get the all-zeros signature."""
        n_docs = len(shingle_arrays)
        m = self.num_perm
        out = np.zeros((n_docs, m), dtype=np.uint64)
        lens = np.array([len(s) for s in shingle_arrays], dtype=np.int64)
        nonempty = np.flatnonzero(lens)
        if len(nonempty) == 0:
            return out
        x = np.concatenate([shingle_arrays[d] for d in nonempty]) \
            .astype(np.uint64)
        h = self.a * x + self.b                      # wraps mod 2^64
        bins = (h >> np.uint64(64 - self.bin_bits)).astype(np.int64)
        doc_of = np.repeat(np.arange(len(nonempty)), lens[nonempty])
        sent = np.uint64(np.iinfo(np.uint64).max)
        flat = np.full(len(nonempty) * m, sent, dtype=np.uint64)
        np.minimum.at(flat, doc_of * m + bins, h)    # scatter-min
        sig = flat.reshape(len(nonempty), m)
        # rotation densification: empty bin i borrows bin (i+s) mod m
        # for the smallest s with a value — identical borrowing rule on
        # both docs of a pair preserves the collision estimator
        empty = sig == sent
        s = 1
        while empty.any() and s < m:
            src = np.roll(sig, -s, axis=1)
            fill = empty & (src != sent)
            sig[fill] = src[fill]
            empty &= ~fill
            s += 1
        out[nonempty] = sig
        return out


_BAND_SALT_SEED = 13


def _band_hash_matrix(sig_mat: np.ndarray, bands: int,
                      rows_per_band: int) -> np.ndarray:
    """(n_docs, bands) uint64 band hashes, fully vectorized: each band's
    signature slice is dotted with a fixed odd-multiplier vector (wraps
    mod 2^64), salted per band, then avalanched with the murmur3 fmix64
    finalizer. Deterministic across processes (fixed seed). When num_perm
    is not a multiple of bands, the trailing num_perm − bands·rows_per_band
    permutations are ignored (the pre-vectorization byte-slicing behavior),
    not a reshape error."""
    n = sig_mat.shape[0]
    if rows_per_band < 1:
        raise ValueError(
            f"bands={bands} exceeds signature width {sig_mat.shape[1]}")
    s = sig_mat[:, :bands * rows_per_band].reshape(n, bands, rows_per_band)
    rng = np.random.default_rng(_BAND_SALT_SEED)
    mult = (rng.integers(1, 1 << 62, size=(bands, rows_per_band),
                         dtype=np.uint64) * np.uint64(2) + np.uint64(1))
    salt = rng.integers(0, np.iinfo(np.uint64).max, size=bands,
                        dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (s * mult[None, :, :]).sum(axis=2, dtype=np.uint64) + salt[None, :]
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


def minhash_lsh_candidates(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    exact_verify: bool = True,
    est_margin: float = 0.15,
    shingle_fn=None,
    per_doc_best: bool = False,
):
    """MinHash+LSH near-dup detection — signatures, not text, through
    the shuffle. Emits (id, dup_of, jaccard) with id > dup_of, one row
    per detected pair — the same all-pairs contract as the exact
    ``ngram_jaccard_pairs`` baseline, which oracles this operator at
    small scale. ``per_doc_best=True`` instead keeps one best keeper
    row per doc (O(docs) output even when a dup class is huge — the
    100 TB mode).

    Pipeline: per-batch signatures → explode to one row per (band,
    band_hash, doc) carrying ONLY (ids, band key, 8·num_perm-byte
    signature) → groupby band bucket → full pairwise signature-match
    Jaccard ESTIMATE within each bucket (identical-signature classes
    collapsed, then expanded, so every co-bucketed pair is covered) →
    per-pair dedupe across bands → optional EXACT n-gram Jaccard
    re-check that fetches text for the surviving ~0.1% only
    (``shingle_fn`` defaults to ``codepoint_shingles`` — SQL
    ``substring`` semantics, so the DuckDB oracle recomputes identical
    jaccard values; pass ``char_shingles`` for the byte-windowed
    variant).

    At 100 TB the old design shuffled the corpus ×bands (text
    duplicated in every band row — a 1.6 PB exchange at 16 bands);
    this one moves ``bands × n`` rows of ≤ ~600 B each, and text is
    touched a second time only for candidate docs via a broadcast
    lookup (``exact_verify=True``; assumes candidates ≪ corpus — for
    corpora where near-everything is a near-dup, set
    ``exact_verify=False`` and use the unbiased signature estimate,
    σ≈sqrt(J(1-J)/num_perm)).

    ``est_margin``: with exact_verify, candidates are pre-filtered at
    ``jaccard_threshold - est_margin`` so estimator noise doesn't drop
    true pairs before the exact check.
    """
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm)
    sig_bytes = 8 * num_perm
    if shingle_fn is None:
        shingle_fn = codepoint_shingles

    def sigs(t: pa.Table) -> pa.Table:
        # ONE to_pylist per column: the text column is the wide one and
        # materializing it twice doubled the per-batch Python-object
        # tax on the hottest MinHash path
        all_texts = t[text_col].to_pylist()
        ids = [i for i, txt in zip(t[id_col].to_pylist(), all_texts)
               if txt is not None]
        texts = [txt for txt in all_texts if txt is not None]
        if not ids:
            return pa.table({
                "band": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "__sig": pa.array([], type=pa.binary(sig_bytes)),
            })
        # the SAME shingle_fn as the exact-verify stage, so the
        # candidate estimate targets the jaccard the final threshold is
        # applied to (byte- vs codepoint-shingles diverge on non-ASCII)
        shingles = [shingle_fn(txt, shingle_k) for txt in texts]
        sig_mat = hasher.signature_batch(shingles)       # (n_docs, num_perm)
        n = len(ids)
        # vectorized band hashing: one multiply-mix per (doc, band)
        # instead of n×bands Python blake2b calls — equal band slices
        # still collide (hash is a pure function of the slice + band
        # salt), unequal slices collide only at hash-collision rate,
        # which merely adds candidates the verify stage re-checks
        hashes = _band_hash_matrix(sig_mat, bands, rows_per_band)  # (n, bands)
        raw = sig_mat.tobytes()
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(sig_bytes), n, [None, pa.py_buffer(raw)])
        id_arr = pa.array(ids, type=pa.int64())
        rep = np.repeat(np.arange(n), bands)
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(hashes.reshape(-1).view(np.int64)),
            id_col: id_arr.take(pa.array(rep)),
            "__sig": sig_arr.take(pa.array(rep)),
        })

    # the signature stage is the CPU-heavy one (python shingling +
    # numpy minhash); a small corpus arriving as one block would run it
    # in a single task — fan out first (no-op on big many-block inputs).
    # The fanned-out dataset is reused below as the exact-verify
    # payload source, so a small corpus is read from parquet ONCE.
    from etlray.stages.common import fan_out_small

    ds = fan_out_small(ds)
    exploded = ds.map_batches(
        sigs, batch_format="pyarrow", zero_copy_batch=True)

    est_threshold = (jaccard_threshold - est_margin) if exact_verify \
        else jaccard_threshold

    def verify_group(g: pd.DataFrame) -> pd.DataFrame | None:
        n = len(g)
        if n < 2:
            return None
        # (n, num_perm) signature matrix; estimated Jaccard of a pair is
        # the fraction of matching minhash components (unbiased)
        mat = np.frombuffer(b"".join(g["__sig"]), dtype=np.uint64) \
            .reshape(n, num_perm)
        ids = g[id_col].to_numpy()
        # collapse identical signatures into classes — an exact-dup-heavy
        # bucket (thousands of identical docs) would otherwise cost
        # O(n²·m) in the estimate. Qualifying class pairs are expanded
        # back to member pairs, so the output contract is "EVERY
        # co-bucketed pair with signature-estimate ≥ est_threshold"
        # (the same all-pairs contract as the exact ngram_jaccard_pairs
        # baseline — which makes the DuckDB oracle comparable).
        uniq, inv = np.unique(mat, axis=0, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        members = ids[order]                   # ids grouped by class
        counts = np.bincount(inv)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        u = len(uniq)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_j: list[np.ndarray] = []
        # within-class: every pair of identical-signature docs, est 1.0
        for x in np.flatnonzero(counts >= 2):
            m = members[starts[x]:starts[x] + counts[x]]
            ii, jj = np.triu_indices(len(m), k=1)
            a, b = m[ii], m[jj]
            out_a.append(np.maximum(a, b))
            out_b.append(np.minimum(a, b))
            out_j.append(np.ones(len(a)))
        # cross-class: chunked pairwise estimate between representatives
        # (tensor stays ≤ ~chunk·u·m bytes); a qualifying class pair
        # expands to all |X|·|Y| member cross pairs — every member of a
        # class shares the estimate, so no estimate is recomputed
        for lo in range(0, u, 64):
            hi = min(lo + 64, u)
            eq = (uniq[lo:hi, None, :] == uniq[None, :, :]).mean(axis=2)
            rr, cc = np.where(eq >= est_threshold)
            keep = cc > (rr + lo)  # each unordered class pair once
            for r, c in zip(rr[keep], cc[keep]):
                x, y = r + lo, c
                mx = members[starts[x]:starts[x] + counts[x]]
                my = members[starts[y]:starts[y] + counts[y]]
                a = np.repeat(mx, len(my))
                b = np.tile(my, len(mx))
                out_a.append(np.maximum(a, b))
                out_b.append(np.minimum(a, b))
                out_j.append(np.full(len(a), eq[r, c], dtype=float))
        if not out_a:
            return None
        return pd.DataFrame({id_col: np.concatenate(out_a),
                             "dup_of": np.concatenate(out_b),
                             "jaccard": np.concatenate(out_j)})

    # many tiny (band, band_hash) groups → one hash_exchange bucket holds
    # thousands of them; the per-group python work happens in-process
    # (no per-group Ray task — Ray's map_groups would cost 0.13 s each)
    def verify_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "dup_of": pa.array([], type=pa.int64()),
                          "jaccard": pa.array([], type=pa.float64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        # vectorized pre-pass: dedupe (group, doc) rows and drop the
        # singleton groups BEFORE any per-group Python — almost every
        # (band, band_hash) group is a lone doc, and a per-group call
        # (~0.4 ms of pandas+numpy overhead each) across n·bands groups
        # was the whole wall-time at 5k docs
        df = df.drop_duplicates(subset=["band", "band_hash", id_col])
        df = df.sort_values(["band", "band_hash", id_col], kind="stable")
        sizes = df.groupby(["band", "band_hash"], sort=False)[id_col] \
            .transform("size")
        df = df[sizes >= 2]
        if len(df) == 0:
            return empty
        frames = [f for _k, f in
                  ((k, verify_group(g)) for k, g in
                   df.groupby(["band", "band_hash"], sort=False))
                  if f is not None]
        if not frames:
            return empty
        out = pd.concat(frames, ignore_index=True)
        return pa.table({id_col: pa.array(out[id_col], type=pa.int64()),
                         "dup_of": pa.array(out["dup_of"], type=pa.int64()),
                         "jaccard": pa.array(out["jaccard"], type=pa.float64())})

    from etlray.exchange import hash_exchange

    pairs = hash_exchange(exploded, ["band_hash"], 16, verify_bucket,
                          bucket_col=None)

    # a pair can surface from several band buckets (with the identical
    # estimate — it is a function of the two signatures) — keep one row
    # per unordered pair. With exact_verify, the verify plan's FIRST
    # exchange already LWW-dedupes pairs while assigning verify
    # buckets, so a separate dedupe exchange here would be redundant.
    if exact_verify:
        cand = _exact_verify_pairs(pairs, ds, text_col, id_col, shingle_k,
                                   jaccard_threshold, shingle_fn=shingle_fn)
    else:
        def uniq_pairs(t: pa.Table) -> pa.Table:
            t = lww_reduce(t, [id_col, "dup_of"], "jaccard") if t.num_rows else t
            return t.drop_columns([c for c in (BUCKET_COL,)
                                   if c in t.column_names])

        cand = hash_exchange(pairs, [id_col, "dup_of"], 8, uniq_pairs,
                             bucket_col=None)
    if not per_doc_best:
        return cand

    # scale mode: one best (max-jaccard) keeper row per doc — O(docs)
    # output even when a dup class is huge
    def best_per_doc(t: pa.Table) -> pa.Table:
        t = lww_reduce(t, [id_col], "jaccard") if t.num_rows else t
        return t.drop_columns([c for c in (BUCKET_COL,) if c in t.column_names])

    return hash_exchange(cand, [id_col], 8, best_per_doc, bucket_col=None)


def _routed_pair_verify(cand, source_ds, id_col: str, payload_col: str,
                        payload_type, score_col: str, payload_prep,
                        verify_fn, threshold: float, num_buckets: int = 8):
    """Distributed candidate-pair verification over a per-doc payload
    (text shingles, embedding vectors, …) — the shared three-exchange
    plan behind ``_exact_verify_pairs`` (Jaccard over texts) and
    ``_cosine_verify_pairs`` (cosine over vectors). No single-task
    stage; neither payloads nor the pair list ever materialize on the
    driver.

    Plan (three hash exchanges):
      1. dedupe: exchange ``cand`` (columns ``[id_col, dup_of,
         score_col]`` — the score is only an LWW dedupe tiebreak, the
         exact value is recomputed here) on (id, dup_of); the
         exchange's bucket id becomes each pair's VERIFY bucket.
      2. route: the driver gathers only the UNIQUE candidate doc ids
         (8 B each — candidates ≪ corpus by contract; beyond ~10^9
         candidates swap the exact set for OR-merged per-block Bloom
         sketches, with false positives dropped at the join below) and
         broadcasts them once via ``ray.put`` to filter ``source_ds``;
         ``payload_prep`` shapes the surviving rows to ``(id_col,
         payload_col)``. Payloads ∪ (doc id, verify bucket) need-rows
         exchange on doc id; a per-bucket hash join replicates each
         payload to every verify bucket that references it — payload
         volume moved is ∝ candidate pairs, not corpus.
      3. verify: pairs ∪ routed payloads exchange on the precomputed
         verify bucket; ``verify_fn(a_ids, b_ids, lookup)`` returns the
         exact per-pair score, thresholded here.
    """
    import ray
    import ray.data

    from etlray.exchange import hash_exchange

    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "dup_of": pa.array([], type=pa.int64()),
                      score_col: pa.array([], type=pa.float64())})

    # -- exchange 1: dedupe pairs; bucket id = verify bucket ------------
    def dedupe_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty.append_column(BUCKET_COL,
                                       pa.array([], type=pa.int32()))
        return lww_reduce(t, [id_col, "dup_of"], score_col)

    pair_refs = hash_exchange(cand, [id_col, "dup_of"], num_buckets,
                              dedupe_pairs, bucket_col=None, as_refs=True)
    pairs_ds = ray.data.from_arrow_refs(list(pair_refs))

    @ray.remote
    def need_rows(t: pa.Table) -> pa.Table:
        """(doc id, verify bucket) per distinct doc referenced by this
        bucket's pairs — deduped so each payload ships at most once per
        verify bucket."""
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             BUCKET_COL: pa.array([], type=pa.int32())})
        ids = np.unique(np.concatenate([
            t[id_col].to_numpy(zero_copy_only=False),
            t["dup_of"].to_numpy(zero_copy_only=False)]))
        pb = t[BUCKET_COL][0].as_py()
        return pa.table({id_col: pa.array(ids, type=pa.int64()),
                         BUCKET_COL: pa.array(
                             np.full(len(ids), pb, dtype=np.int32))})

    @ray.remote
    def uniq_ids(t: pa.Table) -> np.ndarray:
        return t[id_col].to_numpy(zero_copy_only=False)

    need_refs = [need_rows.remote(r) for r in pair_refs]
    id_parts = ray.get([uniq_ids.remote(r) for r in need_refs])
    all_ids = np.unique(np.concatenate(id_parts)) if id_parts else \
        np.array([], dtype=np.int64)
    if all_ids.size == 0:
        return ray.data.from_arrow(empty)
    need_ds = ray.data.from_arrow_refs(need_refs)
    need_set_ref = ray.put(pa.array(all_ids, type=pa.int64()))

    def keep_candidates(t: pa.Table) -> pa.Table:
        wanted = ray.get(need_set_ref)  # broadcast once, shared per node
        mask = pc.is_in(t[id_col], value_set=wanted)
        return payload_prep(t.filter(mask))

    payloads = source_ds.map_batches(keep_candidates,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)

    # -- exchange 2: route payloads to their verify buckets -------------
    def conform_route(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if BUCKET_COL in t.column_names:           # need rows
            return pa.table({id_col: t[id_col], BUCKET_COL: t[BUCKET_COL],
                             payload_col: pa.nulls(n, type=payload_type),
                             "__kind": pa.array(
                                 np.ones(n, dtype=np.int8))})
        return pa.table({id_col: t[id_col],
                         BUCKET_COL: pa.nulls(n, type=pa.int32()),
                         payload_col: pc.cast(t[payload_col], payload_type),
                         "__kind": pa.array(np.zeros(n, dtype=np.int8))})

    routed_empty = pa.table({"__doc": pa.array([], type=pa.int64()),
                             payload_col: pa.array([], type=payload_type),
                             BUCKET_COL: pa.array([], type=pa.int32())})

    def route_payloads(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return routed_empty
        kind = t["__kind"].to_numpy(zero_copy_only=False)
        needs = t.filter(pa.array(kind == 1)).select([id_col, BUCKET_COL])
        pays = t.filter(pa.array(kind == 0)).select([id_col, payload_col])
        # left join keeps pairs whose doc is absent from the corpus:
        # they verify against the empty payload (verify_fn's
        # ``lookup.get`` miss), matching single-task semantics exactly
        joined = needs.join(pays, keys=[id_col], join_type="left outer")
        return pa.table({"__doc": pc.cast(joined[id_col], pa.int64()),
                         payload_col: joined[payload_col],
                         BUCKET_COL: pc.cast(joined[BUCKET_COL], pa.int32())})

    routed = hash_exchange([payloads, need_ds], [id_col], num_buckets,
                           route_payloads, bucket_col=None,
                           pre_fn=conform_route)

    # -- exchange 3: per-bucket exact verify ----------------------------
    def conform_verify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if "__doc" in t.column_names:              # routed payloads
            return pa.table({
                id_col: pa.nulls(n, type=pa.int64()),
                "dup_of": pa.nulls(n, type=pa.int64()),
                score_col: pa.nulls(n, type=pa.float64()),
                BUCKET_COL: t[BUCKET_COL],
                "__doc": t["__doc"], payload_col: t[payload_col],
                "__kind": pa.array(np.ones(n, dtype=np.int8))})
        return pa.table({
            id_col: t[id_col], "dup_of": t["dup_of"],
            score_col: t[score_col], BUCKET_COL: t[BUCKET_COL],
            "__doc": pa.nulls(n, type=pa.int64()),
            payload_col: pa.nulls(n, type=payload_type),
            "__kind": pa.array(np.zeros(n, dtype=np.int8))})

    def verify_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        kind = t["__kind"].to_numpy(zero_copy_only=False)
        pair_t = t.filter(pa.array(kind == 0))
        pay_t = t.filter(pa.array(kind == 1))
        if pair_t.num_rows == 0:
            return empty
        lookup = dict(zip(pay_t["__doc"].to_pylist(),
                          pay_t[payload_col].to_pylist()))
        a = pair_t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = pair_t["dup_of"].to_numpy(zero_copy_only=False).astype(np.int64)
        scores = verify_fn(a, b, lookup)
        keep = scores >= threshold
        return pa.table({id_col: pa.array(a[keep], type=pa.int64()),
                         "dup_of": pa.array(b[keep], type=pa.int64()),
                         score_col: pa.array(scores[keep],
                                             type=pa.float64())})

    return hash_exchange([pairs_ds, routed], [BUCKET_COL], num_buckets,
                         verify_bucket, bucket_col=BUCKET_COL,
                         pre_fn=conform_verify)


def _exact_verify_pairs(cand, docs_ds, text_col: str, id_col: str,
                        shingle_k: int, jaccard_threshold: float,
                        shingle_fn=None, num_buckets: int = 8):
    """Re-check candidate pairs with EXACT shingle Jaccard over the
    ``_routed_pair_verify`` three-exchange plan. The per-bucket kernel
    shingles each UNIQUE doc once (O(docs), not O(pairs)), then batches
    ALL pair intersections through one lexsort: tag every shingle with
    its pair index, sort by (pair, value) — a value present in both
    docs of a pair becomes an adjacent duplicate (per-doc shingle sets
    are unique), so the intersection size is a bincount of
    adjacent-equal positions (round-3 VERDICT #4: replaces the per-pair
    ``np.intersect1d`` Python loop)."""
    if shingle_fn is None:
        shingle_fn = codepoint_shingles

    def jaccard_verify(a: np.ndarray, b: np.ndarray, lookup) -> np.ndarray:
        uids = np.unique(np.concatenate([a, b]))
        arrays = [shingle_fn(lookup.get(int(i)) or "", shingle_k)
                  for i in uids]
        lens = np.fromiter((len(x) for x in arrays), dtype=np.int64,
                           count=len(arrays))
        ai = np.searchsorted(uids, a)
        bi = np.searchsorted(uids, b)
        pair_sizes = lens[ai] + lens[bi]
        n_pairs = len(a)
        if int(pair_sizes.sum()):
            vals = np.concatenate(
                [arr for i, j in zip(ai, bi)
                 for arr in (arrays[i], arrays[j])])
            pid = np.repeat(np.arange(n_pairs), pair_sizes)
            order = np.lexsort((vals, pid))
            sv, sp = vals[order], pid[order]
            dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
            inter = np.bincount(sp[1:][dup], minlength=n_pairs)
        else:
            inter = np.zeros(n_pairs, dtype=np.int64)
        return inter / np.maximum(pair_sizes - inter, 1)

    def text_prep(t: pa.Table) -> pa.Table:
        return t.select([id_col, text_col])

    return _routed_pair_verify(cand, docs_ds, id_col, text_col,
                               pa.string(), "jaccard", text_prep,
                               jaccard_verify, jaccard_threshold,
                               num_buckets=num_buckets)


def _cosine_verify_pairs(cand, vecs_ds, vec_col: str, id_col: str,
                         cosine_threshold: float, num_buckets: int = 8):
    """Exact-cosine candidate-pair verification over the
    ``_routed_pair_verify`` plan — the wide-vector companion to the
    code-only LSH candidate stage: vectors are fetched ONCE per
    (candidate doc, verify bucket) instead of shipping ×bands through
    the candidate exchange. Payloads travel as unit-normalized float32
    bytes (pa.binary — Acero's hash join can't carry list columns);
    the per-bucket kernel rebuilds the (docs, dim) matrix and computes
    every pair's cosine with one einsum."""
    from etlray.functions.ann import vectors_to_numpy

    def vec_prep(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t[id_col].combine_chunks() \
            if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        if n == 0:
            return pa.table({id_col: ids,
                             vec_col: pa.array([], type=pa.binary())})
        unit = vectors_to_numpy(t[vec_col]).astype(np.float32, copy=False)
        norms = np.linalg.norm(unit, axis=1, keepdims=True)
        unit = unit / np.maximum(norms, 1e-12)
        row_bytes = unit.shape[1] * 4
        if n * row_bytes < (1 << 31):
            # zero-copy construction: pa.binary() offsets are int32
            offsets = pa.py_buffer(
                (np.arange(n + 1, dtype=np.int64) * row_bytes)
                .astype(np.int32).tobytes())
            payload = pa.Array.from_buffers(
                pa.binary(), n,
                [None, offsets, pa.py_buffer(np.ascontiguousarray(unit)
                                             .tobytes())])
        else:
            # >2 GiB of vector bytes in one batch: int32 offsets would
            # wrap (from_buffers does NOT validate — silent corruption);
            # fall back to the row loop, which Arrow chunks safely
            payload = pa.array([row.tobytes() for row in unit],
                               type=pa.binary())
        return pa.table({id_col: ids, vec_col: payload})

    def cosine_verify(a: np.ndarray, b: np.ndarray, lookup) -> np.ndarray:
        uids = np.unique(np.concatenate([a, b]))
        bufs = [lookup.get(int(i)) for i in uids]
        dim = next((len(x) // 4 for x in bufs if x), 0)
        if dim == 0:
            return np.zeros(len(a), dtype=np.float64)
        unit = np.zeros((len(uids), dim), dtype=np.float32)
        for k, x in enumerate(bufs):
            if not x:
                continue  # doc absent from corpus → zero vector
            if len(x) != dim * 4:
                # fail LOUDLY like the inline path does on ragged
                # vectors (vectors_to_numpy raises) — silently zeroing
                # a mismatched row would drop its pairs as false
                # negatives with no diagnostic
                raise ValueError(
                    f"embedding width mismatch in cosine verify: doc "
                    f"{int(uids[k])} has {len(x)} payload bytes, "
                    f"expected {dim * 4} (dim {dim})")
            unit[k] = np.frombuffer(x, dtype=np.float32)
        ai = np.searchsorted(uids, a)
        bi = np.searchsorted(uids, b)
        return np.einsum("ij,ij->i", unit[ai], unit[bi]) \
            .astype(np.float64)

    return _routed_pair_verify(cand, vecs_ds, id_col, vec_col,
                               pa.binary(), "cosine", vec_prep,
                               cosine_verify, cosine_threshold,
                               num_buckets=num_buckets)


def codepoint_shingles(text: str, k: int = 5) -> np.ndarray:
    """Unique k-CODEPOINT shingle hashes of the whitespace-normalized
    text (``char_shingles`` windows over utf-8 BYTES; this variant
    windows over characters, matching SQL ``substring`` semantics so a
    DuckDB oracle can recompute the same shingle sets). Texts shorter
    than ``k`` produce exactly one (padded) shingle."""
    return _windowed_shingles(text, k, "utf-32-le", np.uint32,
                              1099511628211)


_NGRAM_DENSE_CELLS = 1 << 27   # doc×shingle incidence cap (512 MB f32)


def _ngram_jaccard_dense(ds, explode, threshold: float):
    """Dense co-occurrence path for ``ngram_jaccard_pairs`` (see its
    docstring): gather the (doc, shingle-hash) incidence of a SMALL
    input (caller gates at ≤64 MB), build the doc×distinct-shingle 0/1
    matrix once, broadcast it via ``ray.put`` (plasma: every task maps
    the same buffer zero-copy), and fan out row chunks — each task
    computes its slice of c = S·Sᵀ with one BLAS call and emits only
    the pairs with J ≥ threshold. Returns None when the incidence
    exceeds the dense cap (caller falls back to the inverted index)."""
    import ray
    import ray.data

    out_schema = pa.schema([("doc_id_a", pa.int64()),
                            ("doc_id_b", pa.int64()),
                            ("jaccard", pa.float64())])
    # Gather incrementally and bail EARLY: checking the dense cap only
    # after concatenating the full incidence would burn ~24 B/row of
    # driver memory (and a full input execution) on inputs destined for
    # the sparse path anyway. Running distinct-doc/shingle counts give
    # an exact lower bound on the final n*v after each batch.
    inc_parts = []
    # set.update of per-batch uniques is O(batch) per batch; np.union1d
    # on the RUNNING arrays would re-sort the whole accumulated vocab
    # (up to ~10^7 entries) on every batch — O(batches × V log V).
    run_docs: set = set()
    run_vocab: set = set()
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        p = explode(b)
        if p.num_rows == 0:
            continue
        inc_parts.append(p)
        run_docs.update(
            np.unique(p["doc"].to_numpy(zero_copy_only=False)).tolist())
        run_vocab.update(np.unique(
            p["shingle"].to_numpy(zero_copy_only=False)).tolist())
        if len(run_docs) * len(run_vocab) > _NGRAM_DENSE_CELLS:
            return None
    if not inc_parts:
        return ray.data.from_arrow(out_schema.empty_table())
    inc = pa.concat_tables(inc_parts)
    sh = inc["shingle"].to_numpy(zero_copy_only=False)
    doc = inc["doc"].to_numpy(zero_copy_only=False)
    vocab, sh_idx = np.unique(sh, return_inverse=True)
    docs, doc_idx = np.unique(doc, return_inverse=True)
    n, v = len(docs), len(vocab)
    if n * v > _NGRAM_DENSE_CELLS:
        return None
    # float32 matmul exactness gate: co-occurrence counts accumulate in
    # float32 and stay exact only below 2^24; a doc with ≥2^24 distinct
    # shingles could round c and silently flip pairs across the
    # threshold, breaking bit-equality with the sparse int64 path.
    if np.bincount(doc_idx).max() >= (1 << 24):
        return None
    S = np.zeros((n, v), dtype=np.float32)
    S[doc_idx, sh_idx] = 1.0
    nsh = S.sum(axis=1, dtype=np.float64)       # shingles are unique/doc
    s_ref = ray.put(S)
    docs_ref = ray.put(docs.astype(np.int64))
    nsh_ref = ray.put(nsh)

    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    chunk = max(256, -(-n // (2 * ncpu)))

    @ray.remote
    def pair_chunk(lo: int, hi: int) -> pa.Table:
        s = ray.get(s_ref)          # zero-copy plasma view
        ids = ray.get(docs_ref)
        counts = ray.get(nsh_ref)
        c = (s[lo:hi] @ s.T).astype(np.float64)   # exact ints < 2^24
        j = c / (counts[lo:hi, None] + counts[None, :] - c)
        # strict upper triangle in sorted-doc space → a < b by id
        cols = np.arange(len(ids))[None, :]
        rows = np.arange(lo, hi)[:, None]
        keep = (j >= threshold) & (rows < cols)
        ii, jj = np.nonzero(keep)
        return pa.table({"doc_id_a": pa.array(ids[lo + ii], type=pa.int64()),
                         "doc_id_b": pa.array(ids[jj], type=pa.int64()),
                         "jaccard": pa.array(j[ii, jj], type=pa.float64())})

    refs = [pair_chunk.remote(lo, min(lo + chunk, n))
            for lo in range(0, n, chunk)]
    return ray.data.from_arrow_refs(refs)


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    num_buckets: int = 16,
    dense: bool | str = "auto",
):
    """EXACT n-gram Jaccard similarity self-join via a distributed
    inverted index — the precise baseline to ``minhash_lsh_candidates``'
    probabilistic one.

    Plan: explode each doc to (shingle_hash, doc_id, doc_shingle_count)
    rows → shuffle on shingle_hash → per-bucket co-occurrence counting
    (every pair of docs sharing a shingle gets +1, vectorized per
    shingle group) → shuffle on the pair → J = c / (|A| + |B| - c),
    filter ≥ threshold. Returns (doc_id_a, doc_id_b, jaccard), a < b.

    Cost is Σ_shingle C(df, 2) — exact similarity joins are inherently
    quadratic in per-shingle document frequency. Use on bounded inputs
    (a partition, a candidate subset); at 100 TB use the MinHash-LSH
    path, which this operator oracles at small scale.

    Dense fast path (auto): when the input is small (≤64 MB metadata
    estimate) and the doc×distinct-shingle incidence fits a dense
    matrix (≤2^27 cells), the co-occurrence counts come from ONE
    broadcast float32 matmul per row chunk (c = S·Sᵀ) instead of the
    inverted-index pair explosion — on template-heavy corpora where
    every shingle is hot (df ≈ n_docs) the explosion is Σ C(df,2)
    ≈ 770M pair rows at sf0.1 and its giant lexsort made wall time
    swing 6–20 s run to run; the matmul is ~3 GFLOP, deterministic,
    and bit-identical (c stays an exact integer below 2^24 in float32;
    the J division is float64 on both paths). Sparse corpora and big
    inputs keep the inverted-index plan."""
    from etlray.exchange import hash_exchange

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        sh_out, id_out, n_out = [], [], []
        for i, txt in zip(ids, texts):
            if txt is None:
                continue
            sh = codepoint_shingles(txt, shingle_k)
            sh_out.append(sh.view(np.int64))
            id_out.append(np.full(len(sh), i, dtype=np.int64))
            n_out.append(np.full(len(sh), len(sh), dtype=np.int64))
        if not sh_out:
            return pa.table({"shingle": pa.array([], type=pa.int64()),
                             "doc": pa.array([], type=pa.int64()),
                             "nsh": pa.array([], type=pa.int64())})
        return pa.table({"shingle": pa.array(np.concatenate(sh_out)),
                         "doc": pa.array(np.concatenate(id_out)),
                         "nsh": pa.array(np.concatenate(n_out))})

    if dense is True or dense == "auto":
        from etlray.stages.common import meta_size_bytes

        in_size = meta_size_bytes(ds)
        if dense is True or (in_size is not None
                             and in_size <= (64 << 20)):
            out = _ngram_jaccard_dense(ds, explode, threshold)
            if out is not None:
                return out

    incid = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("c", pa.int64()), ("na", pa.int64()),
                             ("nb", pa.int64())])

    def _pair_runs(a, b, na, nb, c=None):
        """Aggregate (a, b) pair rows via lexsort + run-length reduce —
        pandas' two-key groupby measured 144 s on the same 7.8M rows
        this does in ~2 s."""
        order = np.lexsort((b, a))
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        c = np.ones(len(a), dtype=np.int64) if c is None else c[order]
        new = np.empty(len(a), dtype=bool)
        new[0] = True
        np.not_equal(a[1:], a[:-1], out=new[1:])
        np.logical_or(new[1:], b[1:] != b[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        counts = np.add.reduceat(c, starts)
        return a[starts], b[starts], counts, na[starts], nb[starts]

    def count_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        sh = t["shingle"].to_numpy(zero_copy_only=False)
        doc = t["doc"].to_numpy(zero_copy_only=False)
        nsh = t["nsh"].to_numpy(zero_copy_only=False)
        order = np.argsort(sh, kind="stable")
        sh, doc, nsh = sh[order], doc[order], nsh[order]
        cuts = np.flatnonzero(np.diff(sh)) + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(sh)]))
        tri: dict[int, tuple] = {}
        a_l, b_l, na_l, nb_l = [], [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m not in tri:
                tri[m] = np.triu_indices(m, k=1)
            ii, jj = tri[m]
            d = doc[s:e]
            n = nsh[s:e]
            a_l.append(d[ii]); b_l.append(d[jj])
            na_l.append(n[ii]); nb_l.append(n[jj])
        if not a_l:
            return pair_schema.empty_table()
        A = np.concatenate(a_l); B = np.concatenate(b_l)
        NA = np.concatenate(na_l); NB = np.concatenate(nb_l)
        # normalize pair orientation once, vectorized (docs within a
        # shingle group are unsorted)
        swap = A > B
        lo = np.where(swap, B, A); hi = np.where(swap, A, B)
        nlo = np.where(swap, NB, NA); nhi = np.where(swap, NA, NB)
        a, b, c, na, nb = _pair_runs(lo, hi, nlo, nhi)
        return pa.table({"a": pa.array(a), "b": pa.array(b), "c": pa.array(c),
                         "na": pa.array(na), "nb": pa.array(nb)},
                        schema=pair_schema)

    partial = hash_exchange(incid, ["shingle"], num_buckets, count_bucket,
                            bucket_col=None)

    out_schema = pa.schema([("doc_id_a", pa.int64()), ("doc_id_b", pa.int64()),
                            ("jaccard", pa.float64())])

    def finalize_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        a, b, c, na, nb = _pair_runs(
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False),
            t["na"].to_numpy(zero_copy_only=False),
            t["nb"].to_numpy(zero_copy_only=False),
            c=t["c"].to_numpy(zero_copy_only=False))
        j = c / (na + nb - c)
        keep = j >= threshold
        return pa.table({"doc_id_a": pa.array(a[keep], type=pa.int64()),
                         "doc_id_b": pa.array(b[keep], type=pa.int64()),
                         "jaccard": pa.array(j[keep], type=pa.float64())})

    return hash_exchange(partial, ["a", "b"], 8, finalize_pairs, bucket_col=None)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_TOKEN_MD5_CACHE: dict[str, int] = {}


def _md5_token_hashes(tokens: np.ndarray) -> np.ndarray:
    """md5-lower-64 per UNIQUE token (little-endian uint64 of md5
    digest bytes [8:16] — bit-identical to DuckDB's
    ``md5_number_lower(t)::UBIGINT``, which is what lets a SQL oracle
    recompute the exact same SimHash). Vocabulary ≪ corpus, so the
    per-unique-token Python md5 amortizes to ~0 via a process-level
    cache that persists across batches in each worker."""
    out = np.empty(len(tokens), dtype=np.uint64)
    cache = _TOKEN_MD5_CACHE
    for i, t in enumerate(tokens):
        v = cache.get(t)
        if v is None:
            v = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:16],
                               "little")
            if len(cache) < 4_000_000:      # bound worker memory
                cache[t] = v
        out[i] = v
    return out


def simhash64_batch(texts: list) -> list:
    """64-bit SimHash over word tokens (weight 1 each), vectorized over
    a whole batch: factorize every token of every doc (C loop), one md5
    per NEW unique token (cached), one (tokens × 64) ±1 bit matrix, and
    per-doc column sums via np.add.reduceat at the doc boundaries — no
    per-token Python in the hot path. Returns int64-or-None per doc
    (None for null docs; empty docs hash to 0)."""
    tok_lists = [None if t is None else t.lower().split() for t in texts]
    counts = np.array([0 if tl is None else len(tl) for tl in tok_lists],
                      dtype=np.int64)
    all_toks = [tok for tl in tok_lists if tl for tok in tl]
    out = np.zeros(len(texts), dtype=np.uint64)
    if all_toks:
        codes, uniques = pd.factorize(np.array(all_toks, dtype=object))
        h = _md5_token_hashes(np.asarray(uniques, dtype=object))[codes]
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)) \
            .astype(np.int32)
        contrib = bits * 2 - 1                      # ±1 per (token, bit)
        nonempty = counts > 0
        offsets = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
        sums = np.add.reduceat(contrib, offsets, axis=0)
        sig = ((sums > 0).astype(np.uint64)
               << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
        out[nonempty] = sig
    signed = out.view(np.int64)
    return [None if tl is None else int(v) for tl, v in zip(tok_lists, signed)]


def simhash64(text: str) -> int:
    """Single-doc convenience wrapper over the batch kernel."""
    return simhash64_batch([text])[0]


def add_simhash(ds, text_col: str = "text"):
    def f(t: pa.Table) -> pa.Table:
        vals = simhash64_batch(t[text_col].to_pylist())
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


def _band_codes(vecs: np.ndarray, num_planes: int, num_bands: int,
                seed: int) -> np.ndarray:
    """(n, num_bands) int64 sign codes: ``num_bands·num_planes`` seeded
    random hyperplanes, each band's plane signs packed into one int.
    Pure function of (vector, seed) — identical in every worker and in
    both the inline and code-only candidate paths."""
    n, dim = vecs.shape
    planes = np.random.default_rng(seed).standard_normal(
        (dim, num_bands * num_planes)).astype(np.float32)
    signs = (vecs @ planes) > 0                     # (n, B*r)
    return (signs.reshape(n, num_bands, num_planes)
            * (1 << np.arange(num_planes))).sum(axis=2).astype(np.int64)


def _peek_vector_dim(ds, vec_col: str) -> int:
    """Vector width for the inline/code-only dispatch: free from the
    schema when the column is fixed_size_list, else one-row sample."""
    s = ds.schema()
    t = dict(zip(s.names, s.types)).get(vec_col)
    if t is not None and pa.types.is_fixed_size_list(t):
        return t.list_size
    rows = ds.limit(1).take_all()
    if rows and rows[0].get(vec_col) is not None:
        return len(rows[0][vec_col])
    return 0


def _embedding_near_dups_code_only(ds, vec_col, id_col, num_planes,
                                   num_bands, cosine_threshold, seed,
                                   num_buckets: int = 8):
    """Wide-vector mode of ``embedding_near_dups``: the (band, code)
    candidate exchange carries ONLY ~20 B (band, code, id) rows — never
    the vector — and the exact cosine fetches each candidate's vector
    once per verify bucket via ``_cosine_verify_pairs``. Exchange
    volume per row is bounded regardless of ``dim`` (round-3 VERDICT
    #5: the inline path ships the vector ×num_bands, 64 KB/row at
    dim-1024)."""
    from etlray.functions.ann import vectors_to_numpy

    def bucketize(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"band": pa.array([], type=pa.int32()),
                             "code": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64())})
        codes = _band_codes(vectors_to_numpy(t[vec_col]), num_planes,
                            num_bands, seed)
        ids = t[id_col].combine_chunks() \
            if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        rep = pa.array(np.repeat(np.arange(n), num_bands))
        return pa.table({
            "band": pa.array(np.tile(np.arange(num_bands,
                                               dtype=np.int32), n)),
            "code": pa.array(codes.reshape(-1)),
            id_col: ids.take(rep),
        })

    coded = ds.map_batches(bucketize, batch_format="pyarrow",
                           zero_copy_batch=True)

    pair_schema = pa.schema([(id_col, pa.int64()),
                             ("dup_of", pa.int64()),
                             ("cosine", pa.float64())])

    def pairs_bucket(t: pa.Table) -> pa.Table:
        """All within-(band, code) pairs, id > dup_of, locally deduped.
        ``cosine`` is a placeholder 0.0 — ``_routed_pair_verify``'s
        first exchange uses it only as an LWW tiebreak; the exact value
        is computed at verify."""
        if t.num_rows == 0:
            return pair_schema.empty_table()
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = t["code"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, code, band))
        band, code, ids = band[order], code[order], ids[order]
        new = np.empty(len(ids), dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (code[1:] != code[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ids))
        tri: dict[int, tuple] = {}
        a_l, b_l = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            if m not in tri:
                tri[m] = np.triu_indices(m, k=1)
            ii, jj = tri[m]
            grp = ids[s:e]                 # ascending within the group
            a_l.append(grp[jj])            # id_col > dup_of, matching
            b_l.append(grp[ii])            # the inline path's rows
        if not a_l:
            return pair_schema.empty_table()
        a = np.concatenate(a_l)
        b = np.concatenate(b_l)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        first = np.empty(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[first], b[first]
        return pa.table({id_col: pa.array(a, type=pa.int64()),
                         "dup_of": pa.array(b, type=pa.int64()),
                         "cosine": pa.array(np.zeros(len(a)),
                                            type=pa.float64())})

    from etlray.exchange import hash_exchange

    cand = hash_exchange(coded, ["band", "code"], num_buckets,
                         pairs_bucket, bucket_col=None)
    return _cosine_verify_pairs(cand, ds, vec_col, id_col,
                                cosine_threshold,
                                num_buckets=num_buckets)


def embedding_near_dups(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    num_bands: int = 16,
    cosine_threshold: float = 0.95,
    seed: int = 11,
    candidates: str = "auto",
    inline_band_bytes: int = 16384,
    dim: int | None = None,
):
    """Multi-band random-hyperplane LSH near-dup detection over an
    embedding column: every vector gets ``num_bands`` INDEPENDENT sign
    codes of ``num_planes`` hyperplanes each; a pair becomes a
    candidate if ANY band's codes collide (OR over bands — the same
    banding trick as MinHash-LSH), and exact pairwise cosine decides.
    A pair surfacing from several bands carries the identical cosine
    (a dot product of the same two unit rows), so the final per-pair
    exchange dedupes it exactly.

    Recall for a pair at cosine c is ``1 - (1 - p^r)^B`` with
    ``p = 1 - arccos(c)/π``: ≈ 1 - 1.4e-4 at c = 0.95 and ≈ 1 - 2e-6 at
    c = 0.97 with the default r=8, B=16 — a single 12-plane code (the
    round-2 design) caught a 0.95-cosine pair only ~28% of the time.

    ``candidates`` picks how the vector reaches the in-bucket cosine:

    * ``"inline"``: the vector column rides the (band, code) exchange
      ×B (256 B × 16 for dim-64 float32 — fine for narrow embedding
      tables; one exchange total).
    * ``"code_only"``: the exchange carries only (band, code, id) rows
      (~20 B each, ×B); candidate pairs come back code-only and the
      exact cosine fetches each candidate's vector ONCE per verify
      bucket through ``_cosine_verify_pairs`` (the
      ``_routed_pair_verify`` plan — round-3 VERDICT #5). Four
      exchanges, but per-row exchange volume is bounded regardless of
      ``dim``.
    * ``"auto"`` (default): ``"inline"`` while the per-row shipping
      cost ``dim · 4 B · num_bands`` stays ≤ ``inline_band_bytes``
      (16 KiB ≈ dim-256 at B=16), else ``"code_only"``. Pass ``dim``
      when known: without it (and without a fixed_size_list schema)
      auto has to peek one row, which executes the upstream pipeline's
      first block once just for the dispatch."""
    if candidates not in ("auto", "inline", "code_only"):
        raise ValueError("candidates must be 'auto', 'inline' or "
                         "'code_only'")
    if candidates == "auto":
        if dim is None:
            dim = _peek_vector_dim(ds, vec_col)
        candidates = ("inline"
                      if dim * 4 * num_bands <= inline_band_bytes
                      else "code_only")
    if candidates == "code_only":
        return _embedding_near_dups_code_only(
            ds, vec_col, id_col, num_planes, num_bands,
            cosine_threshold, seed)

    def bucketize(t: pa.Table) -> pa.Table:
        from etlray.functions.ann import vectors_to_numpy

        n = t.num_rows
        if n == 0:
            return pa.table({"band": pa.array([], type=pa.int32()),
                             "code": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             vec_col: pa.array([], type=t[vec_col].type)})
        codes = _band_codes(vectors_to_numpy(t[vec_col]), num_planes,
                            num_bands, seed)            # (n, B)
        rep = pa.array(np.repeat(np.arange(n), num_bands))
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        vcs = t[vec_col].combine_chunks() if isinstance(t[vec_col], pa.ChunkedArray) else t[vec_col]
        return pa.table({
            "band": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n)),
            "code": pa.array(codes.reshape(-1)),
            id_col: ids.take(rep),
            vec_col: vcs.take(rep),
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

    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "dup_of": pa.array([], type=pa.int64()),
                      "cosine": pa.array([], type=pa.float64())})

    def pairwise_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        out = df.groupby(["band", "code"], sort=False)[[id_col, vec_col]] \
            .apply(pairwise_group).reset_index(drop=True)
        if len(out) == 0:
            return empty
        return pa.table({id_col: pa.array(out[id_col], type=pa.int64()),
                         "dup_of": pa.array(out["dup_of"], type=pa.int64()),
                         "cosine": pa.array(out["cosine"], type=pa.float64())})

    from etlray.exchange import hash_exchange

    band_pairs = hash_exchange(bucketed, ["band", "code"], 8, pairwise_bucket,
                               bucket_col=None)

    def uniq_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = lww_reduce(t, [id_col, "dup_of"], "cosine")
        return t.drop_columns([c for c in (BUCKET_COL,)
                               if c in t.column_names])

    return hash_exchange(band_pairs, [id_col, "dup_of"], 8, uniq_pairs,
                         bucket_col=None)


# ---------------------------------------------------------------------------
# duplicate-cluster canonicalization (connected components over pairs)
# ---------------------------------------------------------------------------
def dup_clusters(pairs_ds, id_col: str = "doc_id", dup_col: str = "dup_of",
                 driver_pair_limit: int = 2_000_000, num_buckets: int = 16,
                 max_rounds: int = 64):
    """Connected components over a near-dup pair list → cluster
    membership table ``(id_col, canonical_id)``, one row per doc that
    belongs to any dup cluster (the canonical doc maps to itself;
    canonical = min id in the component). This is the "keep one per
    cluster" step that follows any pairwise dedup detector
    (minhash_lsh_candidates / simhash_dup_groups / embedding_near_dups).

    Two execution paths, picked by pair count:

    * ``pairs ≤ driver_pair_limit``: the pair list is collected to the
      driver and resolved with path-compressed union-find — fastest
      when pairs fit comfortably in driver memory (each pair row is
      16 bytes).
    * beyond the limit: ``dup_clusters_distributed`` — iterative
      hash-min label propagation over bucketed edge partitions; the
      pair list never materializes on the driver (only per-round
      changed-counts do), so the 100-TB ceiling is object-store size,
      not driver heap.

    Either way the corpus itself never shuffles: apply the membership
    table back with ``keep_canonical`` — a broadcast ``ray.put``
    lookup inside map_batches."""
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() > driver_pair_limit:
        return dup_clusters_distributed(pairs_ds, id_col, dup_col,
                                        num_buckets=num_buckets,
                                        max_rounds=max_rounds)
    return _dup_clusters_unionfind(pairs_ds, id_col, dup_col)


def _dup_clusters_unionfind(pairs_ds, id_col: str, dup_col: str):
    """Driver-side path-compressed union-find over the gathered pair
    list (the small-pair-list fast path of ``dup_clusters``)."""
    import ray
    import ray.data

    tables = ray.get(pairs_ds.to_arrow_refs())
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for t in tables:
        if t.num_rows == 0:
            continue
        for a, b in zip(t[id_col].to_pylist(), t[dup_col].to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    members: dict = {}
    for n in list(parent):
        members.setdefault(find(n), []).append(n)
    out_id, out_canon = [], []
    for root, ms in members.items():
        canon = min(ms)  # min of component, not the UF root per se
        for n in ms:
            out_id.append(n)
            out_canon.append(canon)
    tbl = pa.table({id_col: pa.array(out_id, type=pa.int64()),
                    "canonical_id": pa.array(out_canon, type=pa.int64())})
    return ray.data.from_arrow(tbl.sort_by(id_col))


def dup_clusters_distributed(pairs_ds, id_col: str = "doc_id",
                             dup_col: str = "dup_of",
                             num_buckets: int = 16, max_rounds: int = 64):
    """Connected components over a pair list WITHOUT gathering it to
    the driver: iterative hash-min label propagation (the MapReduce CC
    algorithm of Rastogi et al. 2013) over hash-bucketed edge
    partitions.

    Plan (raw Ray tasks — the one shape the Dataset API can't express:
    a fixpoint loop over a partitioned mutable label table):

    1. explode pairs to both edge orientations, one ``hash_exchange``
       on src → per-bucket sorted, deduped edge tables whose refs stay
       in the object store across every round (edges never re-shuffle);
    2. labels init per bucket: ``label(v) = min(v, min neighbor)`` —
       the first half-round for free;
    3. each round, per bucket: join labels onto edges by src (both
       sides sorted → one searchsorted), pre-combine to one min-label
       message per dst, split messages by the same stable hash the
       edge exchange used; then per bucket ``new = min(old, msgs)``
       with a changed-count side output. Stop at fixpoint.

    Rounds = graph diameter + 1; near-dup clusters are near-cliques, so
    typically 2-3. Per-round traffic is ≤ one (node, label) row per
    (dst, source-bucket) — O(nodes·buckets) worst case, independent of
    edge count. Only per-round changed-counts ever reach the driver."""
    import ray
    import ray.data

    from etlray.cdc.apply import stable_bucket
    from etlray.exchange import hash_exchange

    lab_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def both_dirs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_schema.empty_table()
        a = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t[dup_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def compact_edges(t: pa.Table) -> pa.Table:
        """Sort by src and drop duplicate edges (a pair listed twice
        collapses); the sorted order is what lets every later round
        join by searchsorted instead of a hash build."""
        if t.num_rows == 0:
            return edge_schema.empty_table()
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keep = np.ones(len(s), dtype=bool)
        np.logical_or(s[1:] != s[:-1], d[1:] != d[:-1], out=keep[1:])
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    e_refs = list(hash_exchange(edges, ["src"], num_buckets, compact_edges,
                                bucket_col=None, as_refs=True))

    @ray.remote
    def init_labels(e: pa.Table) -> pa.Table:
        if e.num_rows == 0:
            return lab_schema.empty_table()
        s = e["src"].to_numpy(zero_copy_only=False)
        d = e["dst"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        node = s[starts]
        lab = np.minimum(node, np.minimum.reduceat(d, starts))
        return pa.table({"node": pa.array(node), "label": pa.array(lab)})

    @ray.remote(num_returns=max(num_buckets, 2))
    def propagate(e: pa.Table, lab: pa.Table):
        """Emit one (dst, min incoming label) message per dst of this
        bucket's edges, split by the dst's label bucket."""
        empties = [lab_schema.empty_table()] * max(num_buckets, 2)
        if e.num_rows == 0 or lab.num_rows == 0:
            return tuple(empties)
        s = e["src"].to_numpy(zero_copy_only=False)
        d = e["dst"].to_numpy(zero_copy_only=False)
        nodes = lab["node"].to_numpy(zero_copy_only=False)
        labels = lab["label"].to_numpy(zero_copy_only=False)
        lv = labels[np.searchsorted(nodes, s)]   # every src has a label row
        # pre-combine: min label per dst before anything ships
        order = np.lexsort((lv, d))
        d, lv = d[order], lv[order]
        first = np.concatenate(([True], d[1:] != d[:-1]))
        d, lv = d[first], lv[first]
        msg = pa.table({"node": pa.array(d), "label": pa.array(lv)})
        buckets = stable_bucket(msg, ["node"], num_buckets)
        order = np.argsort(buckets, kind="stable")
        msg = msg.take(pa.array(order))
        bounds = np.searchsorted(buckets[order], np.arange(num_buckets + 1))
        out = [msg.slice(bounds[b], bounds[b + 1] - bounds[b])
               for b in range(num_buckets)]
        while len(out) < 2:
            out.append(lab_schema.empty_table())
        return tuple(out)

    @ray.remote(num_returns=2)
    def min_step(lab: pa.Table, *msg_parts: pa.Table):
        if lab.num_rows == 0:
            return lab, 0
        nodes = lab["node"].to_numpy(zero_copy_only=False)
        new = lab["label"].to_numpy(zero_copy_only=False).copy()
        for m in msg_parts:
            if m.num_rows == 0:
                continue
            mn = m["node"].to_numpy(zero_copy_only=False)
            ml = m["label"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nodes, mn)
            # every message targets a node that exists in this bucket
            np.minimum.at(new, pos, ml)
        changed = int(np.count_nonzero(
            new < lab["label"].to_numpy(zero_copy_only=False)))
        return pa.table({"node": pa.array(nodes), "label": pa.array(new)}), \
            changed

    lab_refs = [init_labels.remote(r) for r in e_refs]
    nb = len(e_refs)
    for _round in range(max_rounds):
        msg_out = [propagate.remote(e_refs[b], lab_refs[b])
                   for b in range(nb)]
        new_refs, ch_refs = [], []
        for b in range(nb):
            parts = [msg_out[src][b] for src in range(nb)]
            lr, cr = min_step.remote(lab_refs[b], *parts)
            new_refs.append(lr)
            ch_refs.append(cr)
        lab_refs = new_refs
        if sum(ray.get(ch_refs)) == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters_distributed did not converge in {max_rounds} "
            "rounds — the pair graph has a path longer than max_rounds; "
            "raise max_rounds (rounds are cheap: one label exchange each)")

    @ray.remote
    def to_members(lab: pa.Table) -> pa.Table:
        return pa.table({id_col: lab["node"], "canonical_id": lab["label"]})

    return ray.data.from_arrow_refs([to_members.remote(r) for r in lab_refs])


def keep_canonical(docs_ds, members_ds, id_col: str = "doc_id"):
    """Drop non-canonical cluster members from the corpus. The (small)
    membership table is broadcast once via ``ray.put``; each batch
    filters locally — no shuffle, corpus streams through."""
    import ray

    drop: set = set()
    for t in ray.get(members_ds.to_arrow_refs()):
        for i, c in zip(t[id_col].to_pylist(), t["canonical_id"].to_pylist()):
            if i != c:
                drop.add(i)
    drop_ref = ray.put(pa.array(sorted(drop), type=pa.int64()))

    def f(t: pa.Table) -> pa.Table:
        bad = ray.get(drop_ref)
        return t.filter(pc.invert(pc.is_in(t[id_col], value_set=bad)))

    return docs_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
