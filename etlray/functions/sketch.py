"""Mergeable sketches for 100 TB-scale profiling.

* ``HyperLogLog`` — approximate count-distinct with the classic
  (Flajolet et al. 2007) small-range correction. Registers are a
  numpy uint8 array; sketches MERGE by elementwise max, which is what
  makes the distributed shape trivial: one sketch per block
  (map_batches), one tiny (2^p bytes) object per block to the driver,
  elementwise-max merge there. No shuffle at all — compare with the
  exact ``CountDistinctTransform``, whose output is exact but whose
  shuffle carries every distinct value.

* ``BloomFilter`` — bitset membership sketch used by
  ``PartitionedHashJoinTransform(bloom_prefilter=True)``: build on the
  smaller side's keys, broadcast once, drop non-matching probe rows
  BEFORE the all-to-all exchange. False positives only cost shuffle
  bytes — never correctness (the real join still runs per bucket).

Both hash with seeded SipHash (``pd.util.hash_array``) — identical in
every worker, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash64(values: np.ndarray, key: str) -> np.ndarray:
    return pd.util.hash_array(np.asarray(values, dtype=object), hash_key=key)


class HyperLogLog:
    def __init__(self, p: int = 12) -> None:
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_array(self, values) -> "HyperLogLog":
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.drop_null().to_pylist()
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return self
        h = _hash64(values, key="etlray_hll_00001")  # exactly 16 bytes
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, +1 (capped)
        lz = np.full(len(h), 64 - self.p, dtype=np.int64)
        mask = rest != 0
        if mask.any():
            # vectorized count-leading-zeros by binary shifting (float
            # log2 would lose precision beyond 53 bits)
            lz_m = np.zeros(int(mask.sum()), dtype=np.int64)
            cur = rest[mask].copy()
            for shift in (32, 16, 8, 4, 2, 1):
                zero_top = cur < (np.uint64(1) << np.uint64(64 - shift))
                lz_m[zero_top] += shift
                cur[zero_top] <<= np.uint64(shift)
            lz[mask] = np.minimum(lz_m, 64 - self.p)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def cardinality(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)   # linear counting
        return float(est)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approximate count-distinct: one HLL per block
    (map_batches emits the 2^p-byte register array), elementwise-max
    merge on the driver. Error ≈ 1.04/sqrt(2^p) (~1.6 % at p=12)."""

    def sketch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_array(t[col])
        return pa.table({"registers": pa.array([h.registers.tobytes()],
                                               type=pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    merged = HyperLogLog(p)
    for r in parts:
        other = HyperLogLog(p)
        other.registers = np.frombuffer(r["registers"], dtype=np.uint8).copy()
        merged.merge(other)
    return merged.cardinality()


class BloomFilter:
    """Fixed-size bitset with k derived hash probes; vectorized add
    and query. ~10 bits/key → ~1 % false positives."""

    def __init__(self, num_keys: int, bits_per_key: int = 10,
                 num_hashes: int = 7) -> None:
        self.nbits = max(64, int(num_keys) * bits_per_key)
        self.k = num_hashes
        self.bits = np.zeros((self.nbits + 63) // 64, dtype=np.uint64)

    def _positions(self, values) -> np.ndarray:
        h1 = _hash64(values, key="etlray_bloom_001")
        h2 = _hash64(values, key="etlray_bloom_002") | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.nbits)

    def add_array(self, values) -> "BloomFilter":
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.drop_null().to_pylist()
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return self
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return self

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if other.nbits != self.nbits or other.k != self.k:
            raise ValueError("cannot merge differently-sized blooms")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def contains_array(self, values) -> np.ndarray:
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_pylist()
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)


class QuantileSketch:
    """Deterministic mergeable quantile summary — a weighted sorted
    sample compressed to ``capacity`` distinct values.

    EXACT while the number of distinct values ≤ capacity (no
    compression happens — which is what lets the small-scale oracle
    compare it against SQL ``quantile_disc`` bit-for-bit); beyond
    that, compression re-samples the weighted CDF at equi-weight
    midpoints, bounding rank error by ~total_weight/capacity per
    compression round. Fully deterministic (no randomized compaction à
    la KLL), so retries and partition order cannot change the answer.

    Distributed shape (``approx_quantiles``): one sketch per block via
    map_batches, ≤ capacity (value, weight) pairs per block to the
    driver, pairwise merge there — no shuffle, mirroring HyperLogLog
    above. Compare with the exact ``QuantilePerGroupTransform``, whose
    exchange carries one row per distinct (group, value) per block."""

    def __init__(self, capacity: int = 1 << 17) -> None:
        if capacity < 2:
            raise ValueError("capacity must be >= 2")
        self.capacity = int(capacity)
        self.vals = np.empty(0, np.float64)
        self.wts = np.empty(0, np.int64)

    @property
    def total(self) -> int:
        return int(self.wts.sum())

    def add_array(self, values) -> "QuantileSketch":
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_numpy(zero_copy_only=False)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self._absorb(v, np.ones(len(v), dtype=np.int64))
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        self._absorb(other.vals, other.wts)
        return self

    def merge_many(self, sketches) -> "QuantileSketch":
        """Fold a whole list in ONE absorb — a single compression round
        instead of one per pairwise merge, so rank error stays ~2
        rounds (partial build + this fold) rather than compounding
        with the number of blocks. Use this in distributed reducers."""
        sketches = list(sketches)
        if not sketches:
            return self
        self._absorb(np.concatenate([s.vals for s in sketches]),
                     np.concatenate([s.wts for s in sketches]))
        return self

    def _absorb(self, vals: np.ndarray, wts: np.ndarray) -> None:
        v = np.concatenate([self.vals, vals])
        w = np.concatenate([self.wts, wts])
        if len(v) == 0:
            return
        # collapse duplicate values (weight sum) — heavy-hitter-friendly
        uv, inv = np.unique(v, return_inverse=True)
        uw = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
        if len(uv) > self.capacity:
            total = int(uw.sum())
            cum = np.cumsum(uw)
            # re-sample the weighted CDF at equi-weight midpoints
            targets = ((np.arange(self.capacity) + 0.5) / self.capacity
                       * total)
            idx = np.searchsorted(cum, targets, side="left")
            uv = uv[np.minimum(idx, len(uv) - 1)]
            # weights = diffs of ROUNDED cumulative targets, so the new
            # CDF tracks (i+1)·total/capacity within 0.5 everywhere —
            # piling the integer remainder onto the first entries
            # instead would drift the lower half by up to `remainder`
            ncum = np.rint(np.arange(1, self.capacity + 1)
                           * (total / self.capacity)).astype(np.int64)
            ncum[-1] = total
            uw = np.diff(np.concatenate(([0], ncum)))
            # re-sampling can emit the same value twice — re-collapse
            uv, inv = np.unique(uv, return_inverse=True)
            uw = np.bincount(inv, weights=uw.astype(np.float64)) \
                .astype(np.int64)
        self.vals, self.wts = uv, uw

    def quantile(self, q: float) -> float:
        """SQL ``quantile_disc`` convention: element at (1-based) rank
        ``ceil(q·n)`` of the weighted sorted values."""
        import math

        n = self.total
        if n == 0:
            return float("nan")
        k = max(math.ceil(q * n) - 1, 0)
        pos = int(np.searchsorted(np.cumsum(self.wts), k + 1, side="left"))
        return float(self.vals[min(pos, len(self.vals) - 1)])

    def to_bytes(self) -> tuple[bytes, bytes]:
        return self.vals.tobytes(), self.wts.tobytes()

    @classmethod
    def from_bytes(cls, vb: bytes, wb: bytes,
                   capacity: int = 1 << 17) -> "QuantileSketch":
        s = cls(capacity)
        s.vals = np.frombuffer(vb, dtype=np.float64).copy()
        s.wts = np.frombuffer(wb, dtype=np.int64).copy()
        return s


def approx_quantiles(ds, col: str, qs, names=None,
                     capacity: int = 1 << 17) -> pa.Table:
    """Distributed global quantiles via ``QuantileSketch``: one sketch
    per block, ≤ capacity pairs per block to the driver, deterministic
    merge — zero shuffle. Exact (= ``quantile_disc``) while the
    column's distinct-value count stays ≤ capacity; bounded-rank-error
    approximate beyond. Returns a one-row Table named per ``names``
    (default ``q{percent}``)."""
    qs = [float(q) for q in qs]
    names = (list(names) if names is not None
             else [f"q{int(round(q * 100))}" for q in qs])
    if len(set(names)) != len(names):
        raise ValueError(
            f"quantile output names collide: {names} — the default "
            "q{percent} naming rounds to whole percents; pass explicit "
            "`names` for finer-grained quantiles")

    def sketch(t: pa.Table) -> pa.Table:
        s = QuantileSketch(capacity)
        s.add_array(t[col])
        vb, wb = s.to_bytes()
        return pa.table({"v": pa.array([vb], pa.binary()),
                         "w": pa.array([wb], pa.binary())})

    # chunked fold: merge_many every `chunk` block sketches — driver
    # memory stays ~chunk·capacity pairs instead of blocks·capacity,
    # at the cost of one compress round per chunk (rank error grows
    # with blocks/chunk instead of staying at 2 rounds — still ~64×
    # tighter than per-block pairwise merging)
    chunk = 64
    merged = QuantileSketch(capacity)
    parts: list[QuantileSketch] = []
    for b in ds.map_batches(sketch, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"):
        for vb, wb in zip(b["v"].to_pylist(), b["w"].to_pylist()):
            parts.append(QuantileSketch.from_bytes(vb, wb, capacity))
            if len(parts) >= chunk:
                merged.merge_many(parts)
                parts = []
    merged.merge_many(parts)
    # from_pandas=True: an empty/all-NULL column makes quantile()
    # return NaN — map it to the SQL NULL that quantile_disc yields
    # (the per-group variant already does; keep the global row equal)
    return pa.table({n: pa.array([merged.quantile(q)], pa.float64(),
                                 from_pandas=True)
                     for q, n in zip(qs, names)})


def histogram(ds, col: str, lo: float, hi: float, nbins: int) -> pa.Table:
    """Fixed-bin histogram of a numeric column over [lo, hi) — the
    zero-shuffle profiling aggregate: each block reduces to one
    ``nbins``-long count vector (np.bincount), the driver sums the
    per-block vectors. Values outside [lo, hi) and NULLs are dropped
    (count them separately if you need them). Bin assignment is
    ``floor((v - lo) / (hi - lo) * nbins)`` evaluated in double — the
    exact expression a SQL oracle can replicate bit-for-bit. Returns
    (bin, lo_edge, cnt), one row per non-empty bin."""
    if not (hi > lo) or nbins < 1:
        raise ValueError("need hi > lo and nbins >= 1")

    def part(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        v = v[~np.isnan(v)]
        b = np.floor((v - lo) / (hi - lo) * nbins).astype(np.int64)
        # filter on the COMPUTED bin, not the raw value — float
        # rounding can push v<hi into bin nbins, and an oracle that
        # filters the same way stays bit-identical
        b = b[(b >= 0) & (b < nbins)]
        cnt = np.bincount(b, minlength=nbins)
        nz = np.flatnonzero(cnt)
        # carry explicit bin ids: the consumer re-batches rows across
        # block boundaries, so positional nbins-runs can't be assumed
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    total = np.zeros(nbins, dtype=np.int64)
    for b in ds.map_batches(part, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_format="pyarrow"):
        np.add.at(total, b["bin"].to_numpy(), b["cnt"].to_numpy())
    keep = np.flatnonzero(total)
    width = (hi - lo) / nbins
    return pa.table({"bin": pa.array(keep, pa.int64()),
                     "lo_edge": pa.array(lo + keep * width, pa.float64()),
                     "cnt": pa.array(total[keep], pa.int64())})


class MisraGries:
    """Misra-Gries heavy-hitters summary: at most ``capacity`` (value,
    count) entries; counts are exact while the stream's distinct-value
    count stays ≤ capacity (no decrement ever fires — the condition
    the SQL oracle checks), and otherwise undercount by at most the
    tracked ``decremented`` total. Merging is summary concatenation +
    count sum + one deterministic compress — associative, so the
    distributed shape is the same zero-shuffle one as HyperLogLog /
    QuantileSketch above: one summary per block, fold on the driver."""

    def __init__(self, capacity: int = 1024) -> None:
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        self.counts: dict = {}
        self.decremented = 0

    def add_array(self, values) -> "MisraGries":
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            # to_pylist, NOT to_numpy: an int column batch containing a
            # null gets promoted to float64 by to_numpy, so the same
            # value keys as '5' in null-free blocks and '5.0' in
            # null-carrying ones — splitting one heavy hitter's count
            # across two keys (verified). Python objects keep ints ints
            # regardless of the batch's null pattern.
            values = values.to_pylist()
        v = np.asarray(values, dtype=object)
        v = v[~pd.isna(v)]
        if len(v) == 0:
            return self
        uniq, cnt = np.unique(v, return_counts=True)
        for u, c in zip(uniq, cnt):
            self.counts[u] = self.counts.get(u, 0) + int(c)
        self._compress()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        for u, c in other.counts.items():
            self.counts[u] = self.counts.get(u, 0) + c
        self.decremented += other.decremented
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        cs = np.fromiter(self.counts.values(), dtype=np.int64)
        # subtract the (capacity+1)-th largest count from everyone and
        # drop the non-positive — the classic MG decrement, batched
        thresh = int(np.partition(cs, -self.capacity - 1)
                     [-self.capacity - 1])
        self.decremented += thresh
        self.counts = {u: c - thresh for u, c in self.counts.items()
                       if c - thresh > 0}

    def top(self, k: int) -> list[tuple]:
        """Top-k by (count desc, value asc) — value tie-break keeps the
        cut deterministic."""
        return sorted(self.counts.items(),
                      key=lambda uc: (-uc[1], uc[0]))[:k]


def mg_summary_table(s: "MisraGries") -> pa.Table:
    """ONE-row Arrow encoding of a block's MG summary (list<string>
    values, list<int64> counts, int64 decremented) — the wire format
    ``_mg_fold`` parses. Single definition: every map-side producer
    (heavy_hitters, approx_top_ngrams) must build rows through this,
    or a format change breaks a consumer silently."""
    vals = list(s.counts)
    return pa.table({
        "v": pa.array([[str(x) for x in vals]], pa.list_(pa.string())),
        "c": pa.array([[s.counts[x] for x in vals]], pa.list_(pa.int64())),
        "d": pa.array([s.decremented], pa.int64())})


def heavy_hitters(ds, col: str, k: int = 10,
                  capacity: int = 1024) -> pa.Table:
    """Approximate top-k most frequent values — one MisraGries summary
    per block, driver fold, zero shuffle. EXACT (= GROUP BY count)
    while the column's distinct count ≤ capacity; beyond that, counts
    are undercounts by ≤ the summary's ``decremented`` bound. The
    zero-shuffle companion to the exact exchange-based ``top_ngrams``:
    use this to find candidates at 100 TB, the exact path to confirm.
    Values are returned as strings (the summary stringifies keys so a
    block summary serializes as one Arrow list row)."""
    def part(t: pa.Table) -> pa.Table:
        # ONE row per block summary (list-typed) — the consumer
        # re-batches rows across blocks, so flat (value, count) rows
        # from different blocks would interleave and lose identity
        s = MisraGries(capacity)
        s.add_array(t[col])
        return mg_summary_table(s)

    merged = _mg_fold(ds.map_batches(part, batch_format="pyarrow",
                                     zero_copy_batch=True), capacity)
    top = merged.top(k)
    return pa.table({"value": pa.array([u for u, _ in top]),
                     "cnt": pa.array([c for _, c in top], pa.int64())})


def _mg_fold(parts_ds, capacity: int, chunk: int = 32) -> MisraGries:
    """Vectorized CHUNKED driver fold of block MG summaries: every
    ``chunk`` summaries are groupby-summed in one pandas C pass and
    compressed once — the per-chunk single compress keeps the error
    bound tight (≤ one decrement per chunk rather than one per block),
    while driver memory stays bounded at ~chunk·capacity entries
    instead of blocks·capacity (a 100 TB run has tens of thousands of
    block summaries; holding them all would pin tens of GB)."""
    m = MisraGries(capacity)
    vs: list[np.ndarray] = [np.empty(0, dtype=object)]
    cs: list[np.ndarray] = [np.empty(0, dtype=np.int64)]

    def collapse() -> None:
        vals = list(m.counts)
        vs.append(np.asarray(vals, dtype=object))
        cs.append(np.asarray([m.counts[x] for x in vals], dtype=np.int64))
        summed = pd.Series(np.concatenate(cs),
                           index=np.concatenate(vs)).groupby(level=0).sum()
        m.counts = dict(zip(summed.index,
                            (int(x) for x in summed.to_numpy())))
        m._compress()
        vs.clear()
        cs.clear()

    pending = 0
    for b in parts_ds.iter_batches(batch_format="pyarrow"):
        for v, c, d in zip(b["v"].to_pylist(), b["c"].to_pylist(),
                           b["d"].to_pylist()):
            vs.append(np.asarray(v, dtype=object))
            cs.append(np.asarray(c, dtype=np.int64))
            m.decremented += int(d)
            pending += 1
            if pending >= chunk:
                collapse()
                pending = 0
    if pending:
        collapse()
    return m


def approx_quantiles_per_group(ds, group_col: str, value_col: str, qs,
                               names=None, capacity: int = 1 << 15,
                               num_buckets: int = 8):
    """Per-group quantiles via ``QuantileSketch`` partials — the sketch
    as a MAP-SIDE COMBINER, not just a driver fold: each batch reduces
    to one ≤2·capacity-entry sketch per group it contains, the exchange
    carries sketches (never raw rows), and each bucket merges its
    groups' sketches and extracts the quantiles. Exact
    (= ``quantile_disc``) while each group's distinct-value count stays
    ≤ capacity; bounded-rank-error beyond — the scale companion to the
    exact ``QuantilePerGroupTransform``, trading exactness for a
    shuffle volume independent of group size."""
    import pyarrow.compute as pc

    from etlray.cdc.apply import BUCKET_COL
    from etlray.exchange import hash_exchange

    qs = [float(q) for q in qs]
    names = (list(names) if names is not None
             else [f"q{int(round(q * 100))}" for q in qs])
    if len(set(names)) != len(names):
        raise ValueError(
            f"quantile output names collide: {names} — the default "
            "q{percent} naming rounds to whole percents; pass explicit "
            "`names` for finer-grained quantiles")

    def partial(t: pa.Table) -> pa.Table:
        gtype = t.schema.field(group_col).type
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__v": pa.array([], pa.binary()),
                             "__w": pa.array([], pa.binary())})
        keys = t[group_col].to_numpy(zero_copy_only=False)
        # NULL VALUES become NaN here and add_array drops them (SQL
        # quantile_disc ignores NULLs) — but the GROUP still exists, so
        # no is_valid pre-filter: a group whose values are all NULL
        # must emit NULL quantiles, not vanish. NULL GROUPS are real
        # groups (use_na_sentinel=False), matching SQL GROUP BY.
        vals = np.asarray(pc.cast(t[value_col], pa.float64())
                          .to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        vb, wb = [], []
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
        for gi in range(len(uniq)):
            s = QuantileSketch(capacity)
            s.add_array(vals[order[bounds[gi]:bounds[gi + 1]]])
            b1, b2 = s.to_bytes()
            vb.append(b1)
            wb.append(b2)
        return pa.table({group_col: pa.array(uniq, type=gtype,
                                             from_pandas=True),
                         "__v": pa.array(vb, pa.binary()),
                         "__w": pa.array(wb, pa.binary())})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if BUCKET_COL in t.column_names:
            t = t.drop_columns([BUCKET_COL])
        gtype = t.schema.field(group_col).type
        if t.num_rows == 0:
            cols = {group_col: pa.array([], gtype)}
            cols.update({n: pa.array([], pa.float64()) for n in names})
            return pa.table(cols)
        keys = t[group_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        parts: list[list] = [[] for _ in range(len(uniq))]
        for gi, vb, wb in zip(codes, t["__v"].to_pylist(),
                              t["__w"].to_pylist()):
            parts[gi].append(QuantileSketch.from_bytes(vb, wb, capacity))
        merged = [QuantileSketch(capacity).merge_many(p) for p in parts]
        cols = {group_col: pa.array(uniq, type=gtype, from_pandas=True)}
        for q, n in zip(qs, names):
            # empty sketch (all-NULL group) → NaN → NULL via from_pandas
            cols[n] = pa.array([s.quantile(q) for s in merged],
                               pa.float64(), from_pandas=True)
        return pa.table(cols)

    return hash_exchange(pre, [group_col], num_buckets, reduce_bucket,
                         bucket_col=None)


def approx_distinct_per_group(ds, group_col: str, value_col: str,
                              p: int = 12, num_buckets: int = 8,
                              out_col: str = "approx_distinct"):
    """Per-group approximate count-distinct — HyperLogLog as a
    MAP-SIDE COMBINER through the exchange, mirroring
    ``approx_quantiles_per_group``: each batch reduces to one 2^p-byte
    register array per group it contains, the exchange carries
    registers (never values), each bucket folds its groups' registers
    by elementwise max. The scale companion to the exact
    ``CountDistinctTransform``, whose shuffle carries one row per
    distinct (group, value) per block — prohibitive when values are
    near-unique; this path's shuffle volume is groups × 2^p bytes,
    independent of the value cardinality. Error ≈ 1.04/sqrt(2^p)
    (~1.6 % at p=12) — accuracy-gated by pytest, no hash oracle (the
    estimate is approximate by design). NULL groups are real groups;
    NULL values are not counted (SQL count(DISTINCT ..) semantics)."""
    from etlray.cdc.apply import BUCKET_COL
    from etlray.exchange import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        gtype = t.schema.field(group_col).type
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "__regs": pa.array([], pa.binary())})
        keys = t[group_col].to_numpy(zero_copy_only=False)
        # python objects, NOT to_numpy: a null anywhere in an int batch
        # promotes to_numpy to float64, making the same value hash as
        # '5.0' there and '5' in null-free batches — each such value
        # then lands in TWO HLL registers and the estimate doubles
        # (verified). to_pylist keeps ints ints in every batch, matching
        # the global approx_distinct path.
        vals = np.asarray(t[value_col].to_pylist(), dtype=object)
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
        regs = []
        for gi in range(len(uniq)):
            h = HyperLogLog(p)
            seg = vals[order[bounds[gi]:bounds[gi + 1]]]
            h.add_array(seg[~pd.isna(seg)])
            regs.append(h.registers.tobytes())
        return pa.table({group_col: pa.array(uniq, type=gtype,
                                             from_pandas=True),
                         "__regs": pa.array(regs, pa.binary())})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if BUCKET_COL in t.column_names:
            t = t.drop_columns([BUCKET_COL])
        gtype = t.schema.field(group_col).type
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             out_col: pa.array([], pa.int64())})
        keys = t[group_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        merged = [HyperLogLog(p) for _ in range(len(uniq))]
        for gi, rb in zip(codes, t["__regs"].to_pylist()):
            o = HyperLogLog(p)
            o.registers = np.frombuffer(rb, dtype=np.uint8).copy()
            merged[gi].merge(o)
        return pa.table({
            group_col: pa.array(uniq, type=gtype, from_pandas=True),
            out_col: pa.array([int(round(h.cardinality()))
                               for h in merged], pa.int64())})

    return hash_exchange(pre, [group_col], num_buckets, reduce_bucket,
                         bucket_col=None)
