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
