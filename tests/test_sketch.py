"""HyperLogLog / BloomFilter sketches and the bloom-prefiltered join."""

import numpy as np
import pyarrow as pa
import pytest

from etlray.functions.sketch import BloomFilter, HyperLogLog, approx_distinct
from etlray.sources import MemorySource


def test_hll_accuracy_and_merge():
    true_n = 50_000
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_array([f"k{i}" for i in range(0, true_n, 2)])
    b.add_array([f"k{i}" for i in range(1, true_n, 2)])
    b.add_array([f"k{i}" for i in range(0, 1000, 2)])   # overlap
    est = a.merge(b).cardinality()
    assert abs(est - true_n) / true_n < 0.05            # ~1.6 % typical


def test_hll_small_range_exactish():
    h = HyperLogLog(12)
    h.add_array([f"x{i}" for i in range(100)])
    assert abs(h.cardinality() - 100) < 5


def test_approx_distinct_distributed(ray_session):
    rows = [{"u": f"user{i % 700}"} for i in range(5000)]
    ds = MemorySource(rows).read()
    est = approx_distinct(ds, "u", p=12)
    assert abs(est - 700) / 700 < 0.05


def test_bloom_no_false_negatives_and_low_fp():
    bf = BloomFilter(10_000)
    keys = [f"k{i}" for i in range(10_000)]
    bf.add_array(keys)
    assert bf.contains_array(keys).all()                # no false negatives
    probe = [f"other{i}" for i in range(10_000)]
    fp = bf.contains_array(probe).mean()
    assert fp < 0.03                                    # ~1 % at 10 bits/key


def test_bloom_merge_is_union():
    a, b = BloomFilter(1000), BloomFilter(1000)
    a.add_array(["x", "y"])
    b.add_array(["z"])
    a.merge(b)
    assert a.contains_array(["x", "y", "z"]).all()


def test_bloom_prefiltered_join_matches_plain(ray_session):
    from etlray.stages import PartitionedHashJoinTransform

    left = MemorySource([{"k": i % 50, "l": i} for i in range(400)]).read()
    right_rows = [{"k": k, "r": k * 10} for k in range(0, 20)]  # half match

    plain = PartitionedHashJoinTransform(
        MemorySource(right_rows).read(), on="k", how="inner") \
        .apply(left).take_all()
    bloom = PartitionedHashJoinTransform(
        MemorySource(right_rows).read(), on="k", how="inner",
        bloom_prefilter=True) \
        .apply(MemorySource([{"k": i % 50, "l": i} for i in range(400)]).read()) \
        .take_all()
    key = lambda r: (r["k"], r["l"], r["r"])
    assert sorted(map(key, plain)) == sorted(map(key, bloom))


def test_bloom_prefilter_rejected_for_left_join(ray_session):
    from etlray.errors import TransformError
    from etlray.stages import PartitionedHashJoinTransform

    with pytest.raises(TransformError):
        PartitionedHashJoinTransform(None, on="k", how="left",
                                     bloom_prefilter=True)
