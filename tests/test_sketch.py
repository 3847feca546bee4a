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


def test_quantile_sketch_exact_below_capacity(ray_session):
    import numpy as np

    from etlray.functions.sketch import QuantileSketch

    rng = np.random.default_rng(3)
    v = rng.normal(size=1000)
    s = QuantileSketch(capacity=4096).add_array(v)
    sv = np.sort(v)
    for q in (0.1, 0.5, 0.9, 0.99):
        import math

        assert s.quantile(q) == sv[max(math.ceil(q * len(v)) - 1, 0)]


def test_quantile_sketch_bounded_error_and_deterministic(ray_session):
    import numpy as np

    from etlray.functions.sketch import QuantileSketch

    rng = np.random.default_rng(11)
    v = rng.exponential(size=50_000)
    sv = np.sort(v)

    def build(order):
        s = QuantileSketch(capacity=256)
        for chunk in np.array_split(order, 10):
            s.merge(QuantileSketch(capacity=256).add_array(chunk))
        return s

    a = build(v)
    for q in (0.1, 0.5, 0.9):
        got = a.quantile(q)
        # each of the 10 sequential merges can trigger one resample
        # round adding ≤ total/capacity rank error — bound compounds
        # with rounds (observed ~5× n/capacity at q=0.5)
        rank = np.searchsorted(sv, got)
        assert abs(rank - q * len(v)) < 11 * len(v) / 256

    b = build(v)  # same partitioning → identical sketch
    assert np.array_equal(a.vals, b.vals) and np.array_equal(a.wts, b.wts)


def test_approx_quantiles_distributed(ray_session):
    import numpy as np
    import ray.data

    from etlray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(5)
    v = rng.normal(size=5000)
    ds = ray.data.from_items([{"x": float(x)} for x in v]).repartition(8)
    out = approx_quantiles(ds, "x", qs=[0.5], capacity=1 << 14)
    import math

    sv = np.sort(v)
    assert out["q50"][0].as_py() == sv[math.ceil(0.5 * len(v)) - 1]


def test_histogram_counts_and_edges(ray_session):
    import numpy as np
    import ray.data

    from etlray.functions.sketch import histogram

    v = [0.0, 0.5, 1.0, 2.5, 9.99, 10.0, -0.1, None]
    ds = ray.data.from_items([{"x": x} for x in v])
    out = histogram(ds, "x", lo=0.0, hi=10.0, nbins=10)
    got = {r["bin"]: (r["lo_edge"], r["cnt"]) for r in out.to_pylist()}
    # 10.0, -0.1 and None fall outside; 0.0+0.5 share bin 0
    assert got == {0: (0.0, 2), 1: (1.0, 1), 2: (2.0, 1), 9: (9.0, 1)}


def test_centroid_per_group_exact(ray_session):
    import numpy as np
    import ray.data

    from etlray.functions.ann import centroid_per_group

    rows = [{"g": "a", "embedding": [1.0, 2.0]},
            {"g": "a", "embedding": [3.0, 6.0]},
            {"g": "b", "embedding": [10.0, 0.0]}]
    ds = ray.data.from_items(rows).repartition(3)
    out = centroid_per_group(ds, "g").take_all()
    got = {(r["g"], r["pos"]): (r["centroid_v"], r["n_vecs"]) for r in out}
    assert got == {("a", 1): (2.0, 2), ("a", 2): (4.0, 2),
                   ("b", 1): (10.0, 1), ("b", 2): (0.0, 1)}


def test_misra_gries_exact_below_capacity_and_bounded_above(ray_session):
    import numpy as np

    from etlray.functions.sketch import MisraGries

    stream = ["a"] * 100 + ["b"] * 50 + [f"noise{i}" for i in range(200)]
    rng = np.random.default_rng(1)
    rng.shuffle(stream)

    exact = MisraGries(capacity=1024).add_array(np.array(stream, object))
    assert dict(exact.top(2)) == {"a": 100, "b": 50}
    assert exact.decremented == 0

    # tight capacity: heavy values survive, counts undercount by
    # at most `decremented`
    s = MisraGries(capacity=8)
    for chunk in np.array_split(np.array(stream, object), 7):
        s.merge(MisraGries(capacity=8).add_array(chunk))
    top = dict(s.top(2))
    assert "a" in top and 100 - s.decremented <= top["a"] <= 100
    assert s.decremented > 0


def test_heavy_hitters_distributed_exact(ray_session):
    import ray.data

    from etlray.functions.sketch import heavy_hitters

    rows = [{"t": f"v{i % 7}"} for i in range(700)] + [{"t": None}]
    out = heavy_hitters(ray.data.from_items(rows).repartition(4),
                        "t", k=3, capacity=64)
    got = {r["value"]: r["cnt"] for r in out.to_pylist()}
    assert got == {"v0": 100, "v1": 100, "v2": 100}  # tie → value asc


def test_approx_quantiles_per_group_exact_and_capped(ray_session):
    import numpy as np
    import ray.data

    from etlray.functions.sketch import approx_quantiles_per_group

    rng = np.random.default_rng(7)
    rows = [{"g": ("a" if i % 2 else "b"), "x": float(v)}
            for i, v in enumerate(rng.normal(size=4000))]
    ds = ray.data.from_items(rows).repartition(6)

    out = approx_quantiles_per_group(ds, "g", "x", qs=[0.5],
                                     capacity=1 << 14).take_all()
    got = {r["g"]: r["q50"] for r in out}
    import math

    for g in ("a", "b"):
        sv = np.sort([r["x"] for r in rows if r["g"] == g])
        assert got[g] == sv[math.ceil(0.5 * len(sv)) - 1]  # exact regime

    capped = approx_quantiles_per_group(ds, "g", "x", qs=[0.5],
                                        capacity=128).take_all()
    for r in capped:
        sv = np.sort([q["x"] for q in rows if q["g"] == r["g"]])
        rank = np.searchsorted(sv, r["q50"])
        # merge_many folds all partials in ONE compress round: error
        # stays ~half a resample cell per round (2 rounds ≈ n/capacity)
        assert abs(rank - 0.5 * len(sv)) < 3 * len(sv) / 128


def test_centroid_and_group_quantiles_null_groups(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etlray.functions.ann import centroid_per_group
    from etlray.functions.sketch import approx_quantiles_per_group

    t = pa.table({"g": ["a", None, "a", None],
                  "embedding": [[1.0, 0.0], [4.0, 4.0], [3.0, 2.0],
                                [6.0, 2.0]],
                  "x": [1.0, 10.0, 3.0, None]})
    ds = ray.data.from_arrow(t).repartition(2)

    # SQL GROUP BY keeps NULL as a real group — so do we
    cent = centroid_per_group(ds, "g").take_all()
    got = {(r["g"], r["pos"]): (r["centroid_v"], r["n_vecs"]) for r in cent}
    assert got[("a", 1)] == (2.0, 2) and got[("a", 2)] == (1.0, 2)
    assert got[(None, 1)] == (5.0, 2) and got[(None, 2)] == (3.0, 2)

    q = approx_quantiles_per_group(ray.data.from_arrow(t), "g", "x",
                                   qs=[0.5]).take_all()
    gq = {r["g"]: r["q50"] for r in q}
    assert gq["a"] == 1.0      # quantile_disc(0.5) of [1, 3] → rank 1
    assert gq[None] == 10.0    # NULL value dropped, group survives

    # group whose values are ALL null → NULL quantile, not a vanished row
    t2 = pa.table({"g": ["a", "b"], "x": [1.0, None]})
    q2 = approx_quantiles_per_group(ray.data.from_arrow(t2), "g", "x",
                                    qs=[0.5]).take_all()
    gq2 = {r["g"]: r["q50"] for r in q2}
    assert gq2 == {"a": 1.0, "b": None}


def test_tfidf_string_doc_ids(ray_session):
    from etlray.functions.curation import tfidf_top_terms
    from etlray.sources import MemorySource

    rows = [{"doc_id": "u-1", "text": "apple banana"},
            {"doc_id": "u-2", "text": "banana cherry"}]
    out = tfidf_top_terms(MemorySource(rows).read(), k=1).take_all()
    assert sorted(r["doc_id"] for r in out) == ["u-1", "u-2"]


def test_approx_distinct_per_group_accuracy(ray_session):
    import ray.data

    from etlray.functions.sketch import approx_distinct_per_group

    # group 'a': 1000 distinct users; 'b': 50; NULL group: 10; one NULL
    # value must not count
    rows = [{"g": "a", "u": f"u{i % 1000}"} for i in range(3000)]
    rows += [{"g": "b", "u": f"v{i % 50}"} for i in range(500)]
    rows += [{"g": None, "u": f"w{i}"} for i in range(10)]
    rows += [{"g": "b", "u": None}]
    ds = ray.data.from_items(rows).repartition(6)
    out = approx_distinct_per_group(ds, "g", "u", p=12).take_all()
    got = {r["g"]: r["approx_distinct"] for r in out}
    assert abs(got["a"] - 1000) / 1000 < 0.05
    assert abs(got["b"] - 50) <= 3
    assert abs(got[None] - 10) <= 2


def test_hll_per_group_int_with_nulls_not_doubled(ray_session):
    """Regression: a null anywhere in an int batch made to_numpy
    promote to float64, so the same value hashed as '5' in null-free
    blocks and '5.0' in null-carrying ones — every shared value was
    counted TWICE by the per-group HLL (verified 5 -> ~10)."""
    import ray.data

    from etlray.functions.sketch import approx_distinct_per_group

    rows_a = [{"g": "x", "v": i % 5} for i in range(50)]       # no nulls
    rows_b = [{"g": "x", "v": (i % 5) if i else None}          # one null
              for i in range(50)]
    ds = ray.data.from_items(rows_a).union(ray.data.from_items(rows_b))
    out = approx_distinct_per_group(ds, "g", "v").take_all()
    est = {r["g"]: r["approx_distinct"] for r in out}["x"]
    assert abs(est - 5) <= 1  # was ~10 before the fix


def test_misra_gries_int_with_nulls_single_key():
    """Regression: MisraGries keyed '5' and '5.0' separately when one
    block had nulls — a heavy hitter's count split across two keys."""
    import pyarrow as pa

    from etlray.functions.sketch import MisraGries

    mg = MisraGries(capacity=8)
    mg.add_array(pa.array([5, 5, 5], type=pa.int64()))          # no nulls
    mg.add_array(pa.array([5, None], type=pa.int64()))          # one null
    assert mg.counts == {5: 4}


def test_approx_quantiles_name_collision_raises(ray_session):
    import pytest as _pytest
    import ray.data

    from etlray.functions.sketch import approx_quantiles

    ds = ray.data.from_items([{"v": float(i)} for i in range(10)])
    with _pytest.raises(ValueError, match="collide"):
        approx_quantiles(ds, "v", [0.5, 0.504])
