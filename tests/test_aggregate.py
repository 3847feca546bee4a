"""Aggregate semantics vs reference
(/root/reference/src/transform/common.rs:258-371): {col}_{func} naming,
as_float coercion, Sum-empty→0.0, Average/Min/Max-empty→null, Count
includes nulls."""

import math

import pytest

from etlray.sources import MemorySource
from etlray.stages import AggregateTransform, GlobalAggregateTransform


@pytest.fixture()
def cat_ds():
    return MemorySource([
        {"category": "A", "value": 10},
        {"category": "A", "value": 20},
        {"category": "B", "value": 5},
        {"category": "B", "value": None},
        {"category": "C", "value": None},
    ]).read()


def _by_cat(ds):
    return {r["category"]: r for r in ds.take_all()}


def test_groupby_sum_naming_and_coercion(cat_ds):
    out = AggregateTransform(["category"], [("value", "sum")]).apply(cat_ds)
    rows = _by_cat(out)
    assert rows["A"]["value_sum"] == 30.0          # Float, reference naming check :576
    assert rows["B"]["value_sum"] == 5.0
    assert rows["C"]["value_sum"] == 0.0           # empty sum → 0.0, not null


def test_groupby_count_includes_nulls(cat_ds):
    out = AggregateTransform(["category"], [("value", "count")]).apply(cat_ds)
    rows = _by_cat(out)
    assert rows["B"]["value_count"] == 2
    assert rows["C"]["value_count"] == 1


def test_groupby_avg_min_max_null_on_empty(cat_ds):
    out = AggregateTransform(
        ["category"], [("value", "average"), ("value", "min"), ("value", "max")]
    ).apply(cat_ds)
    rows = _by_cat(out)
    assert rows["A"]["value_average"] == 15.0
    assert rows["A"]["value_min"] == 10.0
    assert rows["A"]["value_max"] == 20.0
    for f in ("value_average", "value_min", "value_max"):
        v = rows["C"][f]
        assert v is None or (isinstance(v, float) and math.isnan(v))


def test_string_values_coerced():
    ds = MemorySource([
        {"category": "A", "value": "10"},
        {"category": "A", "value": "x"},
    ]).read()
    out = AggregateTransform(["category"], [("value", "sum")]).apply(ds)
    assert _by_cat(out)["A"]["value_sum"] == 10.0


def test_first_last_with_order(cat_ds):
    out = AggregateTransform(["category"], [("value", "first"), ("value", "last")],
                             order_by="value").apply(cat_ds)
    rows = _by_cat(out)
    assert rows["A"]["value_first"] == 10
    assert rows["A"]["value_last"] == 20


def test_global_aggregate(cat_ds):
    out = GlobalAggregateTransform([("value", "sum"), ("value", "count")]).apply(cat_ds)
    row = out.take_all()[0]
    assert row["value_sum"] == 35.0
    assert row["value_count"] == 5


def test_null_group_key_kept_in_deterministic_path():
    ds = MemorySource([
        {"category": "A", "value": 1},
        {"category": None, "value": 7},
        {"category": None, "value": 3},
    ]).read()
    out = AggregateTransform(["category"], [("value", "sum")],
                             deterministic=True).apply(ds)
    rows = {r["category"]: r["value_sum"] for r in out.take_all()}
    assert rows["A"] == 1.0
    assert rows[None] == 10.0  # null key is a real group, not dropped


def test_deterministic_matches_native():
    ds = MemorySource([
        {"category": c, "value": v}
        for c, v in zip("ABAB" * 25, range(100))
    ]).read()
    nat = AggregateTransform(["category"], [("value", "sum"), ("value", "average"),
                                            ("value", "min"), ("value", "max"),
                                            ("value", "count")]).apply(ds)
    det = AggregateTransform(["category"], [("value", "sum"), ("value", "average"),
                                            ("value", "min"), ("value", "max"),
                                            ("value", "count")],
                             deterministic=True).apply(ds)
    n = {r["category"]: r for r in nat.take_all()}
    d = {r["category"]: r for r in det.take_all()}
    for cat in n:
        for k in n[cat]:
            assert n[cat][k] == pytest.approx(d[cat][k])


def test_quantile_per_group_matches_disc_convention(ray_session):
    """quantile_disc convention: sorted non-null values, element at
    index ceil(q*n)-1 (empirically verified against DuckDB)."""
    from etlray.sources import MemorySource
    from etlray.stages import QuantilePerGroupTransform

    rows = ([{"g": "a", "v": float(x)} for x in (4, 1, 3, 2)] +
            [{"g": "b", "v": float(x)} for x in (10, 30, 20, 50, 40)] +
            [{"g": "b", "v": None}])
    ds = MemorySource(rows).read()
    out = QuantilePerGroupTransform("g", "v", qs=[0.25, 0.5, 0.9]) \
        .apply(ds).take_all()
    got = {r["g"]: (r["q25"], r["q50"], r["q90"]) for r in out}
    # n=4: ceil(.25*4)-1=0 -> 1; ceil(.5*4)-1=1 -> 2; ceil(.9*4)-1=3 -> 4
    assert got["a"] == (1.0, 2.0, 4.0)
    # n=5 (null dropped): idx 1 -> 20; idx 2 -> 30; idx 4 -> 50
    assert got["b"] == (20.0, 30.0, 50.0)


def test_rollup_levels_and_nulls(ray_session):
    from etlray.sources import MemorySource
    from etlray.stages import RollupTransform

    rows = [{"a": "x", "b": "p", "v": 1},
            {"a": "x", "b": "q", "v": 2},
            {"a": "y", "b": "p", "v": 4}]
    out = RollupTransform(["a", "b"], [("v", "sum"), ("v", "count")]) \
        .apply(MemorySource(rows).read()).take_all()
    got = {(r["a"], r["b"]): (r["v_sum"], r["v_count"]) for r in out}
    assert got == {
        ("x", "p"): (1, 1), ("x", "q"): (2, 1), ("y", "p"): (4, 1),
        ("x", None): (3, 2), ("y", None): (4, 1),   # per-a subtotals
        (None, None): (7, 3),                        # grand total
    }


def test_rollup_rejects_non_decomposable(ray_session):
    import pytest as _pytest

    from etlray.errors import TransformError
    from etlray.stages import RollupTransform

    with _pytest.raises(TransformError):
        RollupTransform(["a"], [("v", "average")])


def test_cube_all_subsets(ray_session):
    from etlray.sources import MemorySource
    from etlray.stages import RollupTransform

    rows = [{"a": "x", "b": "p", "v": 1},
            {"a": "x", "b": "q", "v": 2},
            {"a": "y", "b": "p", "v": 4}]
    out = RollupTransform(["a", "b"], [("v", "sum")], mode="cube") \
        .apply(MemorySource(rows).read()).take_all()
    got = {(r["a"], r["b"]): r["v_sum"] for r in out}
    assert got == {
        ("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 4,
        ("x", None): 3, ("y", None): 4,      # per-a
        (None, "p"): 5, (None, "q"): 2,      # per-b (cube-only level)
        (None, None): 7,
    }


def test_rollup_distributed_subtotals_match_driver(ray_session):
    from etlray.sources import MemorySource
    from etlray.stages import RollupTransform

    rows = [{"a": "x", "b": "p", "v": 1},
            {"a": "x", "b": "q", "v": 2},
            {"a": "y", "b": "p", "v": 4}]

    def run(subtotals):
        out = RollupTransform(["a", "b"], [("v", "sum"), ("v", "count")],
                              mode="cube", subtotals=subtotals,
                              exact_int=True) \
            .apply(MemorySource(rows).read()).take_all()
        return sorted(((r["a"], r["b"], r["v_sum"], r["v_count"])
                       for r in out),
                      key=lambda x: (x[0] or "", x[1] or "", x[2], x[3]))

    assert run("driver") == run("distributed")


def test_rollup_empty_input_emits_grand_total(ray_session):
    """SQL GROUP BY ROLLUP/CUBE over an empty relation still yields
    the grand-total row: count 0, sum 0 (engine Sum-empty convention),
    min/max NULL, every key column NULL (ADVICE r3)."""
    import pyarrow as pa
    import ray.data

    from etlray.stages import RollupTransform

    empty = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.string()),
        "b": pa.array([], pa.string()),
        "v": pa.array([], pa.int64()),
    }))
    for mode in ("rollup", "cube"):
        out = RollupTransform(
            ["a", "b"],
            [("v", "sum"), ("v", "count"), ("v", "min")],
            mode=mode).apply(empty).take_all()
        assert len(out) == 1
        r = out[0]
        assert (r["a"], r["b"]) == (None, None)
        assert r["v_count"] == 0
        assert r["v_sum"] == 0.0
        assert r["v_min"] is None
    # exact_int keeps the raw int64 sum type
    out = RollupTransform(["a"], [("v", "sum")], exact_int=True) \
        .apply(empty).take_all()
    assert out == [{"a": None, "v_sum": 0}]


def test_approx_quantiles_empty_is_null(ray_session):
    """quantile over an empty/all-NULL column is SQL NULL, not NaN
    (ADVICE r3 — the global variant lacked from_pandas)."""
    import pyarrow as pa
    import ray.data

    from etlray.functions.sketch import approx_quantiles

    empty = ray.data.from_arrow(pa.table({
        "v": pa.array([None, None], pa.float64())}))
    t = approx_quantiles(empty, "v", [0.5, 0.9])
    assert t.num_rows == 1
    assert t["q50"][0].as_py() is None
    assert t["q90"][0].as_py() is None


def test_rollup_auto_dispatch_both_sides_of_threshold(ray_session):
    """subtotals="auto" (default) must pick driver below
    driver_row_limit and distributed above it, with identical output
    either way (round-3 VERDICT #6 — no manual switch needed to stay
    off a pathological driver fold)."""
    from etlray.sources import MemorySource
    from etlray.stages import RollupTransform

    rows = [{"a": f"a{i % 3}", "b": f"b{i % 2}", "v": i}
            for i in range(24)]

    def run(limit):
        out = RollupTransform(["a", "b"], [("v", "sum"), ("v", "count")],
                              exact_int=True,
                              driver_row_limit=limit) \
            .apply(MemorySource(rows).read()).take_all()
        return sorted(((r["a"], r["b"], r["v_sum"], r["v_count"])
                       for r in out),
                      key=lambda x: (x[0] or "", x[1] or ""))

    # finest has 6 combos: limit=1 forces distributed, limit=10**6 driver
    assert run(1) == run(10**6)


def test_percentile_cont_linear_interpolation(ray_session):
    """interpolation='linear' = SQL percentile_cont: q·(n−1) position,
    interpolated between straddling elements (verified vs numpy)."""
    import numpy as np

    from etlray.sources import MemorySource
    from etlray.stages import QuantilePerGroupTransform

    vals = [1.0, 2.0, 3.0, 10.0]
    rows = [{"g": "a", "v": v} for v in vals] + [{"g": "b", "v": 5.0}]
    out = QuantilePerGroupTransform(
        "g", "v", [0.5, 0.75], names=["p50", "p75"],
        interpolation="linear").apply(MemorySource(rows).read()).take_all()
    got = {r["g"]: (r["p50"], r["p75"]) for r in out}
    assert got["a"][0] == np.percentile(vals, 50)   # 2.5
    assert got["a"][1] == np.percentile(vals, 75)   # 4.75... check
    assert got["b"] == (5.0, 5.0)                   # single element


def test_dense_rank_ties_and_keys(ray_session):
    import ray.data

    from etlray.stages import DenseRankTransform

    ds = ray.data.from_items([
        {"g": "x", "v": 10}, {"g": "x", "v": 10}, {"g": "x", "v": 20},
        {"g": "y", "v": 5}])
    out = DenseRankTransform("g", "v").apply(ds).take_all()
    got = sorted((r["g"], r["v"], r["dense_rank"]) for r in out)
    assert got == [("x", 10, 1), ("x", 10, 1), ("x", 20, 2),
                   ("y", 5, 1)]


def test_plain_rank_gaps_after_ties(ray_session):
    """dense=False is SQL rank(): a 3-way tie at rank 1 pushes the
    next distinct value to rank 4; keys reset independently."""
    import ray.data

    from etlray.stages import DenseRankTransform

    ds = ray.data.from_items([
        {"g": "x", "v": 10}, {"g": "x", "v": 10}, {"g": "x", "v": 10},
        {"g": "x", "v": 20}, {"g": "x", "v": 30},
        {"g": "y", "v": 7}, {"g": "y", "v": 7}, {"g": "y", "v": 9}])
    out = DenseRankTransform("g", "v", dense=False,
                             out_col="rank").apply(ds).take_all()
    got = sorted((r["g"], r["v"], r["rank"]) for r in out)
    assert got == [("x", 10, 1), ("x", 10, 1), ("x", 10, 1),
                   ("x", 20, 4), ("x", 30, 5),
                   ("y", 7, 1), ("y", 7, 1), ("y", 9, 3)]


def test_grouping_sets_listed_only(ray_session):
    """mode='sets' emits exactly the listed sets: (b) alone is not a
    rollup prefix; the full set is emitted only when listed; () emits
    the grand total."""
    import ray.data

    from etlray.stages import RollupTransform

    rows = [{"a": "x", "b": "p", "v": 1},
            {"a": "x", "b": "q", "v": 2},
            {"a": "y", "b": "p", "v": 4}]
    ds = ray.data.from_items(rows)
    out = RollupTransform(
        ["a", "b"], [("v", "sum")], mode="sets",
        grouping_sets=[("b",), ()], exact_int=True).apply(ds).take_all()
    got = {(r["a"], r["b"]): r["v_sum"] for r in out}
    # NO (a,b) finest rows (full set not listed)
    assert got == {(None, "p"): 5, (None, "q"): 2, (None, None): 7}

    out2 = RollupTransform(
        ["a", "b"], [("v", "sum")], mode="sets",
        grouping_sets=[("a", "b"), ("b",)], exact_int=True) \
        .apply(ds).take_all()
    got2 = {(r["a"], r["b"]): r["v_sum"] for r in out2}
    assert got2 == {("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 4,
                    (None, "p"): 5, (None, "q"): 2}


def test_grouping_sets_validation(ray_session):
    import pytest

    from etlray.errors import TransformError
    from etlray.stages import RollupTransform

    with pytest.raises(TransformError):
        RollupTransform(["a"], [("v", "sum")], mode="sets")
    with pytest.raises(TransformError):
        RollupTransform(["a"], [("v", "sum")], mode="sets",
                        grouping_sets=[("zz",)])
    with pytest.raises(TransformError):
        RollupTransform(["a"], [("v", "sum")],
                        grouping_sets=[("a",)])  # needs mode='sets'
