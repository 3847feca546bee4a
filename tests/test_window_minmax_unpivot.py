"""MovingMinMaxTransform (bounded-frame window min/max),
UnpivotTransform (wide→long) and CorrStatsTransform (exact-int
corr/covar) — brute-force pandas/numpy references on small inputs;
the DuckDB window/UNPIVOT/closed-form SQL oracles gate the same
operators at scale (scripts/check_oracles.py)."""

import math

import numpy as np
import pytest

from etlray.sources import MemorySource
from etlray.stages import (
    CorrStatsTransform,
    MovingMinMaxTransform,
    UnpivotTransform,
)


def _events():
    # two keys, interleaved ts, one NULL value and one all-null key
    rows = [
        {"id": 1, "k": "a", "t": 10, "v": 5.0},
        {"id": 2, "k": "a", "t": 20, "v": 1.0},
        {"id": 3, "k": "a", "t": 30, "v": None},
        {"id": 4, "k": "a", "t": 40, "v": 9.0},
        {"id": 5, "k": "a", "t": 50, "v": 2.0},
        {"id": 6, "k": "b", "t": 10, "v": 7.0},
        {"id": 7, "k": "b", "t": 20, "v": 3.0},
        {"id": 8, "k": "c", "t": 10, "v": None},
        {"id": 9, "k": "c", "t": 20, "v": None},
    ]
    return MemorySource(rows).read()


def test_moving_minmax_matches_pandas_rolling(ray_session):
    out = MovingMinMaxTransform("t", "k", "v", window=3,
                                order_tiebreak="id").apply(_events())
    got = {r["id"]: (r["v_wmin"], r["v_wmax"]) for r in out.take_all()}
    import pandas as pd

    df = pd.DataFrame([r for r in _events().take_all()]) \
        .sort_values(["k", "t", "id"])
    ref_min = df.groupby("k")["v"].transform(
        lambda s: s.rolling(3, min_periods=1).min())
    ref_max = df.groupby("k")["v"].transform(
        lambda s: s.rolling(3, min_periods=1).max())
    for rid, mn, mx in zip(df["id"], ref_min, ref_max):
        gmn, gmx = got[rid]
        if np.isnan(mn):
            assert gmn is None and gmx is None
        else:
            assert gmn == mn and gmx == mx


def test_moving_minmax_window_wider_than_key(ray_session):
    # frame longer than any key's run: min/max degrade to running
    out = MovingMinMaxTransform("t", "k", "v", window=100,
                                order_tiebreak="id").apply(_events())
    got = {r["id"]: (r["v_wmin"], r["v_wmax"]) for r in out.take_all()}
    assert got[5] == (1.0, 9.0)      # whole key-a prefix
    assert got[1] == (5.0, 5.0)      # first row sees itself only
    assert got[7] == (3.0, 7.0)      # key b never sees key a
    assert got[9] == (None, None)    # all-null key stays NULL


def test_moving_minmax_integer_stays_exact_int64(ray_session):
    big = 2**53 + 1  # would round under a float64 detour
    rows = [
        {"id": 1, "k": "a", "t": 10, "v": big},
        {"id": 2, "k": "a", "t": 20, "v": 3},
        {"id": 3, "k": "a", "t": 30, "v": None},
    ]
    out = MovingMinMaxTransform("t", "k", "v", window=2,
                                order_tiebreak="id") \
        .apply(MemorySource(rows).read())
    got = {r["id"]: (r["v_wmin"], r["v_wmax"]) for r in out.take_all()}
    assert got[1] == (big, big)          # exact, not 2**53
    assert got[2] == (3, big)
    assert got[3] == (3, 3)              # NULL ignored
    assert all(isinstance(x, int) for pair in got.values() for x in pair)


def test_moving_minmax_nan_value_is_not_null(ray_session):
    # SQL float total order: NaN sorts above +inf — max sees any NaN,
    # min only when NaNs are the window's only valid values
    rows = [
        {"id": 1, "k": "a", "t": 10, "v": 1.0},
        {"id": 2, "k": "a", "t": 20, "v": float("nan")},
        {"id": 3, "k": "a", "t": 30, "v": float("nan")},
        {"id": 4, "k": "a", "t": 40, "v": None},
    ]
    out = MovingMinMaxTransform("t", "k", "v", window=2,
                                order_tiebreak="id") \
        .apply(MemorySource(rows).read())
    got = {r["id"]: (r["v_wmin"], r["v_wmax"]) for r in out.take_all()}
    assert got[1] == (1.0, 1.0)
    assert got[2][0] == 1.0 and math.isnan(got[2][1])      # {1.0, NaN}
    assert math.isnan(got[3][0]) and math.isnan(got[3][1])  # {NaN, NaN}
    assert math.isnan(got[4][0]) and math.isnan(got[4][1])  # {NaN, NULL}


def test_moving_average_nan_value_is_not_null(ray_session):
    from etlray.stages import MovingAverageTransform

    rows = [
        {"id": 1, "k": "a", "t": 10, "v": 2.0},
        {"id": 2, "k": "a", "t": 20, "v": float("nan")},
        {"id": 3, "k": "a", "t": 30, "v": None},
        {"id": 4, "k": "a", "t": 40, "v": 6.0},
    ]
    out = MovingAverageTransform("t", "k", "v", window=2,
                                 order_tiebreak="id") \
        .apply(MemorySource(rows).read())
    got = {r["id"]: r["v_mavg"] for r in out.take_all()}
    assert got[1] == 2.0
    assert math.isnan(got[2])            # avg({2.0, NaN}) = NaN
    assert math.isnan(got[3])            # avg({NaN, NULL}) = NaN
    assert got[4] == 6.0                 # NULL ignored, window {6.0}


def test_unpivot_round_trip(ray_session):
    wide = MemorySource([
        {"uid": 1, "click": 3, "view": 0},
        {"uid": 2, "click": 0, "view": None},
    ]).read()
    out = UnpivotTransform("uid", ["click", "view"]).apply(wide)
    got = {(r["uid"], r["name"]): r["value"] for r in out.take_all()}
    assert got == {(1, "click"): 3, (1, "view"): 0,
                   (2, "click"): 0, (2, "view"): None}
    # SQL UNPIVOT default: NULL measures dropped
    out2 = UnpivotTransform("uid", ["click", "view"],
                            drop_null=True).apply(wide)
    assert len(out2.take_all()) == 3


def test_corr_stats_exact_vs_numpy(ray_session):
    rng = np.random.default_rng(7)
    x = rng.integers(1, 50, 400)
    y = (x // 3 + rng.integers(0, 10, 400)).astype(np.int64)
    rows = [{"g": "p" if i % 2 else "q", "x": int(a), "y": int(b)}
            for i, (a, b) in enumerate(zip(x, y))]
    # one zero-variance group → NULL corr, covar 0
    rows += [{"g": "z", "x": 4, "y": int(v)} for v in (1, 2, 3)]
    ds = MemorySource(rows).read()
    out = {r["g"]: r for r in
           CorrStatsTransform(["g"], "x", "y",
                              with_regression=True).apply(ds).take_all()}
    for g in ("p", "q"):
        xs = np.array([r["x"] for r in rows if r["g"] == g], dtype=float)
        ys = np.array([r["y"] for r in rows if r["g"] == g], dtype=float)
        assert out[g]["n"] == len(xs)
        assert math.isclose(out[g]["corr"],
                            np.corrcoef(xs, ys)[0, 1], rel_tol=1e-12)
        assert math.isclose(out[g]["covar_pop"],
                            np.cov(xs, ys, bias=True)[0, 1], rel_tol=1e-12)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert math.isclose(out[g]["regr_slope"], slope, rel_tol=1e-9)
        assert math.isclose(out[g]["regr_intercept"], intercept,
                            rel_tol=1e-9)
    assert out["z"]["corr"] is None
    assert out["z"]["covar_pop"] == 0.0
    assert out["z"]["regr_slope"] is None
    assert out["z"]["regr_intercept"] is None


def test_list_stats_empty_null_and_middle_empty(ray_session):
    import pyarrow as pa

    from etlray.sources import MemorySource
    from etlray.stages import ListStatsTransform

    t = pa.table({
        "rid": [1, 2, 3, 4],
        "v": pa.array([[1.0, 2.0], [], [3.0], None],
                      type=pa.list_(pa.float32())),
    })
    ds = MemorySource(t).read()
    out = {r["rid"]: r for r in
           ListStatsTransform("v").apply(ds).take_all()}
    assert out[1]["v_dim"] == 2 and out[1]["v_min"] == 1.0 \
        and out[1]["v_max"] == 2.0 and out[1]["v_sum"] == 3.0
    # empty list: dim 0, NULL aggregates (SQL list_min([]) IS NULL) —
    # and the empty middle segment must NOT corrupt its neighbors
    assert out[2]["v_dim"] == 0 and out[2]["v_min"] is None \
        and out[2]["v_sum"] is None
    assert out[3]["v_dim"] == 1 and out[3]["v_min"] == 3.0 \
        and out[3]["v_sum"] == 3.0
    # NULL list: NULL dim and aggregates (SQL len(NULL) IS NULL)
    assert out[4]["v_dim"] is None and out[4]["v_max"] is None


def test_window_lag_offset_and_default(ray_session):
    from etlray.stages import WindowLagTransform

    rows = [
        {"id": 1, "k": "a", "t": 10, "v": 1.0},
        {"id": 2, "k": "a", "t": 20, "v": None},  # source NULL
        {"id": 3, "k": "a", "t": 30, "v": 3.0},
        {"id": 4, "k": "a", "t": 40, "v": 4.0},
        {"id": 5, "k": "b", "t": 10, "v": 5.0},   # short key: all default
    ]
    out = WindowLagTransform("t", "k", "v", order_tiebreak="id",
                             gap_col=None, with_lead=True, lag_offset=2,
                             lag_default=-1.0) \
        .apply(MemorySource(rows).read())
    got = {r["id"]: (r["v_lag"], r["v_lead"]) for r in out.take_all()}
    assert got[1] == (-1.0, 3.0)      # default past bounds, lead skips 2
    assert got[2] == (-1.0, 4.0)
    assert got[3] == (1.0, -1.0)
    # a lagged source NULL stays NULL — the default is bounds-only
    assert got[4] == (None, -1.0)
    assert got[5] == (-1.0, -1.0)     # key of 1 row: both defaulted


def test_ratio_to_report_null_and_zero_partition(ray_session):
    from etlray.stages import RatioToReportTransform

    rows = [
        {"k": "a", "v": 1.0}, {"k": "a", "v": 3.0}, {"k": "a", "v": None},
        {"k": "z", "v": 2.0}, {"k": "z", "v": -2.0},  # sums to 0 → NULL
    ]
    out = RatioToReportTransform("k", "v").apply(
        MemorySource(rows).read()).take_all()
    got = sorted(((r["k"], r["v"], r["v_ratio"]) for r in out),
                 key=lambda x: (x[0], x[1] is None,
                                x[1] if x[1] is not None else 0.0))
    assert got == [("a", 1.0, 0.25), ("a", 3.0, 0.75), ("a", None, None),
                   ("z", -2.0, None), ("z", 2.0, None)]


def test_list_stats_element_nulls_nan_and_int_exactness(ray_session):
    import pyarrow as pa

    from etlray.sources import MemorySource
    from etlray.stages import ListStatsTransform

    # float path: element NULLs skipped; NaN follows the float total
    # order (max/sum poisoned, min only when NaNs are all that's valid)
    tf = pa.table({
        "rid": [1, 2, 3],
        "v": pa.array([[1.0, None], [1.0, float("nan")],
                       [float("nan"), None]],
                      type=pa.list_(pa.float64())),
    })
    out = {r["rid"]: r for r in ListStatsTransform("v").apply(
        MemorySource(tf).read()).take_all()}
    assert (out[1]["v_min"], out[1]["v_max"], out[1]["v_sum"]) == \
        (1.0, 1.0, 1.0)
    assert out[2]["v_min"] == 1.0 and math.isnan(out[2]["v_max"]) \
        and math.isnan(out[2]["v_sum"])
    assert math.isnan(out[3]["v_min"]) and math.isnan(out[3]["v_sum"])
    assert out[3]["v_dim"] == 2

    # int path: exact beyond 2^53, element type preserved, all-null
    # list -> NULL aggregates
    big = 2**53 + 1
    ti = pa.table({
        "rid": [1, 2],
        "v": pa.array([[big, 1, None], [None, None]],
                      type=pa.list_(pa.int64())),
    })
    out = {r["rid"]: r for r in ListStatsTransform("v").apply(
        MemorySource(ti).read()).take_all()}
    assert out[1]["v_sum"] == big + 1          # not 2^53 + 2 - 1 rounded
    assert out[1]["v_min"] == 1 and out[1]["v_max"] == big
    assert isinstance(out[1]["v_sum"], int)
    assert out[2]["v_min"] is None and out[2]["v_sum"] is None \
        and out[2]["v_dim"] == 2
