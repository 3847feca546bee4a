"""Property tests: the distributed custom operators must agree with a
single-process pandas/numpy brute-force reference on randomized small
inputs (few examples — each apply spins real exchanges)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlray.sources import MemorySource

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@st.composite
def keyed_rows(draw, keys="abc", max_rows=24, vmax=50, values=None):
    n = draw(st.integers(1, max_rows))
    ks = draw(st.lists(st.sampled_from(list(keys)), min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(0, vmax), min_size=n, max_size=n))
    rows = [{"id": i, "k": k, "t": t}
            for i, (k, t) in enumerate(zip(ks, ts))]
    if values is not None:  # optional value column strategy
        vs = draw(st.lists(values, min_size=n, max_size=n))
        for r, v in zip(rows, vs):
            r["v"] = v
    return rows


@given(left=keyed_rows(), right=keyed_rows())
@settings(**_SETTINGS)
def test_interval_join_matches_bruteforce(ray_session, left, right):
    from etlray.stages import IntervalJoinTransform

    lds = MemorySource(left).read()
    rds = MemorySource([{"rid": r["id"], "k": r["k"], "t": r["t"]}
                        for r in right]).read()
    out = IntervalJoinTransform(rds, on="t", by="k", lower=-5, upper=3) \
        .apply(lds).take_all()
    got = {(r["id"], r["rid"]) for r in out}
    want = {(l["id"], r["id"]) for l in left for r in right
            if l["k"] == r["k"] and l["t"] - 5 <= r["t"] <= l["t"] + 3}
    assert got == want


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_topk_matches_pandas_rank(ray_session, rows):
    from etlray.stages import TopKPerGroupTransform

    ds = MemorySource(rows).read()
    out = TopKPerGroupTransform("k", [("t", True), ("id", False)], k=2) \
        .apply(ds).take_all()
    got = {(r["k"], r["id"]) for r in out}
    df = pd.DataFrame(rows).sort_values(["t", "id"],
                                        ascending=[False, True])
    want = set(df.groupby("k").head(2)[["k", "id"]].itertuples(index=False,
                                                               name=None))
    assert got == want


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_sessionize_matches_pandas(ray_session, rows):
    from etlray.stages import SessionizeTransform

    gap = 4
    ds = MemorySource(rows).read()
    out = SessionizeTransform("t", "k", gap=gap, order_tiebreak="id") \
        .apply(ds).take_all()
    got = {r["id"]: r["session_idx"] for r in out}
    df = pd.DataFrame(rows).sort_values(["k", "t", "id"])
    want = {}
    for _k, g in df.groupby("k"):
        idx = 0
        prev = None
        for r in g.itertuples():
            if prev is None or r.t - prev > gap:
                idx += 1
            want[r.id] = idx
            prev = r.t
    assert got == want


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_count_distinct_matches_pandas(ray_session, rows):
    from etlray.stages import CountDistinctTransform

    ds = MemorySource(rows).read()
    out = CountDistinctTransform("k", "t").apply(ds).take_all()
    got = {r["k"]: r["t_distinct"] for r in out}
    want = pd.DataFrame(rows).groupby("k")["t"].nunique().to_dict()
    assert got == want


@given(rows=keyed_rows(vmax=9))
@settings(**_SETTINGS)
def test_quantiles_match_disc_reference(ray_session, rows):
    import math

    from etlray.stages import QuantilePerGroupTransform

    ds = MemorySource([{"k": r["k"], "v": float(r["t"])} for r in rows]).read()
    out = QuantilePerGroupTransform("k", "v", qs=[0.5]).apply(ds).take_all()
    got = {r["k"]: r["q50"] for r in out}
    want = {}
    for k, g in pd.DataFrame(rows).groupby("k"):
        vals = sorted(float(v) for v in g["t"])
        want[k] = vals[max(math.ceil(0.5 * len(vals)) - 1, 0)]
    assert got == want


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_window_lag_matches_pandas(ray_session, rows):
    from etlray.stages import WindowLagTransform

    # integer ts column (no gap output path) + float value with nulls
    for r in rows:
        r["v"] = float(r["t"]) if r["t"] % 3 else None
    ds = MemorySource(rows).read()
    out = WindowLagTransform("t", "k", "v", order_tiebreak="id") \
        .apply(ds).take_all()
    got = {r["id"]: (r["v_lag"], r["rn"]) for r in out}

    df = pd.DataFrame(rows).sort_values(["k", "t", "id"])
    want = {}
    for _, g in df.groupby("k"):
        prev = None
        for rn, (_, r) in enumerate(g.iterrows(), start=1):
            want[r["id"]] = (prev, rn)
            prev = r["v"]
    for i, (lag, rn) in want.items():
        glag, grn = got[i]
        assert grn == rn
        if lag is None or pd.isna(lag):
            assert glag is None
        else:
            assert glag == lag


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_histogram_matches_numpy(ray_session, rows):
    from etlray.functions.sketch import histogram

    ds = MemorySource(rows).read()
    out = histogram(ds, "t", lo=0.0, hi=50.0, nbins=5)
    got = {r["bin"]: r["cnt"] for r in out.to_pylist()}
    v = np.array([r["t"] for r in rows], dtype=np.float64)
    b = np.floor((v - 0.0) / 50.0 * 5).astype(int)
    b = b[(b >= 0) & (b < 5)]
    want = {int(x): int(c) for x, c in zip(*np.unique(b, return_counts=True))}
    assert got == want


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_heavy_hitters_exact_regime_matches_value_counts(ray_session, rows):
    from etlray.functions.sketch import heavy_hitters

    ds = MemorySource(rows).read()
    out = heavy_hitters(ds, "k", k=3, capacity=64)  # ≤3 distinct → exact
    got = {r["value"]: r["cnt"] for r in out.to_pylist()}
    want = dict(pd.Series([r["k"] for r in rows]).value_counts())
    want = dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    assert got == {str(k): v for k, v in want.items()}


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_centroid_matches_numpy_mean(ray_session, rows):
    from etlray.functions.ann import centroid_per_group

    for r in rows:
        r["embedding"] = [float(r["t"]), float(r["t"] * 2 + 1)]
    ds = MemorySource(rows).read()
    out = centroid_per_group(ds, "k").take_all()
    got = {(r["k"], r["pos"]): (r["centroid_v"], r["n_vecs"]) for r in out}
    df = pd.DataFrame(rows)
    for k, g in df.groupby("k"):
        m = np.mean(np.stack(g["embedding"].to_numpy()), axis=0)
        for pos in (1, 2):
            cv, nv = got[(k, pos)]
            assert nv == len(g)
            assert abs(cv - m[pos - 1]) < 1e-9


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_rollup_matches_pandas(ray_session, rows):
    from etlray.stages import RollupTransform

    ds = MemorySource(rows).read()
    out = RollupTransform(["k"], [("t", "sum"), ("t", "count")]) \
        .apply(ds).take_all()
    got = {r["k"]: (r["t_sum"], r["t_count"]) for r in out}
    df = pd.DataFrame(rows)
    want = {k: (g["t"].sum(), len(g)) for k, g in df.groupby("k")}
    want[None] = (df["t"].sum(), len(df))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k


@given(rows=keyed_rows())
@settings(**_SETTINGS)
def test_weighted_sample_is_topk_by_key(ray_session, rows):
    import hashlib

    from etlray.functions.sampling import weighted_sample

    for r in rows:
        r["w"] = r["t"] + 1  # strictly positive weights
    ds = MemorySource(rows).read()
    out = weighted_sample(ds, "id", "w", k=5, salt="p").take_all()
    got = sorted(r["id"] for r in out)

    def key(r):
        d = hashlib.md5(("p" + str(r["id"])).encode()).digest()
        u = int.from_bytes(d[8:16], "little") / 2**64
        return (u ** (1.0 / r["w"]), -r["id"])

    want = sorted(r["id"] for r in
                  sorted(rows, key=key, reverse=True)[:5])
    assert got == want


_MIXED_VALUES = st.one_of(
    st.none(), st.floats(-100, 100, allow_nan=False, allow_infinity=False))
# positive-only values for the ratio oracle: pandas' and reduceat's
# float summation orders differ in the low bits, so a near-cancelling
# partition would flip the exact-zero branch / amplify ulp noise past
# any tolerance — sums bounded away from 0 make the comparison stable
# (the zero-sum and NULL branches are pinned by the deterministic
# unit test instead)
_POSITIVE_VALUES = st.one_of(
    st.none(), st.floats(0.5, 100, allow_nan=False, allow_infinity=False))


def keyed_valued_rows(values=_MIXED_VALUES):
    return keyed_rows(values=values)


@given(rows=keyed_valued_rows())
@settings(**_SETTINGS)
def test_moving_minmax_matches_pandas_rolling_property(ray_session, rows):
    from etlray.stages import MovingMinMaxTransform

    out = MovingMinMaxTransform("t", "k", "v", window=3,
                                order_tiebreak="id") \
        .apply(MemorySource(rows).read()).take_all()
    got = {r["id"]: (r["v_wmin"], r["v_wmax"]) for r in out}
    df = pd.DataFrame(rows).sort_values(["k", "t", "id"])
    ref_min = df.groupby("k")["v"].transform(
        lambda s: s.rolling(3, min_periods=1).min())
    ref_max = df.groupby("k")["v"].transform(
        lambda s: s.rolling(3, min_periods=1).max())
    for rid, mn, mx in zip(df["id"], ref_min, ref_max):
        if pd.isna(mn):
            assert got[rid] == (None, None)
        else:
            assert got[rid] == (mn, mx)


@given(rows=keyed_valued_rows())
@settings(**_SETTINGS)
def test_lag_offset_matches_bruteforce_property(ray_session, rows):
    from etlray.stages import WindowLagTransform

    out = WindowLagTransform("t", "k", "v", order_tiebreak="id",
                             gap_col=None, with_lead=True, lag_offset=2,
                             lag_default=-7.0) \
        .apply(MemorySource(rows).read()).take_all()
    got = {r["id"]: (r["v_lag"], r["v_lead"]) for r in out}
    df = pd.DataFrame(rows).sort_values(["k", "t", "id"])
    for k, g in df.groupby("k"):
        vals = list(g["v"])
        ids = list(g["id"])
        for i, rid in enumerate(ids):
            want_lag = vals[i - 2] if i >= 2 else -7.0
            want_lead = vals[i + 2] if i + 2 < len(vals) else -7.0
            want_lag = None if want_lag is not None and pd.isna(want_lag) \
                else want_lag
            want_lead = None if want_lead is not None \
                and pd.isna(want_lead) else want_lead
            assert got[rid] == (want_lag, want_lead), (k, rid)


@given(rows=keyed_valued_rows(values=_POSITIVE_VALUES))
@settings(**_SETTINGS)
def test_ratio_to_report_matches_pandas_property(ray_session, rows):
    from etlray.stages import RatioToReportTransform

    out = RatioToReportTransform("k", "v").apply(
        MemorySource(rows).read()).take_all()
    # reattach ids via (k, v) is ambiguous — compare multisets per key
    got = {}
    for r in out:
        got.setdefault(r["k"], []).append(r["v_ratio"])
    df = pd.DataFrame(rows)
    want = {}
    for k, g in df.groupby("k"):
        s = g["v"].sum(skipna=True)
        for v in g["v"]:
            if pd.isna(v) or s == 0.0:
                want.setdefault(k, []).append(None)
            else:
                want.setdefault(k, []).append(v / s)
    import math

    for k in want:
        gs = sorted(got[k], key=lambda x: (x is None, x or 0.0))
        ws = sorted(want[k], key=lambda x: (x is None, x or 0.0))
        assert len(gs) == len(ws), k
        for a, b in zip(gs, ws):
            if b is None:
                assert a is None, k
            else:
                assert a is not None and \
                    math.isclose(a, b, rel_tol=1e-9), (k, a, b)
