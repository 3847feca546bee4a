"""GapFillAggTransform — sparse→dense time-series densification:
per-key bucket counts/sums with zero-count rows for the missing
buckets between each key's min and max. Hand-computed references here;
the DuckDB generate_series LEFT JOIN oracle gates it at scale
(scripts/check_oracles.py)."""

import numpy as np
import pyarrow as pa
import pytest

from etlray.sources import MemorySource
from etlray.stages import GapFillAggTransform


def test_gapfill_basic_gaps_and_all_null_bucket(ray_session):
    # key a: buckets 0,20,30 present (10 missing); bucket 20 has only
    # NULL values -> n_events 2, sum NULL; gaps -> n_events 0, sum NULL
    t = pa.table({
        "k": ["a", "a", "a", "a", "a", "b"],
        "o": [5, 21, 25, 30, 39, 100],
        "v": [1.0, None, None, 4.0, 8.0, 7.0],
    })
    rows = {(r["k"], r["o_bucket"]): (r["n_rows"], r["v_sum"])
            for r in GapFillAggTransform(
                "k", "o", stride=10, value_col="v").apply(
                MemorySource(t).read()).take_all()}
    assert rows[("a", 0)] == (1, 1.0)
    assert rows[("a", 10)] == (0, None)
    assert rows[("a", 20)] == (2, None)
    assert rows[("a", 30)] == (2, 12.0)
    assert rows[("b", 100)] == (1, 7.0)
    assert len(rows) == 5


def test_gapfill_timestamp_buckets(ray_session):
    us = 1_000_000
    ts = pa.array([0, 3 * 3600 * us, 3 * 3600 * us + 5],
                  type=pa.timestamp("us"))
    t = pa.table({"k": ["x", "x", "x"], "ts": ts,
                  "v": [1.0, 2.0, 4.0]})
    out = GapFillAggTransform("k", "ts", stride=3600 * us,
                              value_col="v").apply(
        MemorySource(t).read()).take_all()
    assert len(out) == 4                      # hours 0..3 densified
    by_b = {r["ts_bucket"].hour: (r["n_rows"], r["v_sum"]) for r in out}
    assert by_b[0] == (1, 1.0)
    assert by_b[1] == (0, None) and by_b[2] == (0, None)
    assert by_b[3] == (2, 6.0)
    # bucket column keeps the timestamp type
    assert all(hasattr(r["ts_bucket"], "hour") for r in out)


def test_gapfill_across_blocks_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table({
        "k": rng.integers(0, 9, n),
        "o": rng.integers(0, 500, n).astype(np.int64),
        "v": rng.normal(size=n),
    })
    ds = MemorySource(t).read().repartition(13)
    got = {(r["k"], r["o_bucket"]): (r["n_rows"], r["v_sum"])
           for r in GapFillAggTransform(
               "k", "o", stride=50, value_col="v").apply(ds).take_all()}
    df = t.to_pandas()
    df["b"] = (df["o"] // 50) * 50
    agg = df.groupby(["k", "b"])["v"].agg(["count", "sum"])
    for k, grp in df.groupby("k"):
        lo, hi = grp["b"].min(), grp["b"].max()
        for b in range(int(lo), int(hi) + 50, 50):
            if (k, b) in agg.index:
                cnt = len(grp[grp["b"] == b])
                assert got[(k, b)][0] == cnt
                assert abs(got[(k, b)][1] - agg.loc[(k, b), "sum"]) < 1e-9
            else:
                assert got[(k, b)] == (0, None)
    assert len(got) == sum(
        (int(g["b"].max() - g["b"].min()) // 50) + 1
        for _, g in df.groupby("k"))


def test_locf_fill_leading_nulls_and_key_isolation(ray_session):
    from etlray.stages import LocfFillTransform

    # key a starts with NULLs (stay NULL — nothing to carry), then
    # carries 5.0 across two NULLs; key b must NOT inherit a's value
    t = pa.table({
        "id": [1, 2, 3, 4, 5, 6, 7],
        "k": ["a", "a", "a", "a", "a", "b", "b"],
        "o": [10, 20, 30, 40, 50, 10, 20],
        "v": [None, None, 5.0, None, 7.0, None, 3.0],
    })
    got = {r["id"]: r["v_locf"] for r in LocfFillTransform(
        "k", "o", "v", tiebreak="id").apply(
        MemorySource(t).read()).take_all()}
    assert got == {1: None, 2: None, 3: 5.0, 4: 5.0, 5: 7.0,
                   6: None, 7: 3.0}
    # string values pass through without a numpy round trip
    ts = pa.table({"id": [1, 2, 3], "k": ["a"] * 3, "o": [1, 2, 3],
                   "v": ["x", None, "y"]})
    got = {r["id"]: r["v_locf"] for r in LocfFillTransform(
        "k", "o", "v", tiebreak="id").apply(
        MemorySource(ts).read()).take_all()}
    assert got == {1: "x", 2: "x", 3: "y"}


def test_locf_matches_pandas_ffill(ray_session):
    import pandas as pd

    from etlray.stages import LocfFillTransform

    rng = np.random.default_rng(5)
    n = 3000
    v = rng.normal(size=n)
    v[rng.random(n) < 0.4] = np.nan
    t = pa.table({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 8, n),
        "o": rng.permutation(n).astype(np.int64),
        "v": pa.array([None if np.isnan(x) else float(x) for x in v]),
    })
    ds = MemorySource(t).read().repartition(9)
    got = {r["id"]: r["v_locf"] for r in LocfFillTransform(
        "k", "o", "v", tiebreak="id").apply(ds).take_all()}
    df = t.to_pandas().sort_values(["k", "o", "id"])
    df["want"] = df.groupby("k")["v"].ffill()
    for _, row in df.iterrows():
        w = None if pd.isna(row["want"]) else row["want"]
        g = got[row["id"]]
        assert (g is None and w is None) or abs(g - w) < 1e-12


def test_gapfill_bucket_explosion_guard(ray_session):
    t = pa.table({"k": ["a", "a"], "o": [0, 10**12], "v": [1.0, 2.0]})
    with pytest.raises(Exception, match="max_buckets"):
        GapFillAggTransform("k", "o", stride=1, value_col="v",
                            max_buckets=1000).apply(
            MemorySource(t).read()).take_all()
    # int64-wrap bypass: keys individually under 2^63 buckets whose
    # SUM wraps negative must still raise, not attempt the grid
    t2 = pa.table({"k": ["a", "a", "b", "b"],
                   "o": [0, (1 << 62), 0, (1 << 62)],
                   "v": [1.0, 2.0, 3.0, 4.0]})
    with pytest.raises(Exception, match="max_buckets"):
        GapFillAggTransform("k", "o", stride=1, value_col="v").apply(
            MemorySource(t2).read()).take_all()


def test_gapfill_int32_time_and_empty_bucket_schema(ray_session):
    # bucket column keeps the INPUT type across non-empty AND empty
    # exchange buckets; parquet write (schema-strict) must succeed
    import glob
    import tempfile

    t = pa.table({"k": ["a", "a"],
                  "o": pa.array([5, 25], pa.int32()),
                  "v": [1.0, 2.0]})
    out = GapFillAggTransform("k", "o", stride=10, value_col="v").apply(
        MemorySource(t).read())
    with tempfile.TemporaryDirectory() as d:
        out.write_parquet(d)
        got = pa.concat_tables(
            [__import__("pyarrow.parquet", fromlist=["pq"])
             .read_table(f) for f in sorted(glob.glob(f"{d}/*.parquet"))])
    assert got.num_rows == 3                  # buckets 0,10,20
    assert got.schema.field("o_bucket").type == pa.int32()


def test_interp_fill_edges_ties_and_keys(ray_session):
    from etlray.stages import InterpFillTransform

    t = pa.table({
        "id": [1, 2, 3, 4, 5, 6, 7, 8, 9],
        "k": ["a", "a", "a", "a", "a", "b", "b", "c", "c"],
        "o": [10, 20, 30, 40, 50, 10, 20, 10, 10],
        #      edge  interp x2      edge | no next | order tie
        "v": [None, 4.0, None, None, 10.0, 2.0, None, 1.0, None],
    })
    got = {r["id"]: r["v_interp"] for r in InterpFillTransform(
        "k", "o", "v", tiebreak="id").apply(
        MemorySource(t).read().repartition(3)).take_all()}
    assert got[1] is None              # no previous observation
    assert abs(got[3] - 6.0) < 1e-12   # 4 + (10-4)*(30-20)/(50-20)
    assert abs(got[4] - 8.0) < 1e-12
    assert got[5] == 10.0              # non-NULL passes through
    assert got[7] is None              # no next observation
    assert got[9] is None              # prev exists, next doesn't
    # order tie between neighbors carries the previous value
    tt = pa.table({"id": [1, 2, 3], "k": ["a"] * 3, "o": [5, 5, 5],
                   "v": [3.0, None, 9.0]})
    got = {r["id"]: r["v_interp"] for r in InterpFillTransform(
        "k", "o", "v", tiebreak="id").apply(
        MemorySource(tt).read()).take_all()}
    assert got[2] == 3.0


def test_interp_matches_pandas_interpolate(ray_session):
    import pandas as pd

    from etlray.stages import InterpFillTransform

    rng = np.random.default_rng(11)
    n = 2000
    v = rng.normal(size=n) * 10
    v[rng.random(n) < 0.4] = np.nan
    # unique order values per key so pandas' index-based interpolate
    # is the exact same rule
    t = pa.table({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 6, n),
        "o": rng.permutation(n).astype(np.int64),
        "v": pa.array([None if np.isnan(x) else float(x) for x in v]),
    })
    ds = MemorySource(t).read().repartition(7)
    got = {r["id"]: r["v_interp"] for r in InterpFillTransform(
        "k", "o", "v", tiebreak="id").apply(ds).take_all()}
    df = t.to_pandas().sort_values(["k", "o"])
    for _, g in df.groupby("k"):
        s = pd.Series(g["v"].to_numpy(), index=g["o"].to_numpy())
        want = s.interpolate(method="index", limit_area="inside")
        for rid, w in zip(g["id"].to_numpy(), want.to_numpy()):
            r = got[rid]
            if np.isnan(w):
                assert r is None
            else:
                assert abs(r - w) < 1e-9, (rid, r, w)


def test_interp_rejects_float_order(ray_session):
    from etlray.errors import TransformError
    from etlray.stages import InterpFillTransform

    t = pa.table({"k": ["a"], "o": [1.5], "v": [1.0]})
    with pytest.raises(Exception):
        InterpFillTransform("k", "o", "v").apply(
            MemorySource(t).read()).take_all()
