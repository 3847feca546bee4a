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
