"""ArrayAggTransform (ordered per-group list collection, nested
output) and RangeWindowAggTransform (sliding time-RANGE window
sum/count) — hand-computed references on small inputs; the DuckDB
list(ORDER BY)/RANGE-frame oracles gate the same operators at scale
(scripts/check_oracles.py)."""

import numpy as np
import pyarrow as pa
import pytest

from etlray.sources import MemorySource
from etlray.stages import ArrayAggTransform, RangeWindowAggTransform


def test_array_agg_order_nulls_and_null_group(ray_session):
    t = pa.table({
        "k": ["a", "a", "a", None, "b"],
        "o": [30, 10, 20, 5, 1],
        "v": [3.0, 1.0, None, 9.0, 7.0],
    })
    rows = {r["k"]: r["v_list"] for r in ArrayAggTransform(
        "k", "v", order_col="o").apply(
        MemorySource(t).read()).take_all()}
    # values in order-col order, NULL values KEPT (SQL list())
    assert rows["a"] == [1.0, None, 3.0]
    assert rows["b"] == [7.0]
    # a NULL group key is a group
    assert rows[None] == [9.0]


def test_array_agg_across_blocks(ray_session):
    rng = np.random.default_rng(3)
    n = 4000
    t = pa.table({
        "k": rng.integers(0, 7, n),
        "o": rng.permutation(n).astype(np.int64),
        "v": np.arange(n, dtype=np.int64),
    })
    ds = MemorySource(t).read().repartition(11)
    got = {r["k"]: r["v_list"] for r in ArrayAggTransform(
        "k", "v", order_col="o").apply(ds).take_all()}
    df = t.to_pandas().sort_values("o")
    for k, grp in df.groupby("k"):
        assert got[k] == grp["v"].tolist()


def test_range_window_peers_nulls_and_frame(ray_session):
    # key a at t=0,50,100,100,200 with window 100 back; t=100 twice ->
    # RANGE peers: BOTH t=100 rows see both (upper bound includes ties)
    t = pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "k": ["a", "a", "a", "a", "a", "b"],
        "t": [0, 50, 100, 100, 200, 0],
        "v": [1.0, None, 4.0, 8.0, 16.0, None],
    })
    out = {r["id"]: r for r in RangeWindowAggTransform(
        "k", "t", "v", preceding=100).apply(
        MemorySource(t).read()).take_all()}
    assert (out[1]["range_sum"], out[1]["range_count"]) == (1.0, 1)
    # NULL value row: counted windows skip it but its own row still
    # aggregates its trailing window
    assert (out[2]["range_sum"], out[2]["range_count"]) == (1.0, 1)
    assert (out[3]["range_sum"], out[3]["range_count"]) == (13.0, 3)
    assert (out[4]["range_sum"], out[4]["range_count"]) == (13.0, 3)
    # t=200 window [100,200]: the two t=100 rows + itself
    assert (out[5]["range_sum"], out[5]["range_count"]) == (28.0, 3)
    # window with zero valid values -> NULL sum, count 0
    assert out[6]["range_sum"] is None and out[6]["range_count"] == 0


def test_range_window_overflow_fallback_matches(ray_session):
    # span * n_groups >= 2^62 forces the per-group-slice path; the
    # answers must match the composite-offset path's semantics
    big = 1 << 61
    t = pa.table({
        "id": [1, 2, 3, 4],
        "k": ["a", "a", "b", "b"],
        "t": [0, big, 5, 10],
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    out = {r["id"]: r for r in RangeWindowAggTransform(
        "k", "t", "v", preceding=10).apply(
        MemorySource(t).read()).take_all()}
    assert (out[1]["range_sum"], out[2]["range_sum"]) == (1.0, 2.0)
    assert (out[3]["range_sum"], out[4]["range_sum"]) == (3.0, 7.0)


def test_range_window_and_gapfill_reject_float_order(ray_session):
    # np.asarray(int64) would silently truncate a float order column;
    # both operators must refuse instead
    from etlray.stages import GapFillAggTransform

    t = pa.table({"k": ["a", "a"], "t": [1.5, 2.5], "v": [1.0, 2.0]})
    with pytest.raises(Exception, match="integer or temporal"):
        RangeWindowAggTransform("k", "t", "v", preceding=1).apply(
            MemorySource(t).read()).take_all()
    with pytest.raises(Exception, match="integer or timestamp"):
        GapFillAggTransform("k", "t", stride=1, value_col="v").apply(
            MemorySource(t).read()).take_all()


def test_range_window_rejects_null_order(ray_session):
    t = pa.table({"k": ["a"], "t": pa.array([None], pa.int64()),
                  "v": [1.0]})
    with pytest.raises(Exception, match="has NULLs"):
        RangeWindowAggTransform("k", "t", "v", preceding=10).apply(
            MemorySource(t).read()).take_all()


def test_range_window_empty_buckets_share_schema(ray_session):
    # one key -> every other exchange bucket reduces EMPTY; a
    # schema-strict consumer (parquet write) must still succeed, i.e.
    # empty blocks must carry the same column order and types
    import glob
    import tempfile

    t = pa.table({"k": ["a", "a", "a"], "t": [1, 2, 3],
                  "v": [1.0, 2.0, 3.0]})
    out = RangeWindowAggTransform("k", "t", "v", preceding=1).apply(
        MemorySource(t).read())
    with tempfile.TemporaryDirectory() as d:
        out.write_parquet(d)
        got = pa.concat_tables(
            [__import__("pyarrow.parquet", fromlist=["pq"])
             .read_table(f) for f in sorted(glob.glob(f"{d}/*.parquet"))])
    assert got.num_rows == 3
    assert got.schema.field("range_count").type == pa.int64()
    assert got.schema.field("range_sum").type == pa.float64()
