"""As-of join + partitioned join types."""

import datetime as dt

import pytest

from etlray.sources import MemorySource
from etlray.stages import AsofJoinTransform, PartitionedHashJoinTransform


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_asof_backward(ray_session):
    trades = MemorySource([
        {"tid": 1, "sym": "A", "ts": _ts(10)},
        {"tid": 2, "sym": "A", "ts": _ts(12)},
        {"tid": 3, "sym": "B", "ts": _ts(11)},
        {"tid": 4, "sym": "C", "ts": _ts(9)},   # no quote before
    ]).read()
    quotes = MemorySource([
        {"sym": "A", "ts": _ts(9), "px": 1.0},
        {"sym": "A", "ts": _ts(11), "px": 2.0},
        {"sym": "B", "ts": _ts(10), "px": 3.0},
        {"sym": "C", "ts": _ts(10), "px": 4.0},
    ]).read()
    out = {r["tid"]: r for r in AsofJoinTransform(
        quotes, on="ts", by="sym").apply(trades).take_all()}
    assert out[1]["px"] == 1.0          # latest quote at/before 10:00
    assert out[2]["px"] == 2.0
    assert out[3]["px"] == 3.0
    assert out[4]["px"] is None         # nothing before 9:00


def test_partitioned_join_semi_anti(ray_session):
    left = MemorySource([{"k": i, "v": i * 10} for i in range(6)]).read()
    right = MemorySource([{"k": 0}, {"k": 2}, {"k": 4}]).read()
    semi = PartitionedHashJoinTransform(right, on="k", how="left_semi",
                                        num_buckets=4).apply(left)
    assert sorted(r["k"] for r in semi.take_all()) == [0, 2, 4]
    anti = PartitionedHashJoinTransform(right, on="k", how="left_anti",
                                        num_buckets=4).apply(left)
    assert sorted(r["k"] for r in anti.take_all()) == [1, 3, 5]


def test_partitioned_join_full_outer(ray_session):
    left = MemorySource([{"k": 1, "l": "a"}, {"k": 2, "l": "b"}]).read()
    right = MemorySource([{"k": 2, "r": "x"}, {"k": 3, "r": "y"}]).read()
    rows = PartitionedHashJoinTransform(right, on="k", how="full",
                                        num_buckets=4).apply(left).take_all()
    ks = sorted(r["k"] for r in rows)
    assert ks == [1, 2, 3]


def test_broadcast_join_rejects_right_full(ray_session):
    import pyarrow as pa

    from etlray.errors import TransformError
    from etlray.stages.joins import BroadcastJoinTransform

    right = pa.table({"k": [1, 2], "v": ["a", "b"]})
    for how in ("right", "full"):
        with pytest.raises(TransformError):
            BroadcastJoinTransform(right, on="k", how=how)
