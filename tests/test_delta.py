"""Delta-surface parity: DeltaSink write modes + DeltaSource time travel
(reference src/load/delta.rs + src/extract/delta.rs; Merge here is REAL
unlike the reference's append-fallback)."""

import pyarrow.compute as pc
import pytest

from etlray.sinks import DeltaSink
from etlray.sources import DeltaSource, MemorySource


def test_merge_upsert_and_time_travel(tmp_path, ray_session):
    t = str(tmp_path / "tbl")
    rows1 = [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    DeltaSink(t, mode="merge", merge_keys=["id"], num_buckets=4,
              epoch_id="e1").write(MemorySource(rows1).read())
    rows2 = [{"id": 2, "v": "B2"}, {"id": 3, "v": "c"}]
    DeltaSink(t, mode="merge", merge_keys=["id"], num_buckets=4,
              epoch_id="e2").write(MemorySource(rows2).read())

    cur = {r["id"]: r["v"] for r in DeltaSource(t).read().take_all()}
    assert cur == {1: "a", 2: "B2", 3: "c"}       # real merge, not append

    old = {r["id"]: r["v"] for r in DeltaSource(t, version="e1").read().take_all()}
    assert old == {1: "a", 2: "b"}                # time travel
    assert DeltaSource(t).versions() == ["e1", "e2"]


def test_append_mode_accumulates(tmp_path, ray_session):
    t = str(tmp_path / "tbl")
    DeltaSink(t, mode="append", num_buckets=4, epoch_id="a1").write(
        MemorySource([{"x": 1}]).read())
    DeltaSink(t, mode="append", num_buckets=4, epoch_id="a2").write(
        MemorySource([{"x": 2}]).read())
    vals = sorted(r["x"] for r in DeltaSource(t).read().take_all())
    assert vals == [1, 2]


def test_predicate_and_column_pushdown(tmp_path, ray_session):
    t = str(tmp_path / "tbl")
    rows = [{"id": i, "v": f"x{i}", "n": i * 10} for i in range(10)]
    DeltaSink(t, mode="merge", merge_keys=["id"], num_buckets=4,
              epoch_id="e1").write(MemorySource(rows).read())
    src = DeltaSource(t).with_columns(["id", "n"]).with_predicate(pc.field("n") >= 50)
    out = src.read().take_all()
    assert len(out) == 5
    assert set(out[0]) <= {"id", "n", "bucket_id"}


def test_merge_requires_keys(tmp_path):
    from etlray.errors import LoadError

    with pytest.raises(LoadError):
        DeltaSink(str(tmp_path / "t"), mode="merge")


def test_delta_string_predicate(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from etlray.cdc.engine import CDCEngine
    from etlray.sources.delta import DeltaSource

    eng = CDCEngine(str(tmp_path / "t"), keys=["repo", "path"], num_buckets=2,
                    content_col="__none__")
    eng.bootstrap(ray.data.from_arrow(pa.table({
        "repo": ["r"] * 4, "path": ["a", "b", "c", "d"],
        "age": [10, 20, 30, None], "name": ["x", "y", "z", "w"],
    })))
    src = DeltaSource(str(tmp_path / "t")).with_predicate("age > 18")
    rows = src.read().take_all()
    assert sorted(r["path"] for r in rows) == ["b", "c"]
    src2 = DeltaSource(str(tmp_path / "t")).with_predicate(
        "age >= 10 AND name != 'z'")
    assert sorted(r["path"] for r in src2.read().take_all()) == ["a", "b"]
    src3 = DeltaSource(str(tmp_path / "t")).with_predicate("age IS NULL")
    assert [r["path"] for r in src3.read().take_all()] == ["d"]
