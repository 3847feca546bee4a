"""Source/sink parity tests (reference extract/load unit tests,
SURVEY.md §5)."""

import json

import pyarrow as pa
import pytest

from etlray.sinks import JsonLinesSink, JsonSink, MemorySink, ParquetSink
from etlray.sources import CsvSource, JsonLinesSource, JsonSource, MemorySource, ParquetSource


def test_csv_typed_cells(tmp_path, ray_session):
    p = tmp_path / "t.csv"
    p.write_text("a,b,c,d\n1,2.5,true,x\n2,3.5,false,\n")
    rows = CsvSource(str(p)).read().take_all()
    assert rows[0]["a"] == 1 and rows[0]["b"] == 2.5 and rows[0]["c"] is True
    assert rows[1]["d"] is None                    # "" → null


def test_csv_headerless_column_names(tmp_path, ray_session):
    p = tmp_path / "t.csv"
    p.write_text("1,x\n2,y\n")
    rows = CsvSource(str(p), headers=False).read().take_all()
    assert set(rows[0]) == {"column_0", "column_1"}  # reference csv.rs naming


def test_csv_custom_delimiter_and_bool_vocab(tmp_path, ray_session):
    p = tmp_path / "t.csv"
    p.write_text("a;b\n1;yes\n2;no\n")
    rows = (CsvSource(str(p), delimiter=";", sniff_extra_booleans=True)
            .read().take_all())
    assert rows[0]["b"] is True and rows[1]["b"] is False


def test_json_array_and_array_path(tmp_path, ray_session):
    p = tmp_path / "d.json"
    p.write_text(json.dumps({"users": [{"name": "a", "age": 1},
                                       {"name": "b", "age": 2}]}))
    rows = JsonSource(str(p), array_path="users").read().take_all()
    assert len(rows) == 2 and rows[0]["name"] in ("a", "b")


def test_json_single_object_and_scalar(tmp_path, ray_session):
    p = tmp_path / "o.json"
    p.write_text('{"k": 1}')
    assert JsonSource(str(p)).read().take_all() == [{"k": 1}]
    p2 = tmp_path / "s.json"
    p2.write_text("42")
    assert JsonSource(str(p2)).read().take_all() == [{"value": 42}]


def test_jsonl_lenient(tmp_path, ray_session):
    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1}\n\n"scalar"\n{"a": 2}\n')
    rows = JsonLinesSource(str(p), lenient=True).read().take_all()
    assert len(rows) == 3
    assert {"value": "scalar"} in [{k: v for k, v in r.items() if v is not None}
                                   for r in rows]


def test_parquet_projection_and_metadata(sf_dir, ray_session):
    src = ParquetSource(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    rows = src.read().take(5)
    assert set(rows[0]) == {"doc_id", "lang"}      # true pushdown projection
    md = src.get_metadata()
    assert md["num_rows"] > 0 and md["num_row_groups"] >= 1
    assert src.get_metadata() is md                # cached


def test_parquet_sink_overwrite_guard(tmp_path, ray_session):
    from etlray.errors import LoadError

    ds = MemorySource([{"a": 1}]).read()
    sink = ParquetSink(str(tmp_path / "out"))
    assert sink.write(ds)["rows_written"] == 1
    with pytest.raises(LoadError):
        ParquetSink(str(tmp_path / "out")).health_check()
    out2 = ParquetSink(str(tmp_path / "out"), overwrite=True).write(ds)
    assert out2["rows_written"] == 1


def test_json_sink_append_merge(tmp_path, ray_session):
    """Reference JsonLoader append = read-merge-rewrite (json.rs:137-161)."""
    out = tmp_path / "a.json"
    JsonSink(str(out)).write(MemorySource([{"a": 1}]).read())
    JsonSink(str(out), append=True).write(MemorySource([{"a": 2}]).read())
    data = json.loads(out.read_text())
    assert [d["a"] for d in data] == [1, 2]


def test_jsonl_sink_append(tmp_path, ray_session):
    out = tmp_path / "a.jsonl"
    JsonLinesSink(str(out)).write(MemorySource([{"a": 1}]).read())
    JsonLinesSink(str(out), append=True).write(MemorySource([{"a": 2}]).read())
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 2


def test_memory_sink_accumulates(ray_session):
    sink = MemorySink()
    sink.write(MemorySource([{"a": 1}]).read())
    sink.write(MemorySource([{"a": 2}]).read())
    assert len(sink) == 2 and not sink.is_empty()
    sink.clear()
    assert sink.is_empty()


# ---------------------------------------------------------------------------
# round-4 review-wave regressions (sources/sinks/coerce/evolve/lww)
# ---------------------------------------------------------------------------
def test_widen_types_numeric_promotions():
    """str(pa.float64()) is 'double' — the old order list made every
    numeric<->float widening fall through to STRING (an int/float LSN
    column became text and '9' > '10' broke the LWW order)."""
    import pyarrow as pa

    from etlray.cdc.evolve import widen_types

    assert widen_types(pa.int64(), pa.float64()) == pa.float64()
    assert widen_types(pa.int64(), pa.float32()) == pa.float64()
    assert widen_types(pa.float32(), pa.float64()) == pa.float64()
    assert widen_types(pa.int32(), pa.int64()) == pa.int64()
    assert widen_types(pa.int64(), pa.string()) == pa.string()


def test_drop_deletes_keeps_null_op_rows():
    """A NULL op (schema-evolved block without the column) is NOT a
    delete — filter(null) silently dropped 100% of such rows."""
    import pyarrow as pa

    from etlray.cdc.lww import drop_deletes

    t = pa.table({"op": pa.array(["insert", None, "delete"]),
                  "k": pa.array([1, 2, 3])})
    out = drop_deletes(t)
    assert out["k"].to_pylist() == [1, 2]


def test_as_integer_out_of_range_float_is_null():
    import pyarrow as pa

    from etlray.coerce import as_integer

    out = as_integer(pa.array([1e19, -1e19, 5.7, None]))
    assert out.to_pylist() == [None, None, 5, None]


def test_csv_bool_sniff_is_dataset_global(tmp_path, ray_session):
    """The sniff decision must be one per dataset: a file whose first
    rows are all boolean vocab but later rows aren't must stay string
    in EVERY block (per-block sniffing yielded mixed block schemas)."""
    from etlray.sources import CsvSource

    p = tmp_path / "mixed.csv"
    rows = ["flag"] + ["yes"] * 5 + ["maybe"] + ["no"] * 3
    p.write_text("\n".join(rows) + "\n")
    ds = CsvSource(str(p), sniff_extra_booleans=True).read()
    vals = [r["flag"] for r in ds.take_all()]
    assert vals == ["yes"] * 5 + ["maybe"] + ["no"] * 3  # stays string
    # a genuinely boolean column still upgrades
    p2 = tmp_path / "boolish.csv"
    p2.write_text("flag\nyes\nno\nY\n")
    ds2 = CsvSource(str(p2), sniff_extra_booleans=True).read()
    assert [r["flag"] for r in ds2.take_all()] == [True, False, True]


def test_parquet_sink_metadata_reaches_footer(tmp_path, ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from etlray.sinks import ParquetSink

    ds = ray.data.from_items([{"a": 1}, {"a": 2}])
    sink = ParquetSink(str(tmp_path / "out"), metadata={"job": "x"})
    sink.write(ds)
    import glob

    files = glob.glob(str(tmp_path / "out" / "**" / "*.parquet"),
                      recursive=True)
    assert files
    md = pq.ParquetFile(files[0]).schema_arrow.metadata
    assert md and md.get(b"job") == b"x"


def test_json_sink_iso_dates(tmp_path, ray_session):
    import datetime as dt
    import json as _json

    import ray.data

    from etlray.sinks import JsonSink

    ds = ray.data.from_items(
        [{"ts": dt.datetime(2024, 1, 2, 3, 4, 5), "v": 1}])
    p = tmp_path / "out.json"
    JsonSink(str(p)).write(ds)
    rows = _json.load(open(p))
    assert rows[0]["ts"].startswith("2024-01-02T03:04:05")


def test_delta_sink_update_columns_partial_merge(tmp_path, ray_session):
    """update_columns was a silent no-op: matched keys must take
    incoming values ONLY for the listed columns."""
    import ray.data

    from etlray.sinks import DeltaSink

    d = str(tmp_path / "tbl")
    DeltaSink(d, mode="merge", merge_keys=["id"]).write(
        ray.data.from_items([
            {"id": 1, "price": 10.0, "name": "a"},
            {"id": 2, "price": 20.0, "name": "b"}]))
    DeltaSink(d, mode="merge", merge_keys=["id"],
              update_columns=["price"]).write(
        ray.data.from_items([
            {"id": 1, "price": 99.0, "name": "CLOBBER"},
            {"id": 3, "price": 30.0, "name": "c"}]))
    from etlray.cdc.engine import CDCEngine

    eng = CDCEngine(d, keys=["id"], num_buckets=None,
                    content_col="__none__")
    rows = {r["id"]: r for r in eng.read_snapshot().take_all()}
    assert rows[1]["price"] == 99.0
    assert rows[1]["name"] == "a"        # NOT clobbered
    assert rows[2]["name"] == "b"        # untouched key intact
    assert rows[3] and rows[3]["name"] == "c"  # new key inserts as-is


def test_delta_sink_lsn_floor_above_watermark(tmp_path, ray_session,
                                              monkeypatch):
    """Two writes in the same clock microsecond must not silently drop
    the second write's rows at the watermark filter."""
    import time as _time

    import ray.data

    from etlray.sinks import DeltaSink

    d = str(tmp_path / "tbl")
    frozen = _time.time()
    monkeypatch.setattr("etlray.sinks.delta.time",
                        type("T", (), {"time": staticmethod(lambda: frozen)}))
    DeltaSink(d, mode="merge", merge_keys=["id"]).write(
        ray.data.from_items([{"id": 1, "v": 1}]))
    DeltaSink(d, mode="merge", merge_keys=["id"]).write(
        ray.data.from_items([{"id": 1, "v": 2}]))
    from etlray.cdc.engine import CDCEngine

    eng = CDCEngine(d, keys=["id"], num_buckets=None,
                    content_col="__none__")
    rows = {r["id"]: r["v"] for r in eng.read_snapshot().take_all()}
    assert rows == {1: 2}  # second write applied, not dropped


def test_orc_roundtrip_fidelity(tmp_path, ray_session):
    """Types, NULLs and values survive parquet -> ORC -> Dataset."""
    import pyarrow as pa

    from etlray.sinks import OrcSink
    from etlray.sources import MemorySource, OrcSource

    t = pa.table({
        "i": pa.array([1, None, 3], pa.int64()),
        "f": pa.array([1.5, 2.5, None], pa.float64()),
        "s": pa.array(["a", None, "c"]),
        "ts": pa.array([1_000_000, 2_000_000, None],
                       pa.timestamp("us")),
        "b": pa.array([True, False, None]),
    })
    out = str(tmp_path / "orc_dir")
    res = OrcSink(out).write(MemorySource(t).read().repartition(2))
    assert res["rows_written"] == 3
    assert all(p.endswith(".orc") for p in res["paths"])
    ds = OrcSource(out).read()
    got = ds.sort("i").to_pandas()
    want = t.to_pandas().sort_values("i").reset_index(drop=True)
    import pandas as pd

    # ORC's native timestamp unit is ns: the instant survives, the
    # arrow unit widens us -> ns — normalize before comparing
    got["ts"] = pd.to_datetime(got["ts"]).astype("datetime64[us]")
    want["ts"] = pd.to_datetime(want["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[want.columns], want,
        check_dtype=False)


def test_orc_column_pruning_and_overwrite_guard(tmp_path, ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from etlray.errors import LoadError
    from etlray.sinks import OrcSink
    from etlray.sources import MemorySource, OrcSource

    t = pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.1, 0.2]})
    out = str(tmp_path / "orc2")
    OrcSink(out).write(MemorySource(t).read())
    pruned = OrcSource(out, columns=["a", "c"]).read()
    assert sorted(pruned.schema().names) == ["a", "c"]
    with _pytest.raises(LoadError, match="overwrite"):
        OrcSink(out).write(MemorySource(t).read())
    res = OrcSink(out, overwrite=True).write(MemorySource(t).read())
    assert res["rows_written"] == 2
    # overwrite removed the stale parts — directory holds exactly one set
    assert OrcSource(out).read().count() == 2
    with _pytest.raises(LoadError, match="compression"):
        OrcSink(out, compression="lzo")


def test_feather_roundtrip_fidelity(tmp_path, ray_session):
    """Types, NULLs and values survive parquet -> IPC -> Dataset
    bit-exactly (IPC is Arrow's own layout — no unit widening)."""
    import pyarrow as pa
    import ray

    from etlray.sinks import FeatherSink
    from etlray.sources import FeatherSource, MemorySource

    t = pa.table({
        "i": pa.array([1, 2, 3], pa.int64()),
        "f": pa.array([1.5, 2.5, None], pa.float64()),
        "s": pa.array(["a", None, "c"]),
        "ts": pa.array([1_000_000, 2_000_000, None],
                       pa.timestamp("us")),
        "b": pa.array([True, False, None]),
        "lst": pa.array([[1.0, 2.0], None, [3.0]],
                        pa.list_(pa.float64())),
    })
    out = str(tmp_path / "ipc_dir")
    res = FeatherSink(out).write(MemorySource(t).read().repartition(2))
    assert res["rows_written"] == 3
    assert all(p.endswith(".feather") for p in res["paths"])
    # compare as Arrow (ray's to_pandas tensor-casts ragged lists)
    parts = ray.get(FeatherSource(out).read().sort("i").to_arrow_refs())
    got = pa.concat_tables([p for p in parts if p.num_rows])
    assert got.select(t.column_names).equals(t)


def test_feather_pruning_and_overwrite_guard(tmp_path, ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from etlray.errors import LoadError
    from etlray.sinks import FeatherSink
    from etlray.sources import FeatherSource, MemorySource

    t = pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.1, 0.2]})
    out = str(tmp_path / "ipc2")
    FeatherSink(out).write(MemorySource(t).read())
    pruned = FeatherSource(out, columns=["a", "c"]).read()
    assert sorted(pruned.schema().names) == ["a", "c"]
    with _pytest.raises(LoadError, match="overwrite"):
        FeatherSink(out).write(MemorySource(t).read())
    res = FeatherSink(out, overwrite=True).write(MemorySource(t).read())
    assert res["rows_written"] == 2
    assert FeatherSource(out).read().count() == 2
    with _pytest.raises(LoadError, match="compression"):
        FeatherSink(out, compression="gzip")


def test_csv_sink_roundtrip_and_guard(tmp_path, ray_session):
    """Floats write with round-trippable precision; header + types
    survive the text format via typed re-read; overwrite guarded."""
    import glob

    import pyarrow as pa
    import pytest as _pytest

    from etlray.errors import LoadError
    from etlray.sinks import CsvSink
    from etlray.sources import CsvSource, MemorySource

    t = pa.table({
        "i": pa.array([1, 2, 3], pa.int64()),
        "f": pa.array([0.1 + 0.2, 2.5, None], pa.float64()),
        "s": pa.array(["a", None, "c,with,commas"]),
    })
    out = str(tmp_path / "csv_dir")
    res = CsvSink(out).write(MemorySource(t).read())
    assert res["rows_written"] == 3
    back = CsvSource(sorted(glob.glob(out + "/*.csv"))).read() \
        .sort("i").to_pandas()
    assert back["f"][0] == 0.1 + 0.2        # exact double round trip
    assert back["s"][2] == "c,with,commas"  # quoting survives
    assert back["s"].isna()[1] and back["f"].isna()[2]
    with _pytest.raises(LoadError, match="overwrite"):
        CsvSink(out).write(MemorySource(t).read())
    with _pytest.raises(LoadError, match="delimiter"):
        CsvSink(out, delimiter="ab")
