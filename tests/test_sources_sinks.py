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
