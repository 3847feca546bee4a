"""Conformance corpus: the reference's five example pipelines
(SURVEY.md §3.3), end-to-end through Pipeline.execute()."""

import json

import pytest

from etlray import pipelines as P


@pytest.fixture()
def users_csv(tmp_path):
    p = tmp_path / "users.csv"
    p.write_text(
        "id,name,age,active,email\n"
        "1,Alice,25,true,a@x.com\n"
        "2,Bob,17,true,b@x.com\n"
        "3,João,31,false,j@x.com\n"
        "4,Dan,18,yes,d@x.com\n"
    )
    return str(p)


@pytest.fixture()
def sales_csv(tmp_path):
    p = tmp_path / "sales.csv"
    p.write_text(
        "id,customer_id,product,amount,date\n"
        "1,10,widget,1500.0,2024-01-05\n"
        "2,11,gadget,500.0,2024-01-06\n"
        "3,12,trinket,50.0,2024-01-07\n"
        "4,13,doodad,101.0,2024-01-08\n"
    )
    return str(p)


def test_example_00(users_csv, tmp_path, ray_session):
    out = tmp_path / "adults.json"
    r = P.example_00(users_csv, str(out))
    data = json.loads(out.read_text())
    assert {d["id"] for d in data} == {1, 4}         # Bob minor, João inactive
    assert r["metrics"].total_executions == 1
    assert r["metrics"].success_rate == 1.0


def test_example_01(sales_csv, tmp_path, ray_session, capsys):
    out_json, out_jsonl = tmp_path / "s.json", tmp_path / "s.jsonl"
    P.example_01(sales_csv, str(out_json), str(out_jsonl))
    data = json.loads(out_json.read_text())
    assert {d["id"] for d in data} == {1, 2, 4}      # amount > 100
    by_id = {d["id"]: d for d in data}
    assert by_id[1]["discount"] == pytest.approx(150.0)     # >1000 → 10%
    assert by_id[2]["discount"] == pytest.approx(25.0)      # >100 → 5%
    assert by_id[1]["final_amount"] == pytest.approx(1350.0)
    assert "client_id" in by_id[1] and "customer_id" not in by_id[1]
    lines = [json.loads(l) for l in out_jsonl.read_text().splitlines() if l]
    assert len(lines) == 3


def test_example_02_events_and_metrics(ray_session):
    rows = [{"id": i, "value": v} for i, v in enumerate([5, -2, 7, 0])]
    r = P.example_02(rows)
    kinds = [e.kind for e in r["events"]]
    assert kinds[0] == "started" and "completed" in kinds
    assert any(k == "state_changed" for k in kinds)
    assert r["data"].num_rows == 3                  # -2 filtered
    assert r["rows_per_second"] is None or r["rows_per_second"] > 0


def test_example_03_dates(ray_session):
    rows = [
        {"id": 1, "nome": "Ana", "data_nascimento": "1990-03-15",
         "ultimo_login": "2024-07-13 14:30:00", "data_cadastro": "2024-07-13"},
        {"id": 2, "nome": "Bruno", "data_nascimento": "1985-01-01",
         "ultimo_login": "2024-07-13T09:00:00", "data_cadastro": "2024-07-13T14:30:00Z"},
        {"id": 3, "nome": "Clara", "data_nascimento": "13/07/1995",
         "ultimo_login": "bad", "data_cadastro": "nope"},
    ]
    r = P.example_03(rows)
    data = {row["id"]: row for row in r["data"].to_pylist()}
    assert set(data) == {1, 3}                      # 1985 filtered by year > 1988
    assert data[1]["birth_year"] == 1990 and data[1]["decade"] == 1990
    assert data[3]["birth_year"] == 1995            # dd/mm format parsed
    assert data[3]["ultimo_login"] is None          # lenient null-on-failure
    assert data[3]["data_cadastro"] is None


def test_example_05_parquet_roundtrip(tmp_path, sf_dir, ray_session):
    res = P.example_05(f"{sf_dir}/documents.parquet", str(tmp_path))
    assert set(res) == {"snappy", "gzip", "zstd", "uncompressed"}
    assert len(set(res.values())) == 1 and all(v > 0 for v in res.values())


def test_pipeline_metrics_accumulate(users_csv, tmp_path, ray_session):
    """Reference pipeline tests assert metrics across runs
    (src/pipeline/mod.rs:477-556)."""
    from etlray import Pipeline
    from etlray.sinks import MemorySink
    from etlray.sources import CsvSource

    sink = MemorySink()
    p = Pipeline.builder().extract(CsvSource(users_csv)).load(sink).build()
    p.execute()
    p.execute()
    m = p.get_metrics()
    assert m.total_executions == 2
    assert m.successful_executions == 2
    assert m.total_rows_processed == 8


def test_pipeline_failure_recorded(tmp_path, ray_session):
    from etlray import Pipeline
    from etlray.errors import ExtractError, PipelineError
    from etlray.sinks import MemorySink
    from etlray.sources import CsvSource

    p = (Pipeline.builder()
         .extract(CsvSource(str(tmp_path / "missing.csv")))
         .load(MemorySink())
         .build())
    with pytest.raises((ExtractError, PipelineError)):
        p.execute()
    assert p.get_metrics().failed_executions == 1
    assert p.state.value == "failed"


def test_default_batch_size_not_applied(ray_session):
    """The dataclass default (1000, reference parity) must NOT displace
    Ray-native blocks — only an explicit builder/env value applies."""
    import ray.data

    from etlray.pipeline import Pipeline
    from etlray.sinks import MemorySink
    from etlray.stages import SelectColumnsTransform

    t = SelectColumnsTransform(["a"])
    sink = MemorySink()
    Pipeline(ray.data.from_items([{"a": 1, "b": 2}]), [t], [sink]) \
        .execute()
    assert t.batch_size is None  # untouched by the 1000 default
    # explicit builder value IS applied
    t2 = SelectColumnsTransform(["a"])
    p = Pipeline.builder() \
        .extract(ray.data.from_items([{"a": 1, "b": 2}])) \
        .transform(t2).load(MemorySink()).batch_size(64).build()
    p.execute()
    assert t2.batch_size == 64
