"""The reference's five example pipelines, re-expressed Ray-Data-first
(conformance corpus, SURVEY.md §3.3; each has a pytest in
tests/test_pipelines.py).

* example_00 (/root/reference/examples/example_00.rs:13-34): CSV →
  filter(active && age>=18) → pretty JSON + metrics readout.
* example_01 (examples/example_01.rs:30-95): config'd pipeline,
  4-stage chain (filter → computed columns discount/final_amount →
  type conversions → renames) → multi-loader (JSON + JSONL + console).
* example_02 (examples/example_02.rs:33-105): event capture, plugins,
  streaming execution, env config.
* example_03 (examples/example_03.rs:31-127): date pipeline —
  ConvertTypes → date filter → age/decade computed columns.
* example_05 (examples/example_05.rs:32-87): Parquet round-trip with
  compressions + column projection.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from etlray import Pipeline
from etlray.config import ETLConfig
from etlray.events import InMemoryEventEmitter
from etlray.plugins import LoggingPlugin, MetricsPlugin, PluginRegistry
from etlray.sinks import ConsoleSink, JsonLinesSink, JsonSink, MemorySink, ParquetSink
from etlray.sources import CsvSource, MemorySource, ParquetSource
from etlray.stages import (
    CompositeTransform,
    ComputedColumnTransform,
    ConvertTypesTransform,
    FilterTransform,
    RenameColumnsTransform,
)


def example_00(csv_path: str, out_json: str) -> dict:
    """CSV → filter adults+active → pretty JSON array file."""
    sink = JsonSink(out_json, pretty=True)
    p = (Pipeline.builder()
         .extract(CsvSource(csv_path, sniff_extra_booleans=True))
         .transform(FilterTransform(
             (pc.field("active") == True) & (pc.field("age") >= 18)))  # noqa: E712
         .load(sink)
         .build())
    res = p.execute()
    return {"result": res, "metrics": p.get_metrics()}


def example_01(csv_path: str, out_json: str, out_jsonl: str) -> dict:
    """Sales pipeline: filter → discount/final_amount → convert →
    rename → JSON + JSONL + console multi-load."""
    def discount(t: pa.Table) -> pa.Array:
        amt = t["amount"]
        return pc.if_else(pc.greater(amt, 1000.0), pc.multiply(amt, 0.1),
                          pc.if_else(pc.greater(amt, 100.0),
                                     pc.multiply(amt, 0.05),
                                     pc.multiply(amt, 0.0)))

    chain = CompositeTransform([
        FilterTransform(pc.field("amount") > 100.0),
        ComputedColumnTransform("discount", discount),
        ComputedColumnTransform(
            "final_amount", lambda t: pc.subtract(t["amount"], t["discount"])),
        ConvertTypesTransform({"customer_id": "integer", "date": "date"}),
        RenameColumnsTransform({"customer_id": "client_id"}),
    ])
    p = (Pipeline.builder()
         .extract(CsvSource(csv_path))
         .transform(chain)
         .load(JsonSink(out_json), JsonLinesSink(out_jsonl), ConsoleSink(limit=5))
         .build())
    return {"result": p.execute()}


def example_02(rows: list[dict]) -> dict:
    """Event capture + plugins + streaming execution + env config."""
    emitter = InMemoryEventEmitter()
    metrics_plugin = MetricsPlugin()
    registry = PluginRegistry().register(LoggingPlugin()).register(metrics_plugin)
    sink = MemorySink()
    p = (Pipeline.builder()
         .extract(MemorySource(rows))
         .transform(FilterTransform(pc.field("value") >= 0))
         .load(sink)
         .config(ETLConfig.from_env())
         .event_emitter(emitter)
         .plugins(registry)
         .build())
    res = p.execute_streaming()
    return {"result": res, "events": emitter.get_events(),
            "rows_per_second": metrics_plugin.rows_per_second,
            "data": sink.get_data()}


def example_03(rows: list[dict]) -> dict:
    """Date/timestamp pipeline: ConvertTypes → year filter → computed
    age/decade columns (reference example_03.rs:31-127)."""
    sink = MemorySink()

    def age_cols(t: pa.Table) -> pa.Table:
        born = pc.year(t["data_nascimento"])
        t = t.append_column("birth_year", _cc(born))
        t = t.append_column("decade", _cc(pc.multiply(pc.divide(born, 10), 10)))
        return t

    p = (Pipeline.builder()
         .extract(MemorySource(rows))
         .transform(ConvertTypesTransform({
             "data_nascimento": "date",
             "ultimo_login": "datetime",
             "data_cadastro": "timestamp",
         }))
         .transform(FilterTransform(lambda t: pc.greater(
             pc.year(t["data_nascimento"]), 1988)))
         .transform(lambda ds: ds.map_batches(age_cols, batch_format="pyarrow"))
         .load(sink)
         .build())
    res = p.execute()
    return {"result": res, "data": sink.get_data()}


def example_05(src_parquet: str, out_dir: str) -> dict:
    """Parquet round-trip with compression variants + projection."""
    results = {}
    for comp in ("snappy", "gzip", "zstd", "uncompressed"):
        sink = ParquetSink(f"{out_dir}/{comp}", compression=comp, overwrite=True)
        p = (Pipeline.builder()
             .extract(ParquetSource(src_parquet, columns=["doc_id", "lang", "n_chars"]))
             .load(sink)
             .build())
        results[comp] = p.execute().rows_processed
    return results


def _cc(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
