from etlray.sinks.parquet import ParquetSink
from etlray.sinks.json import JsonLinesSink, JsonSink
from etlray.sinks.console import ConsoleSink
from etlray.sinks.memory import MemorySink
from etlray.sinks.delta import DeltaSink
from etlray.sinks.orc import OrcSink
from etlray.sinks.csv import CsvSink
from etlray.sinks.feather import FeatherSink

__all__ = ["ParquetSink", "JsonSink", "JsonLinesSink", "ConsoleSink",
           "MemorySink", "DeltaSink", "OrcSink", "CsvSink", "FeatherSink"]
