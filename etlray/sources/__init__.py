from etlray.sources.csv import CsvSource
from etlray.sources.json import JsonLinesSource, JsonSource
from etlray.sources.parquet import ParquetSource
from etlray.sources.memory import MemorySource
from etlray.sources.delta import DeltaSource

__all__ = ["CsvSource", "JsonSource", "JsonLinesSource", "ParquetSource", "MemorySource", "DeltaSource"]
