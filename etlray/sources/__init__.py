from etlray.sources.csv import CsvSource
from etlray.sources.json import JsonLinesSource, JsonSource
from etlray.sources.parquet import ParquetSource
from etlray.sources.memory import MemorySource

__all__ = ["CsvSource", "JsonSource", "JsonLinesSource", "ParquetSource", "MemorySource"]
