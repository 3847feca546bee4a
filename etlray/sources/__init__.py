from etlray.sources.csv import AsyncCsvSource, CsvSource
from etlray.sources.json import JsonLinesSource, JsonSource, JsonStreamSource
from etlray.sources.parquet import ParquetSource
from etlray.sources.memory import MemorySource
from etlray.sources.delta import DeltaSource
from etlray.sources.orc import OrcSource
from etlray.sources.feather import FeatherSource

__all__ = ["AsyncCsvSource", "CsvSource", "JsonStreamSource", "JsonSource",
           "JsonLinesSource", "ParquetSource", "MemorySource", "DeltaSource",
           "OrcSource", "FeatherSource"]
