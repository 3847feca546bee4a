"""CSV source with the reference's cell-sniffing semantics.

Reference: /root/reference/src/extract/csv.rs:9-153 —
configurable delimiter / headers / quote / escape; headerless files get
``column_{i}`` names (csv.rs tests :243); every cell is type-sniffed:
try i64 → f64 → boolean ("true"/"1"/"yes"/"y" & negatives) → null
(""/"null") → String (csv.rs:60-86).

Here Arrow's CSV reader handles int/float/bool/"null" inference
natively and in C++; the reference's *extra* lenient boolean vocabulary
("yes"/"y"/"no"/"n") is applied as an optional vectorized post-pass
(``sniff_extra_booleans``) that upgrades string columns whose non-null
values are all in the boolean vocab.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import csv as pacsv

from etlray.errors import ExtractError

_BOOL_VOCAB = pa.array(
    ["true", "1", "yes", "y", "false", "0", "no", "n"], type=pa.string()
)
_TRUE_VOCAB = pa.array(["true", "1", "yes", "y"], type=pa.string())


def _bool_verdicts(t: pa.Table) -> pa.Table:
    """Per-block sniff verdict: for each string column, is every
    non-null value in the boolean vocabulary (and how many non-nulls)?
    One tiny row per column per block — the driver folds these into the
    dataset-GLOBAL upgrade decision."""
    names, ok, nn = [], [], []
    for name in t.column_names:
        col = t[name]
        if not (pa.types.is_string(col.type)
                or pa.types.is_large_string(col.type)):
            continue
        nonnull = pc.drop_null(col)
        names.append(name)
        nn.append(len(nonnull))
        if len(nonnull) == 0:
            ok.append(True)
        else:
            low = pc.utf8_lower(pc.utf8_trim_whitespace(nonnull))
            ok.append(pc.all(pc.is_in(low, value_set=_BOOL_VOCAB)).as_py())
    return pa.table({"col": pa.array(names, pa.string()),
                     "ok": pa.array(ok, pa.bool_()),
                     "n": pa.array(nn, pa.int64())})


def _upgrade_bool_columns(t: pa.Table, cols) -> pa.Table:
    for name in cols:
        if name not in t.column_names:
            continue
        i = t.column_names.index(name)
        col = t.column(i)
        low_all = pc.utf8_lower(pc.utf8_trim_whitespace(col))
        as_bool = pc.is_in(low_all, value_set=_TRUE_VOCAB)
        as_bool = pc.if_else(pc.is_valid(col), as_bool,
                             pa.scalar(None, pa.bool_()))
        if isinstance(as_bool, pa.ChunkedArray):
            as_bool = as_bool.combine_chunks()
        t = t.set_column(i, name, as_bool)
    return t


class CsvSource:
    def __init__(
        self,
        path: str | Sequence[str],
        delimiter: str = ",",
        headers: bool = True,
        quote_char: str = '"',
        escape_char: str | None = None,
        sniff_extra_booleans: bool = False,
        columns: Sequence[str] | None = None,
    ) -> None:
        self.path = path
        self.delimiter = delimiter
        self.headers = headers
        self.quote_char = quote_char
        self.escape_char = escape_char
        self.sniff = sniff_extra_booleans
        self.columns = list(columns) if columns else None

    # builder parity (reference csv.rs builder surface)
    def with_delimiter(self, d: str) -> "CsvSource":
        self.delimiter = d
        return self

    def without_headers(self) -> "CsvSource":
        self.headers = False
        return self

    def with_quote_char(self, c: str) -> "CsvSource":
        self.quote_char = c
        return self

    def read(self):
        import ray.data

        parse = pacsv.ParseOptions(
            delimiter=self.delimiter,
            quote_char=self.quote_char,
            escape_char=self.escape_char or False,
        )
        read_opts = {}
        if not self.headers:
            # headerless → column_{i} names (reference csv.rs tests)
            path = self.path if isinstance(self.path, str) else self.path[0]
            with open(path, "rb") as f:
                first = f.readline().decode("utf-8", errors="replace")
            ncols = len(first.rstrip("\r\n").split(self.delimiter))
            names = [f"column_{i}" for i in range(ncols)]
            read_opts["read_options"] = pacsv.ReadOptions(column_names=names)
        convert = pacsv.ConvertOptions(
            null_values=["", "null", "NULL"], strings_can_be_null=True,
            include_columns=self.columns or None,
        )
        try:
            ds = ray.data.read_csv(
                self.path,
                parse_options=parse,
                convert_options=convert,
                **read_opts,
            )
        except Exception as e:
            raise ExtractError(f"csv read failed: {e}") from e
        if self.sniff:
            # dataset-GLOBAL upgrade decision: the old per-block sniff
            # could type the same column bool in one block and string
            # in another (a block whose values happen to all be in the
            # vocab), yielding conflicting block schemas. Phase 1 folds
            # one tiny verdict row per (column, block); a column
            # upgrades only if EVERY block agrees and it has ≥1
            # non-null value anywhere.
            # materialize once: the verdict pass consumes the whole
            # read, and without pinning the blocks the returned lazy
            # dataset would re-read and re-parse every CSV file on its
            # first real consumption (2x I/O for every sniffing load)
            ds = ds.materialize()
            agg: dict[str, tuple[bool, int]] = {}
            for b in ds.map_batches(_bool_verdicts, batch_format="pyarrow",
                                    zero_copy_batch=True) \
                    .iter_batches(batch_format="pyarrow"):
                for c, o, n in zip(b["col"].to_pylist(),
                                   b["ok"].to_pylist(),
                                   b["n"].to_pylist()):
                    prev_ok, prev_n = agg.get(c, (True, 0))
                    agg[c] = (prev_ok and o, prev_n + n)
            upgrade = tuple(c for c, (o, n) in agg.items() if o and n > 0)
            if upgrade:
                ds = ds.map_batches(
                    lambda t, _c=upgrade: _upgrade_bool_columns(t, _c),
                    batch_format="pyarrow", zero_copy_batch=True)
        return ds


class AsyncCsvSource(CsvSource):
    """API-parity alias (reference AsyncCsvExtractor,
    /root/reference/src/extract/csv.rs:156-212 — a cursor-based
    re-reading loop). Ray Data's streaming executor already reads CSV
    in incremental blocks with backpressure, so this is CsvSource."""
