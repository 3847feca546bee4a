"""Mixed-type total ordering — the reference's ``DataValue`` Ord
(/root/reference/src/types.rs:88-156): Null < Boolean < numeric
(Integer and Float compare numerically ACROSS the two types) < String
< Array < Object < Date < DateTime < Timestamp.

Arrow keeps columns typed, so a "mixed" column reaches this engine in
one of two forms: a STRING column holding sniffable scalar spellings
(the reference's CSV cell-sniffing story) or driver-side Python values
(MemorySource rows). Both encode to a deterministic 3-part sort key
``(rank:int8, num:float64, str:string)`` that Ray's native multi-column
sort orders exactly like the reference's comparator.

Documented deviation: the reference compares Arrays element-wise and
Objects by ordered key set then values; here both encode as canonical
JSON (sorted keys) in the ``str`` part — equal structures compare
equal either way, but the relative order of two UNEQUAL containers can
differ (lexicographic JSON vs element-wise). No reference pipeline
sorts containers.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import re
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from etlray.stages.common import Transform

R_NULL, R_BOOL, R_NUM, R_STR, R_ARR, R_OBJ, R_DATE, R_DT, R_TS = range(9)

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_DT_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}$")
_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(Z|[+-]\d{2}:?\d{2})$")


def sniff_value(s):
    """Parse a string cell to the narrowest reference type (the CSV
    cell-sniffing rules): bool vocab → int → float → date →
    datetime → timestamp → string."""
    if s is None:
        return None
    t = s.strip()
    low = t.lower()
    if low in ("true", "false"):
        return low == "true"
    if _INT_RE.match(t):
        try:
            return int(t)
        except ValueError:
            return t
    if _FLOAT_RE.match(t):
        return float(t)
    # regex shape-matches can still be invalid calendar values
    # ('2024-99-99', '...T25:00:00Z') — fall back to string instead of
    # crashing the sort pipeline with an unguarded ValueError
    if _DATE_RE.match(t):
        try:
            return _dt.date.fromisoformat(t)
        except ValueError:
            return t
    if _TS_RE.match(t):
        try:
            return _dt.datetime.fromisoformat(t.replace("Z", "+00:00"))
        except ValueError:
            return t
    if _DT_RE.match(t):
        try:
            return _dt.datetime.fromisoformat(t.replace(" ", "T"))
        except ValueError:
            return t
    return s


def mixed_sort_key(values: Sequence):
    """Encode arbitrary Python scalars to parallel (rank, num, str)
    arrays whose lexicographic order equals the reference comparator."""
    n = len(values)
    rank = np.zeros(n, dtype=np.int8)
    num = np.zeros(n, dtype=np.float64)
    strs = [""] * n
    for i, v in enumerate(values):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            rank[i] = R_NULL
        elif isinstance(v, bool):
            rank[i], num[i] = R_BOOL, float(v)
        elif isinstance(v, (int, float, np.integer, np.floating)):
            rank[i] = R_NUM
            try:
                num[i] = float(v)
            except OverflowError:
                # a 300+-digit sniffed int: order at the numeric
                # extreme instead of crashing. (Known limit, documented:
                # distinct ints above 2^53 collapse to equal float keys
                # and keep arbitrary relative order.)
                num[i] = math.inf if v > 0 else -math.inf
        elif isinstance(v, str):
            rank[i], strs[i] = R_STR, v
        elif isinstance(v, (list, tuple, np.ndarray)):
            rank[i] = R_ARR
            strs[i] = json.dumps(list(v), sort_keys=True, default=str)
        elif isinstance(v, dict):
            rank[i] = R_OBJ
            strs[i] = json.dumps(v, sort_keys=True, default=str)
        elif isinstance(v, _dt.datetime):  # check before date (subclass)
            if v.tzinfo is not None:
                rank[i] = R_TS
                num[i] = v.timestamp()
            else:
                rank[i] = R_DT
                num[i] = v.replace(tzinfo=_dt.timezone.utc).timestamp()
        elif isinstance(v, _dt.date):
            rank[i] = R_DATE
            num[i] = _dt.datetime(v.year, v.month, v.day,
                                  tzinfo=_dt.timezone.utc).timestamp()
        else:
            rank[i], strs[i] = R_STR, str(v)
    return rank, num, strs


class MixedSortTransform(Transform):
    """Sort by a column under the reference's mixed-type total order.

    ``sniff=True`` first parses string cells with ``sniff_value`` (the
    CSV-sniffing story: "10" sorts as the number 10, "true" as a bool).
    Typed non-string columns order identically to a plain sort and pass
    through Ray's native path untouched."""

    _K = ("__mx_rank", "__mx_num", "__mx_str")

    def __init__(self, col: str, descending: bool = False,
                 sniff: bool = True) -> None:
        self.col = col
        self.descending = descending
        self.sniff = sniff

    def apply(self, ds):
        col, do_sniff = self.col, self.sniff
        names = ds.schema().names
        types = dict(zip(names, ds.schema().types))
        if not (pa.types.is_string(types[col]) or pa.types.is_large_string(types[col])):
            # reference comparator: Null is the SMALLEST value, but
            # Ray/pyarrow sort places nulls at_end — sort on an
            # explicit null flag first so typed columns order
            # identically to the string-encode path (R_NULL first
            # ascending, last descending)
            flag = "__mx_isnull"
            shadow = "__mx_sortval"
            # DECLARED type from the driver-unified schema: an all-null
            # BLOCK reports its local column type as null, and emitting
            # an int8 shadow there while value blocks emit date32 makes
            # the union unmergeable
            declared = types[col]

            def add_flag(t: pa.Table) -> pa.Table:
                f = pc.is_null(t[col])
                if isinstance(f, pa.ChunkedArray):
                    f = f.combine_chunks()
                t = t.append_column(flag, f)
                # Ray's sort boundary sampling can't compare None
                # against values — sort on a null-FILLED shadow. The
                # filler is the BATCH's own min (works for every
                # orderable type incl. date32/decimal/binary, where a
                # cast-from-0 filler raised and silently degraded the
                # sort to null-flag-only): fill_null only changes null
                # rows, and those are already fully separated by the
                # flag column, so the filler's value never matters.
                sv = None
                try:
                    col_arr = t[col]
                    if pa.types.is_null(col_arr.type) \
                            and not pa.types.is_null(declared):
                        # all-null BLOCK of a typed column: rebuild it
                        # under the declared type so this block's
                        # shadow matches the value blocks'
                        col_arr = pa.nulls(t.num_rows, type=declared)
                    filler = pc.min(col_arr)
                    if not filler.is_valid:
                        # all-null BATCH: construct a typed zero
                        # directly (works for date32/decimal/binary
                        # where a cast-from-int raised)
                        if pa.types.is_binary(declared) \
                                or pa.types.is_large_binary(declared):
                            filler = pa.scalar(b"", type=declared)
                        elif pa.types.is_boolean(declared):
                            filler = pa.scalar(False, type=declared)
                        else:
                            filler = pa.scalar(0, type=declared)
                    sv = pc.fill_null(col_arr, filler)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                        pa.ArrowTypeError, OverflowError):
                    sv = None
                if sv is None:
                    # null-typed / non-orderable column (every batch
                    # lands here identically — `declared` is the
                    # unified type, so the check is block-independent):
                    # constant shadow, the flag carries the ordering
                    sv = pa.array([0] * t.num_rows, type=pa.int8())
                if isinstance(sv, pa.ChunkedArray):
                    sv = sv.combine_chunks()
                return t.append_column(shadow, sv)

            out = ds.map_batches(add_flag, **self._mb_kwargs()) \
                .sort([flag, shadow], descending=[not self.descending,
                                                  self.descending])
            return out.map_batches(
                lambda t: t.drop_columns([flag, shadow]),
                **self._mb_kwargs())
        kr, kn, ks = self._K

        def encode(t: pa.Table) -> pa.Table:
            vals = t[col].to_pylist()
            if do_sniff:
                vals = [sniff_value(v) for v in vals]
            rank, num, strs = mixed_sort_key(vals)
            t = t.append_column(kr, pa.array(rank, type=pa.int8()))
            t = t.append_column(kn, pa.array(num, type=pa.float64()))
            return t.append_column(ks, pa.array(strs, type=pa.string()))

        out = ds.map_batches(encode, **self._mb_kwargs())
        out = out.sort([kr, kn, ks], descending=self.descending)
        return out.drop_columns(list(self._K))
