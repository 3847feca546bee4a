"""Vectorized lenient type coercions — null-on-failure, never raising.

Re-implements the reference's ``DataValue::as_*`` suite
(/root/reference/src/types.rs:206-331) as Arrow-native kernels over
whole columns instead of per-value matches:

* ``as_integer``: int identity; float truncates toward zero; string
  parses only pure integers (Rust ``parse::<i64>()`` rejects "3.5").
* ``as_float``: float identity; int widens; string parses any f64
  (incl. "inf"/"nan"/exponent forms).
* ``as_boolean``: bool identity; string in {true,1,yes,y}/{false,0,no,n}
  case-insensitive; integer != 0. Floats do NOT coerce (reference
  returns None for Float).
* ``as_date``: tries "%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y" in that order
  (so "01/02/2024" is Feb 1 — day-first wins, types.rs:264-276).
* ``as_datetime``: "%Y-%m-%d %H:%M:%S", "%d/%m/%Y %H:%M:%S",
  "%Y-%m-%dT%H:%M:%S"; date → midnight (types.rs:279-298).
* ``as_timestamp``: RFC3339 (incl. "Z"/offsets), lenient UTC parse,
  bare date → midnight UTC (types.rs:301-325).

Every kernel maps unparseable / unsupported inputs to NULL — the
``ConvertTypesTransform`` contract (src/transform/common.rs:212-236:
``.unwrap_or(DataValue::Null)``).

All kernels take and return ``pa.ChunkedArray | pa.Array`` and are safe
to call inside ``map_batches(batch_format="pyarrow")`` hot loops.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_INT_RE = r"^\s*[+-]?[0-9]+\s*$"
_FLOAT_RE = (
    r"^\s*[+-]?("
    r"[0-9]+\.?[0-9]*([eE][+-]?[0-9]+)?"
    r"|\.[0-9]+([eE][+-]?[0-9]+)?"
    r"|[iI][nN][fF]([iI][nN][iI][tT][yY])?"
    r"|[nN][aA][nN]"
    r")\s*$"
)

_TRUE_SET = pa.array(["true", "1", "yes", "y"], type=pa.string())
_FALSE_SET = pa.array(["false", "0", "no", "n"], type=pa.string())


def _all_null(length: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(length, type=typ)


def _is_string(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _masked_cast(arr, mask, target: pa.DataType):
    """Cast only the values where ``mask`` is true; everything else null."""
    cleaned = pc.if_else(pc.fill_null(mask, False), arr, pa.scalar(None, type=arr.type))
    return pc.cast(cleaned, target, safe=False)


def _strip(arr):
    return pc.utf8_trim_whitespace(arr)


def as_integer(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    t = arr.type
    if pa.types.is_integer(t):
        return pc.cast(arr, pa.int64())
    if pa.types.is_floating(t):
        # Rust `f as i64` truncates toward zero; NaN/inf → null here.
        # Finite floats OUTSIDE int64's range also go null: an unsafe
        # cast would wrap 1e19 to i64::MIN, violating the module's
        # null-on-failure contract
        in_range = pc.and_(pc.greater_equal(arr, -(2.0 ** 63)),
                           pc.less(arr, 2.0 ** 63))
        ok = pc.and_(pc.and_(pc.is_finite(arr), pc.is_valid(arr)),
                     pc.fill_null(in_range, False))
        return _masked_cast(pc.trunc(arr), ok, pa.int64())
    if pa.types.is_boolean(t):
        return _all_null(len(arr), pa.int64())  # reference: Boolean → None
    if _is_string(t):
        s = _strip(arr)
        mask = pc.match_substring_regex(s, _INT_RE)
        # guard i64 overflow (Rust parse::<i64>() fails → null): strings
        # with ≤18 digits always fit; longer candidates are checked via a
        # float-range pre-filter then a per-value fallback (rare path)
        digits = pc.utf8_length(pc.replace_substring_regex(s, r"[+\-\s]", ""))
        small = pc.and_(pc.fill_null(mask, False), pc.less_equal(digits, 18))
        big = pc.and_(pc.fill_null(mask, False), pc.greater(digits, 18))
        out = _masked_cast(s, small, pa.int64())
        if pc.any(big).as_py():
            big_py = big.to_pylist()
            s_py = s.to_pylist()
            o_py = out.to_pylist()
            for i, isbig in enumerate(big_py):
                if isbig:
                    try:
                        v = int(s_py[i])
                        o_py[i] = v if -(2**63) <= v < 2**63 else None
                    except (ValueError, TypeError):
                        o_py[i] = None
            out = pa.array(o_py, type=pa.int64())
        return out
    return _all_null(len(arr), pa.int64())


def as_float(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    t = arr.type
    if pa.types.is_floating(t):
        return pc.cast(arr, pa.float64())
    if pa.types.is_integer(t):
        # safe=False: ints beyond 2^53 lose precision like Rust `i as f64`
        # (a safe cast would RAISE on them)
        return pc.cast(arr, pa.float64(), safe=False)
    if _is_string(t):
        s = _strip(arr)
        mask = pc.match_substring_regex(s, _FLOAT_RE)
        return _masked_cast(s, mask, pa.float64())
    return _all_null(len(arr), pa.float64())


def as_boolean(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    t = arr.type
    if pa.types.is_boolean(t):
        return arr
    if pa.types.is_integer(t):
        return pc.not_equal(arr, 0)
    if _is_string(t):
        low = pc.utf8_lower(_strip(arr))
        is_true = pc.is_in(low, value_set=_TRUE_SET)
        is_false = pc.is_in(low, value_set=_FALSE_SET)
        out = pc.if_else(is_true, pa.scalar(True), pa.scalar(None, type=pa.bool_()))
        return pc.if_else(is_false, pa.scalar(False), out)
    return _all_null(len(arr), pa.bool_())  # incl. Float → None (types.rs:243-254)


def _strptime_chain(arr, formats: list[str], unit: str = "us"):
    """Try each format in order; first success per value wins (null-on-fail)."""
    parsed = [pc.strptime(arr, format=f, unit=unit, error_is_null=True) for f in formats]
    out = parsed[0]
    for p in parsed[1:]:
        out = pc.coalesce(out, p)
    return out


_DATE_FORMATS = ["%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y"]
_DATETIME_FORMATS = ["%Y-%m-%d %H:%M:%S", "%d/%m/%Y %H:%M:%S", "%Y-%m-%dT%H:%M:%S"]


def as_date(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    t = arr.type
    if pa.types.is_date(t):
        return pc.cast(arr, pa.date32())
    if pa.types.is_timestamp(t):
        return pc.cast(arr, pa.date32(), safe=False)
    if _is_string(t):
        ts = _strptime_chain(_strip(arr), _DATE_FORMATS)
        return pc.cast(ts, pa.date32(), safe=False)
    return _all_null(len(arr), pa.date32())


def _split_fractional(s):
    """Vectorized split of a trailing ``.fff`` fractional-seconds part
    (pc.strptime has no %f): returns (string-without-fraction,
    duration[us] to add back, or 0 where absent)."""
    ext = pc.extract_regex(
        s, r"^(?P<base>[^.]*)\.(?P<frac>\d{1,9})(?P<tz>Z|[+-]\d{2}:?\d{2})?$")
    has = pc.is_valid(ext)
    base = pc.struct_field(ext, "base")
    frac = pc.struct_field(ext, "frac")
    tzs = pc.coalesce(pc.struct_field(ext, "tz"), pa.scalar(""))
    rebuilt = pc.binary_join_element_wise(base, tzs, "")
    stripped = pc.if_else(has, rebuilt, s)
    # pad right to ≥6 digits then truncate → microseconds
    padded = pc.utf8_slice_codeunits(
        pc.binary_join_element_wise(pc.coalesce(frac, pa.scalar("")), "000000", ""),
        0, 6)
    micros = pc.if_else(has, pc.cast(padded, pa.int64()), pa.scalar(0, pa.int64()))
    return stripped, pc.coalesce(micros, pa.scalar(0, pa.int64())).cast(pa.duration("us"))


def as_datetime(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Naive timestamp[us] (reference NaiveDateTime)."""
    t = arr.type
    target = pa.timestamp("us")
    if pa.types.is_timestamp(t):
        # tz-aware → naive UTC instant (reference ts.naive_utc()); Arrow's
        # aware→naive cast keeps the stored UTC epoch value, which is
        # exactly the naive-UTC wall clock (pc.local_timestamp would give
        # the SOURCE-zone wall clock instead — wrong per types.rs:255)
        return pc.cast(arr, target, safe=False)
    if pa.types.is_date(t):
        return pc.cast(arr, target)
    if _is_string(t):
        s, frac = _split_fractional(_strip(arr))
        out = _strptime_chain(s, _DATETIME_FORMATS)
        return pc.add(out, frac)
    return _all_null(len(arr), target)


def as_timestamp(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """UTC timestamp[us]. String parsing: RFC3339 with offset/Z, then the
    lenient whitespace form "%Y-%m-%d %H:%M:%S(%z)", then bare date →
    midnight UTC (types.rs:301-325)."""
    t = arr.type
    target = pa.timestamp("us", tz="UTC")
    if pa.types.is_timestamp(t):
        if t.tz is not None:
            return pc.cast(arr, target)
        return pc.assume_timezone(pc.cast(arr, pa.timestamp("us")), "UTC")
    if pa.types.is_date(t):
        return pc.assume_timezone(pc.cast(arr, pa.timestamp("us")), "UTC")
    if _is_string(t):
        # fractional seconds (RFC3339 subsecond forms, types.rs:301-325)
        # are split off vectorized and added back as duration[us]
        s, frac = _split_fractional(_strip(arr))
        naive = _strptime_chain(
            s,
            ["%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"],
        )
        naive_utc = pc.assume_timezone(naive, "UTC")
        # offset-aware forms (Z / +HH:MM); %z handles both in Arrow
        aware = _strptime_chain(s, ["%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%d %H:%M:%S%z"])
        aware_utc = pc.cast(aware, target, safe=False)
        return pc.add(pc.coalesce(aware_utc, naive_utc), frac)
    return _all_null(len(arr), target)


def as_string(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Reference as_string (types.rs:208-221): Date → %Y-%m-%d, DateTime →
    "%Y-%m-%d %H:%M:%S", Timestamp → "%Y-%m-%d %H:%M:%S UTC"; Null stays null."""
    t = arr.type
    if _is_string(t):
        return arr
    if pa.types.is_date(t):
        return pc.strftime(pc.cast(arr, pa.timestamp("us")), format="%Y-%m-%d")
    if pa.types.is_timestamp(t):
        if t.tz is not None:
            return pc.strftime(arr, format="%Y-%m-%d %H:%M:%S UTC")
        return pc.strftime(arr, format="%Y-%m-%d %H:%M:%S")
    if pa.types.is_boolean(t):
        return pc.if_else(arr, pa.scalar("true"), pa.scalar("false"))
    return pc.cast(arr, pa.string(), safe=False)


#: ConvertTypes target-name → kernel (reference DataType enum,
#: src/transform/common.rs:191-199)
KERNELS = {
    "string": as_string,
    "integer": as_integer,
    "float": as_float,
    "boolean": as_boolean,
    "date": as_date,
    "datetime": as_datetime,
    "timestamp": as_timestamp,
}
