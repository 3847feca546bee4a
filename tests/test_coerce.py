"""Coercion kernels vs the reference's as_* semantics
(/root/reference/src/types.rs:206-331). Pure-Arrow tests — no Ray."""

import datetime as dt

import pyarrow as pa
import pytest

from etlray import coerce


def test_as_integer_from_string():
    out = coerce.as_integer(pa.array(["42", "3.5", " 7 ", "abc", None, "-5"]))
    assert out.to_pylist() == [42, None, 7, None, None, -5]  # "3.5" fails i64 parse


def test_as_integer_truncates_floats():
    out = coerce.as_integer(pa.array([3.9, -3.9, float("nan"), None]))
    assert out.to_pylist() == [3, -3, None, None]


def test_as_integer_from_boolean_is_null():
    out = coerce.as_integer(pa.array([True, False]))
    assert out.to_pylist() == [None, None]


def test_as_float_from_string():
    out = coerce.as_float(pa.array(["3.5", "1e3", "x", None, "-2"]))
    assert out.to_pylist()[0] == 3.5
    assert out.to_pylist()[1] == 1000.0
    assert out.to_pylist()[2] is None
    assert out.to_pylist()[4] == -2.0


def test_as_boolean_vocab():
    out = coerce.as_boolean(pa.array(["YES", "n", "1", "maybe", "true", "0", None]))
    assert out.to_pylist() == [True, False, True, None, True, False, None]


def test_as_boolean_integers_and_floats():
    assert coerce.as_boolean(pa.array([0, 2, None])).to_pylist() == [False, True, None]
    # reference: Float → None
    assert coerce.as_boolean(pa.array([1.0, 0.0])).to_pylist() == [None, None]


def test_as_date_three_formats_in_order():
    out = coerce.as_date(pa.array(
        ["2024-07-13", "13/07/2024", "07/13/2024", "01/02/2024", "bad"]))
    assert out.to_pylist() == [
        dt.date(2024, 7, 13),
        dt.date(2024, 7, 13),
        dt.date(2024, 7, 13),   # dd/mm fails (month 13) → mm/dd
        dt.date(2024, 2, 1),    # ambiguous → day-first wins (types.rs:264-276)
        None,
    ]


def test_as_datetime_formats():
    out = coerce.as_datetime(pa.array(
        ["2024-07-13 14:30:00", "2024-07-13T14:30:00", "13/07/2024 14:30:00", "bad"]))
    want = dt.datetime(2024, 7, 13, 14, 30, 0)
    assert out.to_pylist() == [want, want, want, None]


def test_as_timestamp_rfc3339_and_bare_date():
    out = coerce.as_timestamp(pa.array(
        ["2024-07-13T14:30:00Z", "2024-07-13T14:30:00+02:00", "2024-07-13", "bad"]))
    vals = out.to_pylist()
    utc = dt.timezone.utc
    assert vals[0] == dt.datetime(2024, 7, 13, 14, 30, tzinfo=utc)
    assert vals[1] == dt.datetime(2024, 7, 13, 12, 30, tzinfo=utc)  # offset applied
    assert vals[2] == dt.datetime(2024, 7, 13, 0, 0, tzinfo=utc)    # midnight UTC
    assert vals[3] is None


def test_as_string_formats():
    assert coerce.as_string(pa.array([3.0, 3.5, None])).to_pylist() == ["3", "3.5", None]
    assert coerce.as_string(pa.array([True, False])).to_pylist() == ["true", "false"]
    d = coerce.as_string(pa.array([dt.date(2024, 7, 13)]))
    assert d.to_pylist() == ["2024-07-13"]


@pytest.mark.parametrize("kernel", list(coerce.KERNELS))
def test_kernels_never_raise_on_junk(kernel):
    junk = pa.array(["", "null", "🦀", "1/1/1", None, "999999999999999999999999"])
    coerce.KERNELS[kernel](junk)  # must not raise


def test_as_timestamp_fractional_seconds():
    # RFC3339 subsecond forms (reference parse_from_rfc3339 accepts them)
    out = coerce.as_timestamp(pa.array(
        ["2024-01-01T00:00:00.123Z", "2024-01-01 00:00:00.5+02:00",
         "2024-01-01T00:00:00.123456789Z", "2024-01-01T00:00:00Z", "bad"]))
    vals = out.to_pylist()
    utc = dt.timezone.utc
    assert vals[0] == dt.datetime(2024, 1, 1, 0, 0, 0, 123000, tzinfo=utc)
    assert vals[1] == dt.datetime(2023, 12, 31, 22, 0, 0, 500000, tzinfo=utc)
    assert vals[2] == dt.datetime(2024, 1, 1, 0, 0, 0, 123456, tzinfo=utc)
    assert vals[3] == dt.datetime(2024, 1, 1, tzinfo=utc)
    assert vals[4] is None


def test_as_datetime_tz_aware_preserves_instant():
    # tz-aware input → naive UTC instant (reference ts.naive_utc()):
    # 2024-01-01 12:00 America/New_York == 17:00 UTC
    arr = pa.array([dt.datetime(2024, 1, 1, 17, 0, tzinfo=dt.timezone.utc)],
                   type=pa.timestamp("us", tz="America/New_York"))
    out = coerce.as_datetime(arr)
    assert out.to_pylist() == [dt.datetime(2024, 1, 1, 17, 0)]


def test_as_datetime_fractional_seconds():
    out = coerce.as_datetime(pa.array(["2024-07-13 14:30:00.25", "bad"]))
    assert out.to_pylist() == [dt.datetime(2024, 7, 13, 14, 30, 0, 250000), None]
