"""Mixed-type total order parity with the reference DataValue Ord
(/root/reference/src/types.rs:88-156)."""

import datetime as dt

import pytest

from etlray.mixed import MixedSortTransform, mixed_sort_key, sniff_value


def _order(values):
    rank, num, strs = mixed_sort_key(values)
    keys = sorted(range(len(values)), key=lambda i: (rank[i], num[i], strs[i]))
    return [values[i] for i in keys]


def test_reference_rank_order():
    utc = dt.timezone.utc
    vals = [
        dt.datetime(2024, 1, 1, tzinfo=utc),   # Timestamp (last)
        dt.datetime(2024, 1, 1),               # DateTime
        dt.date(2024, 1, 1),                   # Date
        {"k": 1},                              # Object
        [1, 2],                                # Array
        "abc",                                 # String
        3.5,                                   # Float
        2,                                     # Integer
        True,                                  # Boolean
        None,                                  # Null (first)
    ]
    got = _order(vals)
    assert got[0] is None
    assert got[1] is True
    assert got[2:4] == [2, 3.5]                # numerics cross-compare
    assert got[4] == "abc"
    assert got[5] == [1, 2]
    assert got[6] == {"k": 1}
    assert got[7] == dt.date(2024, 1, 1)
    assert got[8] == dt.datetime(2024, 1, 1)
    assert got[9] == dt.datetime(2024, 1, 1, tzinfo=utc)


def test_int_float_numeric_interleave():
    assert _order([2.5, 1, 3, 0.5]) == [0.5, 1, 2.5, 3]
    assert _order([False, True, 0]) == [False, True, 0]  # bools before ints


def test_sniff_value_rules():
    assert sniff_value("true") is True and sniff_value("FALSE") is False
    assert sniff_value("42") == 42 and isinstance(sniff_value("42"), int)
    assert sniff_value("3.14") == 3.14
    assert sniff_value("2024-01-02") == dt.date(2024, 1, 2)
    assert sniff_value("2024-01-02 03:04:05") == dt.datetime(2024, 1, 2, 3, 4, 5)
    ts = sniff_value("2024-01-02T03:04:05Z")
    assert ts.tzinfo is not None
    assert sniff_value("hello") == "hello"
    assert sniff_value(None) is None


def test_mixed_sort_transform_sniffed_strings(ray_session):
    from etlray.sources import MemorySource

    rows = [{"v": s} for s in
            ["banana", "10", "true", "2", "2024-01-01", "apple", "2.5", None]]
    out = MixedSortTransform("v").apply(MemorySource(rows).read()).take_all()
    assert [r["v"] for r in out] == [
        None, "true", "2", "2.5", "10", "apple", "banana", "2024-01-01"]


def test_mixed_sort_typed_column_passthrough(ray_session):
    from etlray.sources import MemorySource

    rows = [{"v": x} for x in [3, 1, 2]]
    out = MixedSortTransform("v").apply(MemorySource(rows).read()).take_all()
    assert [r["v"] for r in out] == [1, 2, 3]


def test_typed_column_nulls_sort_first(ray_session):
    """Reference comparator: Null is the SMALLEST value — the typed
    fast path previously used Ray/pyarrow's at_end default, diverging
    from the string-encode path."""
    import ray.data

    from etlray.mixed import MixedSortTransform

    ds = ray.data.from_items([{"v": 3}, {"v": None}, {"v": 1}])
    asc = [r["v"] for r in MixedSortTransform("v").apply(ds).take_all()]
    assert asc == [None, 1, 3]
    desc = [r["v"] for r in MixedSortTransform("v", descending=True)
            .apply(ds).take_all()]
    assert desc == [3, 1, None]


def test_sniff_invalid_calendar_values_stay_string():
    from etlray.mixed import sniff_value

    assert sniff_value("2024-99-99") == "2024-99-99"
    assert sniff_value("2024-01-02T25:00:00Z") == "2024-01-02T25:00:00Z"
    import datetime as dt

    assert sniff_value("2024-01-02") == dt.date(2024, 1, 2)


def test_mixed_key_giant_int_no_crash():
    from etlray.mixed import mixed_sort_key

    rank, num, _ = mixed_sort_key([int("1" + "0" * 309),
                                   -int("1" + "0" * 309), 5])
    assert num[0] == float("inf") and num[1] == float("-inf")
    assert num[2] == 5.0


def test_typed_date_column_sorts_correctly(ray_session):
    """Regression: the null-filled shadow used a cast-from-0 filler
    that raised for date32 (and decimal/binary), silently degrading
    the whole sort to null-flag-only order."""
    import datetime as dt

    import ray.data

    from etlray.mixed import MixedSortTransform

    ds = ray.data.from_items([
        {"d": dt.date(2024, 3, 1)}, {"d": None},
        {"d": dt.date(2023, 1, 1)}, {"d": dt.date(2024, 1, 15)}])
    out = [r["d"] for r in MixedSortTransform("d").apply(ds).take_all()]
    assert out == [None, dt.date(2023, 1, 1), dt.date(2024, 1, 15),
                   dt.date(2024, 3, 1)]
