"""Property-based tests: vectorized coercion kernels vs a direct
python model of the reference's as_* semantics
(/root/reference/src/types.rs:206-331). No Ray needed."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etlray import coerce


def model_as_integer(s: str) -> int | None:
    """Rust s.parse::<i64>() — optional sign + digits only, in range."""
    t = s.strip()
    body = t[1:] if t[:1] in "+-" else t
    if not body or not body.isascii() or not body.isdigit():
        return None
    try:
        v = int(t)
    except ValueError:
        return None
    return v if -(2 ** 63) <= v < 2 ** 63 else None


def model_as_boolean(s: str) -> bool | None:
    low = s.strip().lower()
    if low in ("true", "1", "yes", "y"):
        return True
    if low in ("false", "0", "no", "n"):
        return False
    return None


def model_as_date(s: str) -> dt.date | None:
    t = s.strip()
    for fmt in ("%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y"):
        try:
            d = dt.datetime.strptime(t, fmt)
            return d.date()
        except ValueError:
            continue
    # chrono/Arrow %Y accepts 1-3 digit years; python strptime doesn't
    parts = t.split("-")
    if len(parts) == 3 and all(p.isdigit() for p in parts) and len(parts[0]) < 4:
        try:
            return dt.date(int(parts[0]), int(parts[1]), int(parts[2]))
        except ValueError:
            return None
    return None


texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=24,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(texts, max_size=20))
def test_as_integer_matches_model(values):
    got = coerce.as_integer(pa.array(values, type=pa.string())).to_pylist()
    want = [model_as_integer(v) for v in values]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.lists(texts, max_size=20))
def test_as_boolean_matches_model(values):
    got = coerce.as_boolean(pa.array(values, type=pa.string())).to_pylist()
    want = [model_as_boolean(v) for v in values]
    assert got == want


date_like = st.one_of(
    texts,
    st.dates(min_value=dt.date(1000, 1, 1), max_value=dt.date(9999, 12, 31)).map(
        lambda d: d.strftime("%Y-%m-%d")),
    st.dates(min_value=dt.date(1000, 1, 1), max_value=dt.date(9999, 12, 31)).map(
        lambda d: d.strftime("%d/%m/%Y")),
    st.dates(min_value=dt.date(1000, 1, 1), max_value=dt.date(9999, 12, 31)).map(
        lambda d: d.strftime("%m/%d/%Y")),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(date_like, max_size=20))
def test_as_date_matches_model(values):
    got = coerce.as_date(pa.array(values, type=pa.string())).to_pylist()
    want = [model_as_date(v) for v in values]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(st.integers(min_value=-(2**62), max_value=2**62),
                          st.none()), max_size=20))
def test_int_float_roundtrip_never_raises(values):
    arr = pa.array(values, type=pa.int64())
    coerce.as_float(arr)
    coerce.as_string(arr)
    coerce.as_boolean(arr)
