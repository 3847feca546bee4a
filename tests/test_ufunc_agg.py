"""UfuncAggTransform (bit_and/or/xor, product, bool_and/or): DuckDB
null semantics (NULLs ignored; empty/all-NULL group -> NULL) and
cross-block partial composition, vs a single-process brute force."""

import math
from functools import reduce

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlray.sources import MemorySource
from tests.test_ops_properties import keyed_rows

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

_INTS = st.one_of(st.none(), st.integers(0, 100))


def _fold(op, vals, none_ok=True):
    vals = [v for v in vals if v is not None]
    if not vals:
        return None
    return reduce(op, vals)


@given(rows=keyed_rows(values=_INTS))
@settings(**_SETTINGS)
def test_ufunc_agg_matches_bruteforce(ray_session, rows):
    from etlray.stages import UfuncAggTransform

    for r in rows:
        r["f"] = None if r["v"] is None else 1.0 + r["v"] / 100.0
        r["b"] = None if r["v"] is None else r["v"] > 25
    # force multiple blocks so the partial-combine path actually merges
    ds = MemorySource(rows).read().repartition(3)
    out = UfuncAggTransform(
        "k", [("v", "bit_and"), ("v", "bit_or"), ("v", "bit_xor"),
              ("f", "product"), ("b", "bool_and"), ("b", "bool_or")],
    ).apply(ds).take_all()
    got = {r["k"]: r for r in out}
    assert len(got) == len({r["k"] for r in rows})
    for k in got:
        sub = [r for r in rows if r["k"] == k]
        assert got[k]["v_bit_and"] == _fold(lambda a, b: a & b,
                                            [r["v"] for r in sub])
        assert got[k]["v_bit_or"] == _fold(lambda a, b: a | b,
                                           [r["v"] for r in sub])
        assert got[k]["v_bit_xor"] == _fold(lambda a, b: a ^ b,
                                            [r["v"] for r in sub])
        want_p = _fold(lambda a, b: a * b, [r["f"] for r in sub])
        if want_p is None:
            assert got[k]["f_product"] is None
        else:
            assert math.isclose(got[k]["f_product"], want_p,
                                rel_tol=1e-12)
        assert got[k]["b_bool_and"] == _fold(lambda a, b: a and b,
                                             [r["b"] for r in sub])
        assert got[k]["b_bool_or"] == _fold(lambda a, b: a or b,
                                            [r["b"] for r in sub])


def test_ufunc_agg_all_null_group_and_multikey(ray_session):
    from etlray.stages import UfuncAggTransform

    rows = [
        {"a": "x", "b": 1, "v": 6, "p": 2.0},
        {"a": "x", "b": 1, "v": 3, "p": None},
        {"a": "x", "b": 2, "v": None, "p": None},  # all-null group
        {"a": "y", "b": 1, "v": 5, "p": 0.5},
    ]
    out = UfuncAggTransform(
        ["a", "b"], [("v", "bit_and"), ("v", "bit_xor"),
                     ("p", "product")],
    ).apply(MemorySource(rows).read().repartition(2)).take_all()
    got = {(r["a"], r["b"]): r for r in out}
    assert got[("x", 1)]["v_bit_and"] == 6 & 3
    assert got[("x", 1)]["v_bit_xor"] == 6 ^ 3
    assert got[("x", 1)]["p_product"] == 2.0  # NULL ignored
    assert got[("x", 2)]["v_bit_and"] is None  # all-NULL -> NULL
    assert got[("x", 2)]["p_product"] is None
    assert got[("y", 1)]["p_product"] == 0.5


def test_ufunc_agg_rejects_unknown_fn(ray_session):
    from etlray.errors import TransformError
    from etlray.stages import UfuncAggTransform

    with pytest.raises(TransformError):
        UfuncAggTransform("k", [("v", "median")])


def test_ufunc_agg_null_group_key(ray_session):
    """NULL group keys form ONE group (SQL GROUP BY) on every
    platform: the dictionary-code path must sentinel null indices
    BEFORE the numpy int cast — NaN->int64 is platform-defined
    (INT64_MIN on x86, 0 on aarch64, where NULL rows would silently
    merge into the code-0 group)."""
    import warnings

    import pyarrow as pa

    from etlray.stages.aggregate import UfuncAggTransform

    t = pa.table({"g": ["a", None, "a", None], "v": [3, 5, 1, 6]})
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = UfuncAggTransform("g", [("v", "bit_or")]).apply(
            MemorySource(t).read())
        rows = {r["g"]: r["v_bit_or"] for r in out.take_all()}
    assert rows == {"a": 3, None: 7}


def test_ordered_product_bit_equal_and_nulls(ray_session):
    """OrderedProductTransform multiplies each group's values in
    ascending order, sequentially — bit-equal to an explicit left
    fold over the sorted values (the sequence DuckDB's
    ``product(v ORDER BY v)`` performs), NULL values skipped,
    many-block input order irrelevant."""
    import numpy as np
    import pyarrow as pa

    from etlray.stages import OrderedProductTransform

    rng = np.random.default_rng(11)
    n = 500
    g = rng.integers(0, 40, n)
    v = 1.0 - rng.integers(0, 11, n) / 100.0
    null = rng.random(n) < 0.1
    vals = [None if m else float(x) for x, m in zip(v, null)]
    t = pa.table({"g": g, "v": vals})
    # shuffle rows + split into blocks so exchange order != key order
    perm = rng.permutation(n)
    t = t.take(pa.array(perm))
    ds = MemorySource(t).read().repartition(7)
    out = OrderedProductTransform("g", "v", out_col="p").apply(ds)
    got = {r["g"]: r["p"] for r in out.take_all()}

    want = {}
    for gi, vi in zip(g, vals):
        if vi is not None:
            want.setdefault(int(gi), []).append(vi)
    for k, vs in want.items():
        acc = np.float64(1.0)
        for x in sorted(vs):
            acc = acc * np.float64(x)
        assert got[k] == acc, (k, got[k], acc)  # BIT equal, not isclose
    # all-NULL groups are dropped (documented), none here by chance?
    assert set(got) == set(want)


def test_ordered_product_null_key_and_all_null_group(ray_session):
    """NULL group keys form ONE group (SQL GROUP BY); a group whose
    values are ALL NULL is dropped (documented deviation from the
    NULL-emitting SQL aggregate — pair with WHERE v IS NOT NULL)."""
    import pyarrow as pa

    from etlray.stages import OrderedProductTransform

    t = pa.table({"g": ["a", None, "a", None, "b", "b"],
                  "v": [0.5, 0.25, 0.5, 0.5, None, None]})
    out = OrderedProductTransform("g", "v", out_col="p").apply(
        MemorySource(t).read().repartition(3))
    rows = sorted(out.take_all(),
                  key=lambda r: (r["g"] is None, str(r["g"])))
    assert rows == [{"g": "a", "p": 0.25}, {"g": None, "p": 0.125}]
