"""Property tests for the round-5 width operators (RangeWindowAgg,
GapFillAgg, ArgMinMax, ArrayAgg, NthValue): agree with a
single-process brute-force reference on randomized small inputs with
nullable values — same conventions as test_ops_properties."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlray.sources import MemorySource
from tests.test_ops_properties import keyed_rows

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

# integer-valued floats keep every sum exact — the properties test
# semantics (frames, nulls, grouping), not float association
_VALS = st.one_of(st.none(), st.integers(0, 100).map(float))


@given(rows=keyed_rows(values=_VALS))
@settings(**_SETTINGS)
def test_range_window_matches_bruteforce(ray_session, rows):
    from etlray.stages import RangeWindowAggTransform

    P = 7
    out = RangeWindowAggTransform("k", "t", "v", preceding=P).apply(
        MemorySource(rows).read()).take_all()
    got = {r["id"]: (r["range_sum"], r["range_count"]) for r in out}
    for me in rows:
        win = [r["v"] for r in rows
               if r["k"] == me["k"] and me["t"] - P <= r["t"] <= me["t"]
               and r["v"] is not None]
        want = (sum(win) if win else None, len(win))
        assert got[me["id"]] == want, (me, win)


@given(rows=keyed_rows(values=_VALS))
@settings(**_SETTINGS)
def test_gapfill_matches_bruteforce(ray_session, rows):
    from etlray.stages import GapFillAggTransform

    S = 5
    out = GapFillAggTransform("k", "t", stride=S, value_col="v").apply(
        MemorySource(rows).read()).take_all()
    got = {(r["k"], r["t_bucket"]): (r["n_rows"], r["v_sum"])
           for r in out}
    want = {}
    for k in {r["k"] for r in rows}:
        ts = [(r["t"] // S) * S for r in rows if r["k"] == k]
        for b in range(min(ts), max(ts) + S, S):
            inb = [r for r in rows
                   if r["k"] == k and (r["t"] // S) * S == b]
            vals = [r["v"] for r in inb if r["v"] is not None]
            want[(k, b)] = (len(inb), sum(vals) if vals else None)
    assert got == want


@given(rows=keyed_rows(values=_VALS))
@settings(**_SETTINGS)
def test_argmax_matches_bruteforce(ray_session, rows):
    from etlray.stages import ArgMinMaxTransform

    out = ArgMinMaxTransform("k", "v", tiebreak="id", mode="max").apply(
        MemorySource(rows).read()).take_all()
    got = {r["k"]: r["id"] for r in out}
    want = {}
    for r in sorted(rows, key=lambda r: (-(r["v"] if r["v"] is not None
                                           else 0), r["id"])):
        if r["v"] is None:
            continue
        want.setdefault(r["k"], r["id"])
    assert got == want


@given(rows=keyed_rows(values=_VALS))
@settings(**_SETTINGS)
def test_array_agg_matches_bruteforce(ray_session, rows):
    from etlray.stages import ArrayAggTransform

    out = ArrayAggTransform("k", "v", order_col="t",
                            tiebreak="id").apply(
        MemorySource(rows).read()).take_all()
    got = {r["k"]: r["v_list"] for r in out}
    want = {}
    for r in sorted(rows, key=lambda r: (r["t"], r["id"])):
        want.setdefault(r["k"], []).append(r["v"])
    assert got == want


@given(rows=keyed_rows(values=_VALS), n=st.sampled_from([1, 2, 3, -1]))
@settings(**_SETTINGS)
def test_nth_value_matches_bruteforce(ray_session, rows, n):
    from etlray.stages import NthValueTransform

    out = NthValueTransform("k", "t", "v", n=n, tiebreak="id",
                            out_col="nv").apply(
        MemorySource(rows).read()).take_all()
    got = {r["id"]: r["nv"] for r in out}
    parts = {}
    for r in sorted(rows, key=lambda r: (r["t"], r["id"])):
        parts.setdefault(r["k"], []).append(r)
    for k, part in parts.items():
        idx = n - 1 if n > 0 else len(part) + n
        want = part[idx]["v"] if 0 <= idx < len(part) and \
            (n < 0 or len(part) >= n) else None
        for r in part:
            assert got[r["id"]] == want, (k, n, part)
