"""NthValueTransform (full-frame NTH_VALUE incl. the negative
from-the-end extension) and ArgMinMaxTransform (deterministic
max_by/min_by with partial-combine) — hand-computed references on
small inputs; the DuckDB nth_value / QUALIFY row_number oracles gate
the same operators at scale (scripts/check_oracles.py)."""

import pyarrow as pa
import pytest

from etlray.sources import MemorySource
from etlray.stages import ArgMinMaxTransform, NthValueTransform


def _tbl():
    # key a: 3 rows (one NULL value in nth position), key b: 1 row,
    # key c: 2 rows with tied order values (tiebreak decides)
    return pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "k": ["a", "a", "a", "b", "c", "c"],
        "t": [10, 20, 30, 10, 10, 10],
        "v": [5.0, None, 9.0, 7.0, 2.0, 8.0],
    })


def test_nth_value_second_and_short_partitions(ray_session):
    out = NthValueTransform("k", "t", "v", n=2, tiebreak="id",
                            out_col="nv").apply(
        MemorySource(_tbl()).read()).take_all()
    by_id = {r["id"]: r["nv"] for r in out}
    # a's 2nd ordered value is the NULL row (not skipped)
    assert by_id[1] is None and by_id[2] is None and by_id[3] is None
    # b has 1 row -> partition shorter than n -> NULL
    assert by_id[4] is None
    # c ties on t; tiebreak id asc -> 2nd is id=6
    assert by_id[5] == 8.0 and by_id[6] == 8.0


def test_nth_value_negative_counts_from_end(ray_session):
    out = NthValueTransform("k", "t", "v", n=-1, tiebreak="id",
                            out_col="nv").apply(
        MemorySource(_tbl()).read()).take_all()
    by_id = {r["id"]: r["nv"] for r in out}
    assert by_id[1] == 9.0 and by_id[4] == 7.0 and by_id[5] == 8.0
    out = NthValueTransform("k", "t", "v", n=-3, tiebreak="id",
                            out_col="nv").apply(
        MemorySource(_tbl()).read()).take_all()
    by_id = {r["id"]: r["nv"] for r in out}
    assert by_id[1] == 5.0        # 3rd from the end of a 3-row key
    assert by_id[4] is None and by_id[5] is None   # too short


def test_nth_value_rejects_zero():
    from etlray.errors import TransformError

    with pytest.raises(TransformError):
        NthValueTransform("k", "t", "v", n=0)


def test_argmax_ties_nulls_and_absent_groups(ray_session):
    t = pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "k": ["a", "a", "a", "b", "b", "c"],
        "v": [9.0, 9.0, 1.0, None, 4.0, None],
        "tag": ["x", "y", "z", "p", "q", "r"],
    })
    rows = {r["k"]: r for r in ArgMinMaxTransform(
        "k", "v", tiebreak="id", mode="max").apply(
        MemorySource(t).read()).take_all()}
    # tie on v=9.0 -> smallest id wins deterministically
    assert rows["a"]["id"] == 1 and rows["a"]["tag"] == "x"
    # NULL order value never wins
    assert rows["b"]["id"] == 5
    # all-NULL group is absent (QUALIFY semantics, documented)
    assert "c" not in rows and len(rows) == 2


def test_argmin_partial_combine_across_blocks(ray_session):
    # force many small blocks so the per-batch partial and the bucket
    # reduce BOTH run; global min must survive block-local selection
    import numpy as np

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 23, n),
        "v": rng.normal(size=n),
    })
    ds = MemorySource(t).read().repartition(16)
    got = {r["k"]: (r["id"], r["v"]) for r in ArgMinMaxTransform(
        "k", "v", tiebreak="id", mode="min").apply(ds).take_all()}
    import pandas as pd

    df = t.to_pandas()
    exp = df.sort_values(["v", "id"]).groupby("k").head(1)
    assert len(got) == 23
    for _, row in exp.iterrows():
        assert got[row["k"]] == (row["id"], row["v"])
