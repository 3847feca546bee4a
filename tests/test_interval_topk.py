"""IntervalJoinTransform (range join) and TopKPerGroupTransform
(windowed rank) — custom operators Ray Data lacks; DuckDB range
predicates / window functions are the conformance oracle
(scripts/check_oracles.py)."""

import numpy as np
import pyarrow as pa
import pytest

from etlray.sources import MemorySource
from etlray.stages import IntervalJoinTransform, TopKPerGroupTransform


@pytest.fixture()
def sides():
    left = MemorySource([
        {"lid": 1, "k": "a", "t": 100},
        {"lid": 2, "k": "a", "t": 200},
        {"lid": 3, "k": "b", "t": 100},
        {"lid": 4, "k": "c", "t": 50},
    ]).read()
    right = MemorySource([
        {"rid": 10, "k": "a", "t": 95},    # in [90, 100] of lid 1
        {"rid": 11, "k": "a", "t": 100},   # inclusive upper of lid 1
        {"rid": 12, "k": "a", "t": 189},   # just below lid 2's window
        {"rid": 13, "k": "b", "t": 100},   # same key b, exact
        {"rid": 14, "k": "z", "t": 100},   # key never matches
    ]).read()
    return left, right


def test_interval_join_inclusive_bounds(sides, ray_session):
    left, right = sides
    out = IntervalJoinTransform(right, on="t", by="k",
                                lower=-10, upper=0).apply(left).take_all()
    got = {(r["lid"], r["rid"]) for r in out}
    assert got == {(1, 10), (1, 11), (3, 13)}
    # joined rows carry both sides' columns, right side suffixed
    row = next(r for r in out if r["rid"] == 10)
    assert row["t"] == 100 and row["t_r"] == 95 and row["k"] == "a"


def test_interval_join_empty_window(sides, ray_session):
    left, right = sides
    out = IntervalJoinTransform(right, on="t", by="k",
                                lower=1, upper=2).apply(left).take_all()
    assert out == []


def test_topk_per_group_with_ties(ray_session):
    rows = [{"g": "x", "v": 5.0, "id": 1}, {"g": "x", "v": 5.0, "id": 2},
            {"g": "x", "v": 4.0, "id": 3}, {"g": "x", "v": 9.0, "id": 4},
            {"g": "y", "v": 1.0, "id": 5}]
    ds = MemorySource(rows).read()
    out = TopKPerGroupTransform("g", [("v", True), ("id", False)], k=2) \
        .apply(ds).take_all()
    got = {(r["g"], r["id"]) for r in out}
    # x: 9.0 (id 4) then the 5.0 tie broken by min id (id 1); y: all of it
    assert got == {("x", 4), ("x", 1), ("y", 5)}


def test_topk_partial_prefilter_safe_across_blocks(ray_session):
    # the per-block partial keeps k rows per group per block; the final
    # reduce must still pick the global top-k across blocks
    import ray.data

    t1 = pa.table({"g": ["a"] * 4, "v": [1.0, 2.0, 3.0, 4.0],
                   "id": [1, 2, 3, 4]})
    t2 = pa.table({"g": ["a"] * 4, "v": [10.0, 20.0, 30.0, 40.0],
                   "id": [5, 6, 7, 8]})
    ds = ray.data.from_arrow(t1).union(ray.data.from_arrow(t2))
    out = TopKPerGroupTransform("g", [("v", True), ("id", False)], k=3) \
        .apply(ds).take_all()
    assert sorted(r["id"] for r in out) == [6, 7, 8]


def test_topk_null_group_key_kept(ray_session):
    rows = [{"g": None, "v": 2.0, "id": 1}, {"g": None, "v": 3.0, "id": 2},
            {"g": "a", "v": 1.0, "id": 3}]
    ds = MemorySource(rows).read()
    out = TopKPerGroupTransform("g", [("v", True), ("id", False)], k=1) \
        .apply(ds).take_all()
    got = {(r["g"], r["id"]) for r in out}
    assert got == {(None, 2), ("a", 3)}


def test_sessionize_gap_splits(ray_session):
    from etlray.stages import SessionizeTransform

    rows = [
        {"id": 1, "u": "a", "t": 0},
        {"id": 2, "u": "a", "t": 10},     # same session (gap 10 <= 15)
        {"id": 3, "u": "a", "t": 40},     # new session (30 > 15)
        {"id": 4, "u": "b", "t": 41},     # new key -> session 1
        {"id": 5, "u": "a", "t": 41},     # continues a's session 2
    ]
    ds = MemorySource(rows).read()
    out = SessionizeTransform("t", "u", gap=15, order_tiebreak="id") \
        .apply(ds).take_all()
    got = {r["id"]: r["session_idx"] for r in out}
    assert got == {1: 1, 2: 1, 3: 2, 5: 2, 4: 1}


def test_pivot_counts_and_sums(ray_session):
    from etlray.stages import PivotTransform

    rows = [
        {"u": "a", "k": "x", "v": 1.0}, {"u": "a", "k": "x", "v": 2.0},
        {"u": "a", "k": "y", "v": 5.0}, {"u": "b", "k": "y", "v": 7.0},
        {"u": "b", "k": "z", "v": 9.0},   # z not in values -> excluded
    ]
    ds = MemorySource(rows).read()
    out = PivotTransform("u", "k", values=["x", "y"]).apply(ds).take_all()
    got = {r["u"]: (r["x"], r["y"]) for r in out}
    assert got == {"a": (2, 1), "b": (0, 1)}

    ds = MemorySource(rows).read()
    out = PivotTransform("u", "k", values=["x", "y"], value_col="v",
                         agg="sum").apply(ds).take_all()
    got = {r["u"]: (r["x"], r["y"]) for r in out}
    assert got == {"a": (3.0, 5.0), "b": (0.0, 7.0)}


def test_group_concat_sorted_deterministic(ray_session):
    from etlray.stages import GroupConcatTransform

    rows = [{"g": "a", "v": "z"}, {"g": "a", "v": "m"}, {"g": "a", "v": "m"},
            {"g": "b", "v": "q"}, {"g": "b", "v": None}]
    ds = MemorySource(rows).read()
    out = GroupConcatTransform("g", "v").apply(ds).take_all()
    got = {r["g"]: r["v_concat"] for r in out}
    assert got == {"a": "m,m,z", "b": "q"}   # sorted, nulls skipped


def test_moving_average_window_and_key_reset(ray_session):
    from etlray.stages import MovingAverageTransform

    rows = [{"id": 1, "u": "a", "t": 1, "v": 2.0},
            {"id": 2, "u": "a", "t": 2, "v": 4.0},
            {"id": 3, "u": "a", "t": 3, "v": 6.0},
            {"id": 4, "u": "a", "t": 4, "v": 8.0},
            {"id": 5, "u": "b", "t": 5, "v": 100.0}]
    ds = MemorySource(rows).read()
    out = MovingAverageTransform("t", "u", "v", window=3,
                                 order_tiebreak="id").apply(ds).take_all()
    got = {r["id"]: r["v_mavg"] for r in out}
    assert got == {1: 2.0, 2: 3.0, 3: 4.0, 4: 6.0, 5: 100.0}


def test_sample_per_group_deterministic(ray_session):
    from etlray.functions.sampling import sample_per_group

    rows = [{"id": i, "g": "x" if i % 2 else "y"} for i in range(40)]
    a = sample_per_group(MemorySource(rows).read(), "g", "id", k=3,
                         salt="s").take_all()
    b = sample_per_group(MemorySource(rows).read(), "g", "id", k=3,
                         salt="s").take_all()
    sa = sorted((r["g"], r["id"]) for r in a)
    assert sa == sorted((r["g"], r["id"]) for r in b)
    assert len([1 for g, _ in sa if g == "x"]) == 3
    assert len([1 for g, _ in sa if g == "y"]) == 3


def test_interval_join_null_timestamps_never_match(ray_session):
    left = MemorySource([{"lid": 1, "k": "a", "t": 100},
                         {"lid": 2, "k": "a", "t": None}]).read()
    right = MemorySource([{"rid": 10, "k": "a", "t": 95},
                          {"rid": 11, "k": "a", "t": None}]).read()
    out = IntervalJoinTransform(right, on="t", by="k",
                                lower=-10, upper=0).apply(left).take_all()
    assert {(r["lid"], r["rid"]) for r in out} == {(1, 10)}


def test_moving_average_ignores_nulls(ray_session):
    # SQL avg() OVER window skips NULLs; a NULL value must not poison
    # every window that touches it, and an all-NULL window is NULL
    import pyarrow as pa
    import ray.data

    from etlray.stages import MovingAverageTransform

    t = pa.table({"ts": [1, 2, 3, 4, 5], "u": ["a"] * 5,
                  "v": [1.0, None, 3.0, None, None]})
    out = MovingAverageTransform("ts", "u", "v", window=2).apply(
        ray.data.from_arrow(t)).take_all()
    got = {r["ts"]: r["v_mavg"] for r in out}
    assert got == {1: 1.0, 2: 1.0, 3: 3.0, 4: 3.0, 5: None}


def test_window_lag_rank_and_gap(ray_session):
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from etlray.stages import WindowLagTransform

    def ts(s):
        return dt.datetime(2020, 1, 1, 0, 0, s)

    t = pa.table({"id": [1, 2, 3, 4],
                  "u": ["a", "a", "a", "b"],
                  "ts": [ts(1), ts(3), ts(3), ts(9)],
                  "v": [10.0, None, 30.0, 7.0]})
    out = WindowLagTransform("ts", "u", "v", order_tiebreak="id").apply(
        ray.data.from_arrow(t)).take_all()
    got = {r["id"]: (r["v_lag"], r["gap_us"], r["rn"]) for r in out}
    # key 'a': lag carries the raw previous value (None stays None),
    # equal timestamps break ties on id, gap in exact microseconds;
    # key 'b' restarts: lag/gap NULL, rn back to 1
    assert got == {1: (None, None, 1),
                   2: (10.0, 2_000_000, 2),
                   3: (None, 0, 3),
                   4: (None, None, 1)}


def test_window_lead(ray_session):
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from etlray.stages import WindowLagTransform

    def ts(s):
        return dt.datetime(2020, 1, 1, 0, 0, s)

    t = pa.table({"id": [1, 2, 3], "u": ["a", "a", "b"],
                  "ts": [ts(1), ts(2), ts(3)], "v": [10.0, 20.0, 5.0]})
    out = WindowLagTransform("ts", "u", "v", order_tiebreak="id",
                             with_lead=True).apply(
        ray.data.from_arrow(t)).take_all()
    got = {r["id"]: (r["v_lag"], r["v_lead"]) for r in out}
    assert got == {1: (None, 20.0), 2: (10.0, None), 3: (None, None)}


def test_asof_join_null_on_keys_dropped(ray_session):
    """NULL 'on' timestamps crash pd.merge_asof — the bucket kernel
    must drop them on both sides (SQL: NULL never satisfies asof)."""
    import ray.data

    from etlray.stages.joins import AsofJoinTransform

    left = ray.data.from_items([
        {"k": "a", "ts": 10, "lv": 1},
        {"k": "a", "ts": None, "lv": 2},
        {"k": "a", "ts": 30, "lv": 3},
    ])
    right = ray.data.from_items([
        {"k": "a", "ts": 5, "rv": 100},
        {"k": "a", "ts": None, "rv": 200},
    ])
    out = AsofJoinTransform(right, on="ts", by="k").apply(left).take_all()
    got = {r["lv"]: r.get("rv") for r in out}
    assert got == {1: 100, 3: 100}  # null-ts rows dropped, no crash


def test_window_lag_null_ts_gap_is_null(ray_session):
    """A NULL timestamp must yield NULL gap_us on itself and its
    successor — not INT64_MIN garbage (NaN cast into int64)."""
    import datetime as dt

    import ray.data

    from etlray.stages.common import WindowLagTransform

    ds = ray.data.from_items([
        {"u": 1, "ts": dt.datetime(2024, 1, 1, 0, 0, 1), "v": 1.0},
        {"u": 1, "ts": None, "v": 2.0},
        {"u": 1, "ts": dt.datetime(2024, 1, 1, 0, 0, 3), "v": 3.0},
    ])
    out = WindowLagTransform("ts", "u", "v", gap_col="gap_us") \
        .apply(ds).take_all()
    gaps = [r["gap_us"] for r in out]
    assert all(g is None or abs(g) < 10_000_000 for g in gaps)
    assert None in gaps


def test_group_concat_null_int_key_schema_stable(ray_session):
    """A NULL int64 group key must not flip that bucket's key column
    to double (pandas promotion) — blocks must keep one schema."""
    import ray.data

    from etlray.stages.common import GroupConcatTransform

    ds = ray.data.from_items(
        [{"g": 1, "v": "a"}, {"g": None, "v": "b"}, {"g": 2, "v": "c"}])
    out = GroupConcatTransform("g", "v")
    res = out.apply(ds)
    s = res.schema()
    types = dict(zip(s.names, s.types))
    import pyarrow as pa

    assert types["g"] == pa.int64()
    got = {r["g"]: r[[c for c in s.names if c != "g"][0]]
           for r in res.take_all()}
    assert got == {1: "a", None: "b", 2: "c"}


def test_pivot_keeps_null_group_key(ray_session):
    """pandas pivot_table silently drops NaN index keys; the transform
    must keep the NULL group (SQL GROUP BY semantics)."""
    import ray.data

    from etlray.stages.common import PivotTransform

    ds = ray.data.from_items([
        {"g": "x", "p": "a", "v": 1},
        {"g": None, "p": "a", "v": 2},
        {"g": None, "p": "b", "v": 3},
    ])
    out = PivotTransform(["g"], "p", values=["a", "b"], value_col="v",
                         agg="sum").apply(ds).take_all()
    got = {r["g"]: (r["a"], r["b"]) for r in out}
    assert got["x"] == (1, 0)
    assert got[None] == (2, 3)


def test_bloom_prefilter_allows_left_semi(ray_session):
    import ray.data

    from etlray.stages.joins import PartitionedHashJoinTransform

    right = ray.data.from_items([{"k": 1}, {"k": 2}])
    left = ray.data.from_items([{"k": 1, "v": "a"}, {"k": 9, "v": "b"}])
    out = PartitionedHashJoinTransform(right, on="k", how="left_semi",
                                       bloom_prefilter=True) \
        .apply(left).take_all()
    assert [r["v"] for r in out] == ["a"]


def test_pack_token_shards_null_tokens(ray_session):
    import ray.data

    from etlray.functions.sampling import pack_token_shards

    ds = ray.data.from_items([
        {"i": 0, "tok": 5}, {"i": 1, "tok": None}, {"i": 2, "tok": 7}])
    out = pack_token_shards(ds, "tok", budget=10).take_all()
    got = {r["i"]: r["shard_idx"] for r in out}
    assert got == {0: 0, 1: 0, 2: 0}  # null contributes nothing


def test_ntile_sql_bucket_sizes(ray_session):
    """SQL NTILE: first n mod k buckets get one extra row."""
    import ray.data

    from etlray.stages import NtileTransform

    rows = [{"g": "a", "v": i, "id": i} for i in range(7)]  # n=7, k=3
    out = NtileTransform("g", "v", 3, tiebreak="id") \
        .apply(ray.data.from_items(rows)).take_all()
    got = sorted((r["v"], r["ntile"]) for r in out)
    # sizes 3,2,2
    assert got == [(0, 1), (1, 1), (2, 1), (3, 2), (4, 2), (5, 3), (6, 3)]


def test_mode_tie_takes_smallest_value(ray_session):
    import ray.data

    from etlray.stages import ModePerGroupTransform

    ds = ray.data.from_items([
        {"g": "x", "v": 7}, {"g": "x", "v": 7},
        {"g": "x", "v": 3}, {"g": "x", "v": 3},
        {"g": "x", "v": 9}, {"g": "y", "v": None}, {"g": "y", "v": 1}])
    out = ModePerGroupTransform("g", "v").apply(ds).take_all()
    got = {r["g"]: r["v_mode"] for r in out}
    assert got == {"x": 3, "y": 1}  # tie 7 vs 3 → smallest; nulls skipped


def test_set_ops_distinct_semantics(ray_session):
    import ray.data

    from etlray.stages import SetOpTransform

    left = ray.data.from_items(
        [{"k": 1}, {"k": 1}, {"k": 2}, {"k": 3}])
    right = ray.data.from_items([{"k": 2}, {"k": 2}, {"k": 9}])
    exc = sorted(r["k"] for r in SetOpTransform(right, op="except")
                 .apply(left).take_all())
    assert exc == [1, 3]            # distinct + difference
    inter = sorted(r["k"] for r in SetOpTransform(right, op="intersect")
                   .apply(left).take_all())
    assert inter == [2]


def test_set_ops_null_rows_sql_semantics(ray_session):
    """SQL set ops compare NULLs as EQUAL (IS NOT DISTINCT FROM): a
    NULL row on both sides is dropped by EXCEPT and kept by INTERSECT.
    Round-4 ADVICE found the pre-fix behavior was exactly inverted
    (plain hash joins never match NULL keys). DuckDB confirms:
    ``SELECT 1 k UNION ALL SELECT NULL EXCEPT SELECT NULL`` → {1}."""
    import ray.data

    from etlray.stages import SetOpTransform

    left = ray.data.from_items(
        [{"k": 1, "s": "a"}, {"k": None, "s": "a"},
         {"k": None, "s": None}, {"k": 2, "s": None}])
    right = ray.data.from_items(
        [{"k": None, "s": "a"}, {"k": None, "s": "a"},
         {"k": 2, "s": None}, {"k": 9, "s": "z"}])

    def key(rows):
        return {(r["k"], r["s"]) for r in rows}

    exc = key(SetOpTransform(right, op="except").apply(left).take_all())
    assert exc == {(1, "a"), (None, None)}
    inter = key(SetOpTransform(right, op="intersect").apply(left).take_all())
    assert inter == {(2, None), (None, "a")}
    # NULL must still be distinguishable from the canonical fill value
    left2 = ray.data.from_items([{"k": 0}, {"k": None}])
    right2 = ray.data.from_items([{"k": 0}])
    exc2 = sorted((r["k"] is None) for r in
                  SetOpTransform(right2, op="except").apply(left2).take_all())
    assert exc2 == [True]  # only the NULL row survives; 0 matched 0


def test_running_agg_sum_min_max_count_null_semantics(ray_session):
    """Running aggregates: NULL-value rows carry the running value so
    far (SQL window semantics); leading nulls are NULL; count counts
    non-nulls including the current row."""
    import ray.data

    from etlray.stages import RunningAggTransform

    rows = [{"g": "a", "t": 1, "v": None},
            {"g": "a", "t": 2, "v": 5.0},
            {"g": "a", "t": 3, "v": None},
            {"g": "a", "t": 4, "v": 2.0},
            {"g": "b", "t": 1, "v": 7.0}]

    def run(agg):
        ds = ray.data.from_items(rows)
        out = RunningAggTransform("g", "t", "v", agg=agg,
                                  out_col="r").apply(ds).take_all()
        return {(r["g"], r["t"]): r["r"] for r in out}

    assert run("sum") == {("a", 1): None, ("a", 2): 5.0, ("a", 3): 5.0,
                          ("a", 4): 7.0, ("b", 1): 7.0}
    assert run("min") == {("a", 1): None, ("a", 2): 5.0, ("a", 3): 5.0,
                          ("a", 4): 2.0, ("b", 1): 7.0}
    assert run("max") == {("a", 1): None, ("a", 2): 5.0, ("a", 3): 5.0,
                          ("a", 4): 5.0, ("b", 1): 7.0}
    assert run("count") == {("a", 1): 0, ("a", 2): 1, ("a", 3): 1,
                            ("a", 4): 2, ("b", 1): 1}
    # avg: running sum / non-null count; empty window (leading null
    # prefix) -> NULL; a NULL row repeats the running mean so far
    assert run("avg") == {("a", 1): None, ("a", 2): 5.0, ("a", 3): 5.0,
                          ("a", 4): 3.5, ("b", 1): 7.0}


def test_running_agg_int64_with_nulls_stays_exact(ray_session):
    """An int64 value column containing nulls must NOT round through
    float64 (round-4 ADVICE): running sums above 2^53 stay bit-exact
    and NULL rows still carry the running-so-far value."""
    import ray.data

    from etlray.stages import RunningAggTransform

    big = 1 << 60
    rows = [{"g": "a", "t": 1, "v": big},
            {"g": "a", "t": 2, "v": None},
            {"g": "a", "t": 3, "v": 3},
            {"g": "a", "t": 4, "v": 1},
            {"g": "b", "t": 1, "v": None}]

    def run(agg):
        ds = ray.data.from_items(rows)
        out = RunningAggTransform("g", "t", "v", agg=agg,
                                  out_col="r").apply(ds).take_all()
        return {(r["g"], r["t"]): r["r"] for r in out}

    # float64 would collapse big+3 and big+4 onto the same value
    assert run("sum") == {("a", 1): big, ("a", 2): big, ("a", 3): big + 3,
                          ("a", 4): big + 4, ("b", 1): None}
    assert run("min") == {("a", 1): big, ("a", 2): big, ("a", 3): 3,
                          ("a", 4): 1, ("b", 1): None}
    # float64 can't distinguish big and big+1 → exactness check on max
    rows2 = [{"g": "a", "t": 1, "v": big + 1},
             {"g": "a", "t": 2, "v": None},
             {"g": "a", "t": 3, "v": big}]
    ds = ray.data.from_items(rows2)
    out = RunningAggTransform("g", "t", "v", agg="max",
                              out_col="r").apply(ds).take_all()
    got = {r["t"]: r["r"] for r in out}
    assert got == {1: big + 1, 2: big + 1, 3: big + 1}
    assert all(isinstance(v, int) for v in got.values())


def test_first_last_value_full_frame(ray_session):
    """FIRST_VALUE/LAST_VALUE over the full partition: NULLs are not
    skipped (no IGNORE NULLS), tie order pinned by the tiebreak, value
    type (string here) passes through the arrow take untouched."""
    import ray.data

    from etlray.stages import FirstLastValueTransform

    rows = [{"g": "a", "t": 2, "i": 1, "v": "mid"},
            {"g": "a", "t": 1, "i": 0, "v": None},    # first is NULL
            {"g": "a", "t": 3, "i": 2, "v": "end"},
            {"g": "b", "t": 5, "i": 0, "v": "only"},
            {"g": "c", "t": 1, "i": 0, "v": "x"},
            {"g": "c", "t": 1, "i": 1, "v": "y"}]     # tie on t
    out = FirstLastValueTransform("g", "t", "v", tiebreak="i") \
        .apply(ray.data.from_items(rows)).take_all()
    got = {(r["g"], r["t"], r["i"]): (r["first_value"], r["last_value"])
           for r in out}
    assert got[("a", 1, 0)] == (None, "end")
    assert got[("a", 2, 1)] == (None, "end")
    assert got[("b", 5, 0)] == ("only", "only")
    assert got[("c", 1, 0)] == ("x", "y")   # tiebreak pins x first
    assert got[("c", 1, 1)] == ("x", "y")


def test_rank_stats_percent_rank_cume_dist(ray_session):
    """percent_rank=(rank-1)/(n-1) with ties sharing the rank; a
    1-row partition is 0.0. cume_dist=(tie-run end)/n."""
    import ray.data

    from etlray.stages import RankStatsTransform

    rows = [{"g": "a", "v": 10.0}, {"g": "a", "v": 10.0},
            {"g": "a", "v": 20.0}, {"g": "a", "v": 30.0},
            {"g": "b", "v": 7.0}]
    out = RankStatsTransform("g", "v").apply(
        ray.data.from_items(rows)).take_all()
    a = sorted([(r["v"], r["percent_rank"], r["cume_dist"])
                for r in out if r["g"] == "a"])
    # n=4: ranks 1,1,3,4 -> pr 0, 0, 2/3, 1; cume 0.5, 0.5, 0.75, 1.0
    assert a == [(10.0, 0.0, 0.5), (10.0, 0.0, 0.5),
                 (20.0, 2 / 3, 0.75), (30.0, 1.0, 1.0)]
    b = [(r["percent_rank"], r["cume_dist"]) for r in out if r["g"] == "b"]
    assert b == [(0.0, 1.0)]


def test_running_distinct_count(ray_session):
    """Distinct-so-far per key: repeats don't increment, NULL values
    never count but their rows carry the count so far, keys isolate."""
    import ray.data

    from etlray.stages import RunningDistinctCountTransform

    rows = [{"g": "a", "t": 1, "v": "x"},
            {"g": "a", "t": 2, "v": "y"},
            {"g": "a", "t": 3, "v": "x"},
            {"g": "a", "t": 4, "v": None},
            {"g": "a", "t": 5, "v": "z"},
            {"g": "b", "t": 1, "v": "x"}]
    out = RunningDistinctCountTransform(
        "g", "t", "v", out_col="r").apply(
        ray.data.from_items(rows)).take_all()
    got = {(r["g"], r["t"]): r["r"] for r in out}
    assert got == {("a", 1): 1, ("a", 2): 2, ("a", 3): 2,
                   ("a", 4): 2, ("a", 5): 3, ("b", 1): 1}
