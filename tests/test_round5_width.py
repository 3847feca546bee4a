"""Edge-case tests for the round-5 continuation width queries.

The driver gate exercises these on the green-path testdata; the cases
here cover arms the testdata never reaches (NULL tier, rank ties,
all-scale MAD brute force, month boundaries) by pointing the SAME
registered ``queries()`` callables at a synthetic sf dir.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etlray.queries import ORACLES, QUERIES


def _mini_sf(tmp_path, events: pd.DataFrame | None = None,
             orders: pd.DataFrame | None = None) -> str:
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    if events is not None:
        pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                       f"{d}/events.parquet")
    if orders is not None:
        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                       f"{d}/orders.parquet")
    return d


def _oracle(sf: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders"):
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(ORACLES[name]).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable",
                          na_position="last").reset_index(drop=True)


def _run(sf: str, name: str) -> pd.DataFrame:
    out = QUERIES[name](sf)
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


def test_case_when_null_tier(tmp_path):
    """The 'none' arm: testdata value columns are never NULL, so the
    NULL tier (and its 0-contribution to the exact-cents sum) only
    runs here."""
    rng = np.random.default_rng(7)
    n = 500
    v = np.round(rng.uniform(0, 300, n), 2)
    v[rng.random(n) < 0.25] = np.nan
    ev = pd.DataFrame({"value": v})
    sf = _mini_sf(tmp_path, events=ev)
    mine = _canon(_run(sf, "case_when_value_tiers"))
    ref = _canon(_oracle(sf, "case_when_value_tiers"))
    assert set(mine["tier"]) >= {"none", "low"}
    pd.testing.assert_frame_equal(
        mine, ref.astype(mine.dtypes.to_dict()), check_dtype=False)


def test_rank_ties_keep_all_tied_rows(tmp_path):
    """Heavy ties: many rows share each value, so RANK<=3 keeps far
    more than 3 rows per key and the gaps matter."""
    rng = np.random.default_rng(11)
    n = 400
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b"], n),
        "value": rng.choice([1.0, 2.0, 3.0, 4.0], n),
        "ts": pd.Timestamp("2020-01-01"),
    })
    sf = _mini_sf(tmp_path, events=ev)
    mine = _canon(_run(sf, "rank_ties_topk_per_type"))
    ref = _canon(_oracle(sf, "rank_ties_topk_per_type"))
    assert len(mine) > 6  # ties actually exercised
    pd.testing.assert_frame_equal(
        mine, ref.astype(mine.dtypes.to_dict()), check_dtype=False)


def test_mad_matches_brute_force(tmp_path):
    """MAD vs a direct two-median numpy computation AND the DuckDB
    oracle on skewed random data with NULLs mixed in."""
    rng = np.random.default_rng(23)
    n = 3000
    types = rng.choice(["x", "y", "z"], n)
    v = np.round(rng.lognormal(3, 1.2, n), 2)
    v[rng.random(n) < 0.1] = np.nan
    # one group whose values are ALL NULL: SQL keeps the group with a
    # NULL mad (review finding — the quantile partial used to drop it)
    types = np.append(types, ["allnull"] * 20)
    v = np.append(v, [np.nan] * 20)
    ev = pd.DataFrame({"event_type": types, "value": v})
    sf = _mini_sf(tmp_path, events=ev)
    mine = _run(sf, "mad_value_by_type").set_index("event_type")[
        "value_mad"].sort_index()
    # brute force
    for t in "xyz":
        vals = v[(types == t) & ~np.isnan(v)]
        med = np.quantile(vals, 0.5, method="linear")
        expect = np.quantile(np.abs(vals - med), 0.5, method="linear")
        assert mine[t] == pytest.approx(expect, rel=1e-12)
    assert "allnull" in mine.index and np.isnan(mine["allnull"])
    ref = _oracle(sf, "mad_value_by_type").set_index("event_type")[
        "value_mad"].astype(float).sort_index()
    pd.testing.assert_series_equal(mine, ref, rtol=1e-9,
                                   check_names=False)


def test_month_floor_boundaries(tmp_path):
    """Rows exactly at month boundaries (first microsecond of a month,
    last microsecond of the prior one) land in the right bucket."""
    rows = []
    base = 1000.00
    for i, ts in enumerate([
            datetime.datetime(1995, 1, 1, 0, 0, 0, 0),
            datetime.datetime(1995, 1, 31, 23, 59, 59, 999999),
            datetime.datetime(1995, 2, 1, 0, 0, 0, 0),
            datetime.datetime(1996, 12, 31, 23, 59, 59, 999999),
            datetime.datetime(1997, 1, 1, 0, 0, 0, 1)]):
        rows.append({"o_orderkey": i, "o_custkey": 1,
                     "o_orderstatus": "O",
                     "o_totalprice": base + i,
                     "o_orderdate": ts, "o_orderpriority": "1-URGENT"})
    sf = _mini_sf(tmp_path, orders=pd.DataFrame(rows))
    mine = _canon(_run(sf, "monthly_order_totals"))
    ref = _canon(_oracle(sf, "monthly_order_totals"))
    assert len(mine) == 4  # Jan-95 holds two rows, three other months
    pd.testing.assert_frame_equal(
        mine, ref.astype(mine.dtypes.to_dict()), check_dtype=False)


def test_weighted_avg_exact_int_large_weights(tmp_path):
    """Weighted average equals arbitrary-precision integer math when
    the per-flag numerator exceeds 2^53 (quantities up to 1e12):
    the int64 partial sums are exact at any block combine order, so
    the quotient is bit-equal to python-int num/den. Honest scope
    note: a float64-partials regression would drift these sums by a
    few ulps (the premise assertion below shows the sums are NOT
    float64-representable) but pairwise summation can keep the final
    QUOTIENT identical — the binding guard against such a regression
    is the DuckDB integer-SQL oracle equality, this test pins the
    exact-int contract and the overflow headroom."""
    rng = np.random.default_rng(5)
    n = 20000
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    li = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_quantity": rng.integers(1, 10**12, n).astype(float),
        "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
    })
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   f"{d}/lineitem.parquet")
    mine = _run(d, "weighted_avg_discount_by_flag").set_index(
        "l_returnflag")["wavg_disc_h"].sort_index()
    float_sum_diverges = False
    for f in "ANR":
        sub = li[li.l_returnflag == f]
        prod = (sub.l_quantity.astype(np.int64)
                * np.round(sub.l_discount * 100).astype(np.int64))
        num, den = int(prod.sum()), int(sub.l_quantity.astype(np.int64).sum())
        if int(prod.astype(np.float64).sum()) != num:
            float_sum_diverges = True
        assert mine[f] == pytest.approx(num / den, rel=0, abs=0)
    # the test's premise: these sums are NOT float64-representable, so
    # a regression to float partials would have failed the compare
    assert float_sum_diverges


def test_key_change_mask_exact_int_keys_past_2_53(ray_session):
    """Window-family group keys stay exact when an int64 key column
    contains NULLs: the old numpy conversion went through float64
    (nulls→NaN), where adjacent distinct keys past 2^53 compare EQUAL
    (ulp at 2^60 is 256) and whole groups silently merged. The mask
    helpers now take Arrow columns. Exercises one representative of
    each mask family: rank (kc), running distinct (kc + value dedup)."""
    import ray.data

    from etlray.stages.common import (RunningDistinctCountTransform,
                                      key_change_mask)

    big = 2 ** 60
    keys = pa.array([big, big, big + 1, None, None], pa.int64())
    # direct helper contract: 3 groups (big, big+1, null-run)
    mask = key_change_mask([keys], 5)
    assert mask.tolist() == [True, False, True, True, False]
    # float64 path would have merged big and big+1:
    assert float(big) == float(big + 1)

    # end-to-end through a transform: distinct-so-far per key, where
    # the VALUES also differ only past the float ulp
    t = pa.table({
        "k": pa.array([big, big, big, big + 1, big + 1], pa.int64()),
        "ts": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "v": pa.array([big, big + 1, None, big, big], pa.int64()),
    })
    out = RunningDistinctCountTransform(
        "k", "ts", "v", out_col="nd").apply(
        ray.data.from_arrow(t)).take_all()
    got = {(r["k"], r["ts"]): r["nd"] for r in out}
    # k=big sees big then big+1 (DISTINCT → 2), then NULL (carries 2);
    # k=big+1 is its own group restarting at 1
    assert got == {(big, 1): 1, (big, 2): 2, (big, 3): 2,
                   (big + 1, 1): 1, (big + 1, 2): 1}
