"""CDC replay correctness (FIXTURES.md §3.3; BASELINE.json invariant:
per-row sha256(content) equality vs the oracle-replayed final state).

Scenarios:
1. full replay → final table == oracle
2. prefix replay → checkpoint → resume rest → identical final table
3. duplicate delivery of a committed epoch → no-op (exactly-once)
4. schema-evolution epochs → unified schema, old rows null-backfilled,
   widened types
5. lineage/watermarks recorded per bucket
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etlray.cdc.engine import CDCEngine
from etlray.cdc.fixture import RENAME_MAP, generate_fixture, oracle_apply

N_EVENTS = 3000


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc_fixture")
    fx = generate_fixture(str(d), n_events=N_EVENTS, n_keys=600, n_base=300, seed=42)
    return fx


def _final_state(engine: CDCEngine) -> dict[tuple[str, str], dict]:
    ds = engine.read_snapshot()
    table = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    out = {}
    for r in table.to_pylist():
        out[(r["repo"], r["path"])] = r
    assert len(out) == table.num_rows, "duplicate keys in final table!"
    return out


def _assert_matches_oracle(state: dict, oracle: dict) -> None:
    assert set(state.keys()) == set(oracle.keys())
    for k, orow in oracle.items():
        row = state[k]
        assert row["content_sha"] == orow["content_sha"], f"sha mismatch at {k}"
        assert row["lsn"] == orow["lsn"], f"lsn mismatch at {k}"
        assert row.get("language") == orow["language"], f"language mismatch at {k}"
        assert row.get("size") == orow["size"], f"size mismatch at {k}"


def test_full_replay_matches_oracle(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8, rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        res = eng.apply_log(p, epoch_id=i)
        assert res["committed"]
    oracle = oracle_apply(fixture_dir["base"], fixture_dir["epochs"])
    _assert_matches_oracle(_final_state(eng), oracle)


def test_prefix_then_resume_identical(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8, rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    # apply only epoch 0, simulate restart with a NEW engine object
    eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)
    eng2 = CDCEngine(str(tmp_path / "table"), num_buckets=8, rename_map=RENAME_MAP)
    for i, p in enumerate(fixture_dir["epochs"][1:], start=1):
        eng2.apply_log(p, epoch_id=i)
    oracle = oracle_apply(fixture_dir["base"], fixture_dir["epochs"])
    _assert_matches_oracle(_final_state(eng2), oracle)


def test_duplicate_epoch_is_noop(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8, rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    r1 = eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)
    assert r1["committed"]
    r2 = eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)  # duplicate delivery
    assert not r2["committed"]
    # and re-delivering the same EVENTS under a new epoch id is also a
    # no-op thanks to watermarks: final table unchanged
    before = _final_state(eng)
    r3 = eng.apply_log(fixture_dir["epochs"][0], epoch_id="dup-again")
    assert r3["committed"]  # commits an epoch, but applies nothing new
    after = _final_state(eng)
    assert {k: v["content_sha"] for k, v in before.items()} == \
           {k: v["content_sha"] for k, v in after.items()}


def test_schema_evolution(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8, rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        eng.apply_log(p, epoch_id=i)
    ds = eng.read_snapshot()
    schema = {n: str(t) for n, t in zip(ds.schema().names, ds.schema().types)}
    assert "language" in schema and "lang" not in schema   # rename applied
    assert schema["size"] == "int64"                        # widened int32→int64
    # rows surviving from epoch-0 events (no size column then) are null-backfilled
    state = _final_state(eng)
    epoch0_rows = [r for r in state.values()
                   if 0 < r["lsn"] <= N_EVENTS // 3]
    assert epoch0_rows and all(r["size"] is None for r in epoch0_rows)


def test_lineage_and_watermarks(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8, rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)
    cur = eng.manifest.current_epoch()
    assert cur["id"] == 0
    assert cur["watermarks"], "per-bucket watermarks missing"
    assert all(int(v) >= 0 for v in cur["watermarks"].values())
    lin = cur["lineage"]
    assert lin and all("rows" in v and "applied_events" in v for v in lin.values())
    assert os.path.exists(os.path.join(str(tmp_path / "table"), "_lineage.jsonl"))


def test_hot_key_skew_correct_and_bounded(tmp_path, ray_session):
    """Extreme Zipf skew (a=1.1): the per-block LWW combiner must
    collapse hot-key event floods before the exchange, and the final
    table must still match the oracle."""
    d = tmp_path / "fx"
    fx = generate_fixture(str(d), n_events=4000, n_keys=200, n_base=100,
                          seed=7, zipf_a=1.1)
    eng = CDCEngine(str(tmp_path / "t"), num_buckets=8, rename_map=RENAME_MAP)
    import ray.data

    eng.bootstrap(ray.data.read_parquet(fx["base"]))
    eng.apply_log(list(fx["epochs"]), epoch_id="all")
    oracle = oracle_apply(fx["base"], fx["epochs"])
    _assert_matches_oracle(_final_state(eng), oracle)
    # bucket ROW counts stay bounded: buckets hold keys, not event volume
    lin = eng.manifest.lineage()
    rows = [v["rows"] for v in lin.values() if v["rows"] > 0]
    assert max(rows) <= 10 * max(1, min(rows) or 1) or len(rows) > 1


# ---------------------------------------------------------------------------
# payload-pruned exchange (SURVEY §7.3 / round-3 VERDICT #2)
# ---------------------------------------------------------------------------
def _assert_contents_exact(state: dict, oracle: dict) -> None:
    from etlray.cdc.fixture import sha256_hex

    for k, orow in oracle.items():
        row = state[k]
        assert row["content"] == orow["content"], f"content mismatch at {k}"
        if row["content"] is not None:
            assert sha256_hex(row["content"]) == row["content_sha"]


def test_full_replay_payload_pruned(fixture_dir, tmp_path, ray_session):
    """prune_payload=True ships (keys, lsn, op, 12 B locator) through
    the exchange — never the content, and (since the map side no longer
    even decodes the payload column) content_sha crosses as a null
    placeholder too. The bucket writer late-materializes winners from
    the source epoch files and hashes ONLY them. The final state must
    be byte-identical, content and content_sha columns included."""
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8,
                    rename_map=RENAME_MAP, prune_payload=True)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        assert eng.apply_log(p, epoch_id=i)["committed"]
    oracle = oracle_apply(fixture_dir["base"], fixture_dir["epochs"])
    state = _final_state(eng)
    _assert_matches_oracle(state, oracle)
    _assert_contents_exact(state, oracle)
    # locator columns must never reach disk
    import glob

    for f in glob.glob(os.path.join(str(tmp_path / "table"),
                                    "snap-*", "**", "*.parquet"),
                       recursive=True):
        names = pq.ParquetFile(f).schema_arrow.names
        assert "__src_file" not in names and "__src_row" not in names, f


def test_delta_replay_payload_pruned(fixture_dir, tmp_path, ray_session):
    """Pruned delta tier: tombstones keep null content; checkpoint
    folds see real contents (delta files are written post-fetch)."""
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8,
                    rename_map=RENAME_MAP, prune_payload=True,
                    max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        assert eng.apply_log(p, epoch_id=i, mode="delta")["committed"]
    oracle = oracle_apply(fixture_dir["base"], fixture_dir["epochs"])
    state = _final_state(eng)
    _assert_matches_oracle(state, oracle)
    _assert_contents_exact(state, oracle)
    # and after a checkpoint fold the state is unchanged
    eng.checkpoint("ckpt")
    state2 = _final_state(eng)
    _assert_matches_oracle(state2, oracle)
    _assert_contents_exact(state2, oracle)


def test_prune_auto_dispatch(fixture_dir, tmp_path, ray_session):
    """"auto" engages on footer stats: the default fixture's ~300 B
    contents stay inline; a True/False override always wins."""
    eng = CDCEngine(str(tmp_path / "t1"), rename_map=RENAME_MAP)
    files = list(fixture_dir["epochs"])
    auto = eng._decide_prune("files", files)
    from etlray.cdc.engine import PRUNE_PAYLOAD_AUTO_BYTES, \
        _mean_payload_bytes

    mean = _mean_payload_bytes(files, ["content"])
    assert auto == (mean > PRUNE_PAYLOAD_AUTO_BYTES)
    assert CDCEngine(str(tmp_path / "t2"), prune_payload=True) \
        ._decide_prune("files", files) is True
    assert CDCEngine(str(tmp_path / "t3"), prune_payload=False) \
        ._decide_prune("files", files) is False
    # dataset sources can never prune (no stable row locator)
    assert CDCEngine(str(tmp_path / "t4"), prune_payload=True) \
        ._decide_prune("datasets", []) is False


def test_pruned_fetch_honors_per_call_rename(tmp_path, ray_session):
    """Regression: a per-call apply_log(rename_map=...) must reach the
    pruned fetch layer — before the fix the fetch used only the
    engine-level map, missed the source column, and silently committed
    NULL contents under valid content_shas."""
    import numpy as np
    import ray.data

    from etlray.cdc.fixture import sha256_hex

    src = tmp_path / "ev.parquet"
    texts = [f"text-{i}" * 10 for i in range(40)]
    pq.write_table(pa.table({
        "repo": pa.array([f"r{i % 4}" for i in range(40)]),
        "path": pa.array([f"p{i}" for i in range(40)]),
        "lsn": pa.array(range(1, 41), type=pa.int64()),
        "op": pa.array(["insert"] * 40),
        "payload": pa.array(texts),          # source-side column name
    }), src, row_group_size=8)
    eng = CDCEngine(str(tmp_path / "t"), num_buckets=4,
                    prune_payload=True)      # engine map EMPTY
    assert eng.apply_log(str(src), epoch_id=0,
                         rename_map={"payload": "content"})["committed"]
    rows = pa.concat_tables(
        [b for b in eng.read_snapshot().iter_batches(batch_format="pyarrow")],
        promote_options="permissive").to_pylist()
    assert len(rows) == 40
    for r in rows:
        assert r["content"] is not None
        assert sha256_hex(r["content"]) == r["content_sha"]


def test_binary_content_sha_and_prune(tmp_path, ray_session):
    """sha256_column must hash binary payloads (the blob case the
    prune threshold targets) — bytes.encode crashed before."""
    import hashlib

    src = tmp_path / "ev.parquet"
    blobs = [bytes([i]) * 50 for i in range(20)]
    pq.write_table(pa.table({
        "repo": pa.array(["r"] * 20),
        "path": pa.array([f"p{i}" for i in range(20)]),
        "lsn": pa.array(range(1, 21), type=pa.int64()),
        "op": pa.array(["insert"] * 20),
        "content": pa.array(blobs, type=pa.binary()),
    }), src)
    eng = CDCEngine(str(tmp_path / "t"), num_buckets=2,
                    prune_payload=True)
    assert eng.apply_log(str(src), epoch_id=0)["committed"]
    rows = pa.concat_tables(
        [b for b in eng.read_snapshot().iter_batches(batch_format="pyarrow")],
        promote_options="permissive").to_pylist()
    assert len(rows) == 20
    for r in rows:
        assert r["content"] is not None
        assert hashlib.sha256(r["content"]).hexdigest() == r["content_sha"]


def test_pruned_zero_rowgroup_file_is_noop(tmp_path, ray_session):
    """A published log file with zero row groups must commit as an
    all-carry-forward epoch in pruned mode (it crashed with IndexError
    on the empty ref list before — a follow() poison pill)."""
    schema = pa.schema([("repo", pa.string()), ("path", pa.string()),
                        ("lsn", pa.int64()), ("op", pa.string()),
                        ("content", pa.string())])
    src = tmp_path / "empty.parquet"
    with pq.ParquetWriter(str(src), schema):
        pass  # no writes → 0 row groups
    eng = CDCEngine(str(tmp_path / "t"), num_buckets=4,
                    prune_payload=True)
    res = eng.apply_log(str(src), epoch_id=0)
    assert res["committed"] and res["touched_buckets"] == 0


def test_legacy_sparse_bucket_count_adoption(tmp_path, fixture_dir,
                                             ray_session):
    """Legacy tables (no num_buckets metric) record only TOUCHED
    buckets; the derived count is a lower bound. A caller count ≥ the
    bound must be accepted (it was rejected before), below it raises."""
    import json

    import ray.data

    eng = CDCEngine(str(tmp_path / "t"), num_buckets=8,
                    rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    # simulate a pre-metric manifest: strip num_buckets from metrics
    mpath = os.path.join(str(tmp_path / "t"), "epochs.d")
    for fn in os.listdir(mpath):
        p = os.path.join(mpath, fn)
        rec = json.load(open(p))
        (rec.get("metrics") or {}).pop("num_buckets", None)
        json.dump(rec, open(p, "w"))
    # correct caller count ≥ derived bound → accepted
    eng2 = CDCEngine(str(tmp_path / "t"), num_buckets=8,
                     rename_map=RENAME_MAP)
    assert eng2.num_buckets == 8
    # count below the bound (bucket ids up to 7 exist) → rejected
    with pytest.raises(ValueError):
        CDCEngine(str(tmp_path / "t"), num_buckets=2,
                  rename_map=RENAME_MAP)
    # DENSE legacy table (every bucket 0..7 referenced): a LARGER
    # caller count is still accepted (upper buckets may be untouched)
    # but must warn — the bound is most likely the true committed
    # count and a wrong larger count corrupts watermark dedup
    with _assert_warns_log("etlray.cdc.engine", "densely references"):
        eng3 = CDCEngine(str(tmp_path / "t"), num_buckets=16,
                         rename_map=RENAME_MAP)
    assert eng3.num_buckets == 16


class _assert_warns_log:
    """Context manager asserting a logging.warning containing `needle`
    was emitted on `logger_name`."""

    def __init__(self, logger_name: str, needle: str) -> None:
        self.logger_name, self.needle = logger_name, needle

    def __enter__(self):
        import logging

        self.records = []
        self.handler = logging.Handler()
        self.handler.emit = lambda rec: self.records.append(rec)
        self.logger = logging.getLogger(self.logger_name)
        self.logger.addHandler(self.handler)
        return self

    def __exit__(self, *exc):
        self.logger.removeHandler(self.handler)
        if exc[0] is None:
            assert any(self.needle in r.getMessage()
                       for r in self.records), \
                f"no log containing {self.needle!r}"
        return False


def test_generate_fixture_tiny_event_count(tmp_path):
    """n_events so small an epoch's range is empty: every manifest
    path must still exist (readers crashed on the missing file)."""
    import os as _os

    from etlray.cdc.fixture import generate_fixture

    fx = generate_fixture(str(tmp_path / "fx"), n_events=2, n_keys=10,
                          n_base=5)
    for p in [fx["base"], *fx["epochs"]]:
        assert _os.path.exists(p), p
    oracle = oracle_apply(fx["base"], fx["epochs"])
    assert isinstance(oracle, dict)


def test_snapshot_diff_matches_oracle(fixture_dir, tmp_path, ray_session):
    """diff(bootstrap -> current) classifies every key exactly as the
    dict-replay oracle does (added / deleted / changed on content_sha,
    commit, language, size), skips carry-forward buckets without
    reading them, and diff(current -> current) is empty."""
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8,
                    rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    res = eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)
    assert res["committed"]

    base_state = oracle_apply(fixture_dir["base"], [])
    final_state = oracle_apply(fixture_dir["base"],
                               [fixture_dir["epochs"][0]])
    want = {}
    for k in final_state.keys() - base_state.keys():
        want[k] = "added"
    for k in base_state.keys() - final_state.keys():
        want[k] = "deleted"
    cmp_fields = ("content_sha", "commit", "language", "size")
    for k in final_state.keys() & base_state.keys():
        if any(final_state[k].get(f) != base_state[k].get(f)
               for f in cmp_fields):
            want[k] = "changed"

    d = eng.diff("bootstrap")
    got = {(r["repo"], r["path"]): r["change"]
           for r in d["dataset"].take_all()}
    assert got == want
    assert d["buckets_compared"] + d["buckets_skipped"] == d["buckets"]

    # same epoch on both sides: every bucket carry-forward-identical
    d2 = eng.diff(0, 0)
    assert d2["buckets_skipped"] == d2["buckets"]
    assert d2["dataset"].count() == 0


def test_snapshot_diff_rejects_cross_rebalance(fixture_dir, tmp_path,
                                               ray_session):
    import pytest as _pytest
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8,
                    rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)
    eng.rebalance(16)
    with _pytest.raises(ValueError, match="bucketing era"):
        eng.diff(0)


def test_snapshot_diff_change_feed_values(fixture_dir, tmp_path,
                                          ray_session):
    """include_values=True upgrades the diff to a change data feed:
    new values + _old values per key, NULL on the absent side, both
    matching the dict-replay oracle."""
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8,
                    rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)

    base_state = oracle_apply(fixture_dir["base"], [])
    final_state = oracle_apply(fixture_dir["base"],
                               [fixture_dir["epochs"][0]])

    d = eng.diff("bootstrap", include_values=True,
                 compare_cols=["content_sha", "commit"])
    rows = {(r["repo"], r["path"]): r for r in d["dataset"].take_all()}
    for k, r in rows.items():
        if r["change"] == "added":
            assert k not in base_state and k in final_state
            assert r["content_sha"] == final_state[k]["content_sha"]
            assert r["content_sha_old"] is None
        elif r["change"] == "deleted":
            assert k in base_state and k not in final_state
            assert r["content_sha"] is None
            assert r["content_sha_old"] == base_state[k]["content_sha"]
        else:
            assert r["content_sha"] == final_state[k]["content_sha"]
            assert r["content_sha_old"] == base_state[k]["content_sha"]
            assert (r["content_sha"], r["commit"]) != \
                (r["content_sha_old"], r["commit_old"])
    # feed covers exactly the non-identical keys on the compare cols
    want = {k for k in final_state.keys() ^ base_state.keys()}
    want |= {k for k in final_state.keys() & base_state.keys()
             if (final_state[k]["content_sha"], final_state[k]["commit"])
             != (base_state[k]["content_sha"], base_state[k]["commit"])}
    assert set(rows) == want


def test_incremental_agg_view_matches_recompute(fixture_dir, tmp_path,
                                                ray_session):
    """Materialized (language -> n_rows, sum_lsn) view maintained
    incrementally from the change feed equals a full recompute from
    the snapshot, across two successive epochs (including group moves
    when a key's language changes and group dropout)."""
    import ray.data

    from etlray.cdc.view import snapshot_agg_view, update_agg_view

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8,
                    rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)

    view = snapshot_agg_view(eng, "language", ["lsn"], epoch_id=0)
    assert view.num_rows > 1 and view["n_rows"].to_pylist()

    for i, ep in enumerate(fixture_dir["epochs"][1:], start=1):
        eng.apply_log(ep, epoch_id=i)
        view = update_agg_view(eng, view, from_epoch=i - 1, to_epoch=i)
        want = snapshot_agg_view(eng, "language", ["lsn"], epoch_id=i)
        got = {r["language"]: (r["n_rows"], r["sum_lsn"])
               for r in view.to_pylist()}
        exp = {r["language"]: (r["n_rows"], r["sum_lsn"])
               for r in want.to_pylist()}
        assert got == exp, f"epoch {i}: {got} != {exp}"


def test_agg_view_int_sums_exact_past_2_53(ray_session):
    """Integer sum columns accumulate as exact int64: with values near
    2^60 (float64 ulp there is 256) ANY float64 path — snapshot sum or
    the −old+new retraction fold — would round both the bootstrap sum
    and the delta away; the int64 path is bit-exact. Uses a stub
    engine so the arithmetic is isolated from the CDC machinery."""
    import ray.data

    from etlray.cdc.view import snapshot_agg_view, update_agg_view

    big = 2 ** 60  # not float64-representable ± small ints (ulp 256)
    base = pa.table({"grp": ["a", "a", "b"],
                     "sz": pa.array([big, 1, 5], pa.int64())})
    feed = pa.table({
        "change": ["changed"],
        "grp": ["a"], "grp_old": ["a"],
        "sz": pa.array([2], pa.int64()),
        "sz_old": pa.array([1], pa.int64()),
    })

    class StubEngine:
        def read_snapshot(self, epoch_id=None, columns=None):
            return ray.data.from_arrow(base.select(columns))

        def diff(self, from_epoch, to_epoch=None, include_values=False,
                 compare_cols=None):
            return {"dataset": ray.data.from_arrow(feed)}

    eng = StubEngine()
    view = snapshot_agg_view(eng, "grp", ["sz"])
    assert view.schema.field("sum_sz").type == pa.int64()
    assert dict(zip(view["grp"].to_pylist(),
                    view["sum_sz"].to_pylist())) == {"a": big + 1, "b": 5}
    view = update_agg_view(eng, view, from_epoch=0, to_epoch=1)
    got = dict(zip(view["grp"].to_pylist(), view["sum_sz"].to_pylist()))
    # float64 at any stage would have collapsed big+1 and big+2 to big
    assert got == {"a": big + 2, "b": 5}
    assert view.schema.field("sum_sz").type == pa.int64()


def test_empty_change_feed_schema_matches_nonempty(fixture_dir, tmp_path,
                                                   ray_session):
    """An all-carry-forward change feed (same epoch on both sides) must
    expose the SAME schema as a non-empty feed — keys + change + the
    compare columns and their _old twins — so consumers written against
    the documented feed shape work on the empty case too."""
    import ray.data

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8,
                    rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    assert eng.apply_log(fixture_dir["epochs"][0], epoch_id=0)["committed"]

    full = eng.diff("bootstrap", 0, include_values=True)["dataset"]
    empty = eng.diff(0, 0, include_values=True)["dataset"]
    assert empty.count() == 0
    assert empty.schema().names == full.schema().names


def test_diff_tombstoned_bucket_vs_absent_side(tmp_path, ray_session):
    """Reverse diff where a bucket exists only on the FROM side with
    every row tombstoned: the per-bucket task must emit 0 rows WITH the
    proper feed schema (pre-fix it returned a zero-column table,
    poisoning from_arrow_refs with heterogeneous block schemas)."""
    import ray.data

    from etlray.cdc.apply import stable_bucket

    cand = [f"src/f{i}.py" for i in range(32)]
    probe = pa.table({"repo": ["org/a"] * len(cand), "path": cand})
    bk = stable_bucket(probe, ("repo", "path"), 8)
    p0 = cand[0]
    p1 = next(c for c, b in zip(cand, bk) if b != bk[0])

    base = pa.table({"repo": ["org/a"], "path": [p0], "commit": ["c0"],
                     "lang": ["py"], "content": ["x"]})
    bp = str(tmp_path / "base.parquet")
    pq.write_table(base, bp)
    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8,
                    rename_map=RENAME_MAP)
    eng.bootstrap(ray.data.read_parquet(bp))

    def ev(lsn, op, path, content):
        return pa.table({
            "lsn": pa.array([lsn], pa.int64()), "op": [op],
            "repo": ["org/a"], "path": [path],
            "commit": [None if op == "delete" else f"c{lsn}"],
            "content": [content],
            "lang": [None if op == "delete" else "py"]})

    e0 = str(tmp_path / "e0.parquet")
    pq.write_table(ev(1, "insert", p1, "hello"), e0)
    e1 = str(tmp_path / "e1.parquet")
    pq.write_table(ev(2, "delete", p1, None), e1)
    assert eng.apply_log(e0, epoch_id=0)["committed"]
    assert eng.apply_log(e1, epoch_id=1)["committed"]

    # FROM epoch 1 (p1's bucket exists, all rows tombstoned) TO the
    # bootstrap snapshot (bucket entirely absent)
    d = eng.diff(1, "bootstrap", include_values=True)
    assert d["dataset"].count() == 0
    names = d["dataset"].schema().names
    assert "change" in names and "repo" in names and "path" in names
