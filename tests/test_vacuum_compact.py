"""Snapshot GC (vacuum) and small-file compaction: disk drops, recent
time travel survives, carried-forward bucket files are never deleted,
and applies after compaction stay correct."""

import glob
import os

import pyarrow as pa
import pytest


def _mk_events(n, lsn0, n_keys=40):
    return pa.table({
        "repo": ["r"] * n,
        "path": [f"p{i % n_keys}" for i in range(n)],
        "lsn": pa.array([lsn0 + i for i in range(n)], type=pa.int64()),
        "op": ["insert"] * n,
        "content": [f"c{lsn0 + i}" for i in range(n)],
    })


def _du(d):
    return sum(os.path.getsize(p)
               for p in glob.glob(os.path.join(d, "snap-*", "**", "*.parquet"),
                                  recursive=True))


@pytest.fixture()
def engine(ray_session, tmp_path):
    import ray.data

    from etlray.cdc.engine import CDCEngine

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=8)
    eng.bootstrap(ray.data.from_arrow(_mk_events(40, 0)))
    for i in range(4):
        eng.apply_log(ray.data.from_arrow(_mk_events(30, 100 * (i + 1))),
                      epoch_id=i)
    return eng


def test_vacuum_drops_disk_keeps_recent_time_travel(engine):
    snap_before = engine.read_snapshot().to_pandas()
    prev_epoch = engine.read_snapshot(epoch_id=3).to_pandas()
    du_before = _du(engine.table_dir)

    res = engine.vacuum(keep_last=2)
    assert res["deleted_files"] > 0 and res["freed_bytes"] > 0
    assert _du(engine.table_dir) < du_before

    # current + previous epoch still fully readable (carry-forward files kept)
    after = engine.read_snapshot().to_pandas()
    assert after.sort_values(["repo", "path"]).reset_index(drop=True).equals(
        snap_before.sort_values(["repo", "path"]).reset_index(drop=True))
    prev_after = engine.read_snapshot(epoch_id=3).to_pandas()
    assert len(prev_after) == len(prev_epoch)

    # older epochs are gone from the manifest
    assert engine.read_snapshot(epoch_id=0) is None
    assert not engine.manifest.committed(0)


def test_vacuumed_epoch_redelivery_is_noop(engine):
    """A re-delivered epoch whose record was vacuumed recommits, but its
    events are all under the watermarks — the table state is unchanged."""
    import ray.data

    engine.vacuum(keep_last=1)
    before = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    res = engine.apply_log(ray.data.from_arrow(_mk_events(30, 100)), epoch_id=0)
    assert res["committed"] and res["touched_buckets"] == 0
    after = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert before.equals(after)


def test_compact_merges_files_and_preserves_rows(engine):
    before = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    n_files_before = len(set(engine.manifest.snapshot_files().values()))

    res = engine.compact(epoch_id="squash", group_size=4)
    assert res["committed"]
    assert res["files"] < n_files_before
    after = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert before.equals(after)


def test_apply_after_compaction_rewrites_single_buckets(engine):
    """Later epochs must pull ONLY their bucket's rows out of a shared
    compacted file."""
    import ray.data

    engine.compact(epoch_id="squash", group_size=8)  # all buckets → 1 file
    engine.apply_log(ray.data.from_arrow(_mk_events(25, 10_000)), epoch_id="post")
    df = engine.read_snapshot().to_pandas()
    # one live row per key, no duplicates leaked from the shared file
    assert not df.duplicated(subset=["repo", "path"]).any()
    # the updated keys carry the new contents
    updated = df[df["path"] == "p0"]
    assert (updated["lsn"] >= 10_000).all()


def test_compact_then_vacuum_roundtrip(engine):
    engine.compact(epoch_id="squash", group_size=4)
    before = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    engine.vacuum(keep_last=1)
    after = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert before.equals(after)


def test_recompact_after_bucket_rewrite_drops_stale_rows(engine):
    """compact → rewrite some buckets → compact AGAIN: the second
    compaction reads a mix of shared group files (holding now-stale
    rows for the rewritten buckets) and fresh per-bucket files; each
    source must contribute only the buckets it is ASSIGNED, else the
    stale rows duplicate the fresh ones."""
    import ray.data

    engine.compact(epoch_id="c1", group_size=8)   # all buckets share 1 file
    engine.apply_log(ray.data.from_arrow(_mk_events(25, 10_000)),
                     epoch_id="rewrite")          # rewrites several buckets
    expect = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    res = engine.compact(epoch_id="c2", group_size=4)
    assert res["committed"]
    after = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert not after.duplicated(subset=["repo", "path"]).any()
    assert expect.equals(after)


def test_rebalance_changes_bucket_count_and_keeps_state(engine):
    """Explicit partition rebalancing: same final rows under the new
    hash(key)->bucket mapping, subsequent applies keep working at the
    new count, and resuming with the OLD count is refused."""
    import ray.data

    from etlray.cdc.engine import CDCEngine

    before = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    res = engine.rebalance(16, epoch_id="reb")
    assert res["committed"] and res["num_buckets"] == 16
    after = engine.read_snapshot().to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert before.equals(after)
    # applies continue at the new count (LWW absorbs the conservative
    # watermark floor)
    engine.apply_log(ray.data.from_arrow(_mk_events(25, 50_000)),
                     epoch_id="post-reb")
    df = engine.read_snapshot().to_pandas()
    assert not df.duplicated(subset=["repo", "path"]).any()
    assert (df[df["path"] == "p0"]["lsn"] >= 50_000).all()
    # a fresh engine adopts the committed count; a mismatched explicit
    # count is refused
    eng2 = CDCEngine(engine.table_dir, num_buckets=None)
    assert eng2.num_buckets == 16
    import pytest as _pytest
    with _pytest.raises(ValueError):
        CDCEngine(engine.table_dir, num_buckets=8)
