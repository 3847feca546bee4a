"""Tail-follow mode: a producer thread appends epoch files (temp-write
then atomic rename) while the engine follows; the final table must equal
a plain replay of the same files, and a second follow applies nothing."""

import os
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events(n, lsn0, n_keys=20):
    return pa.table({
        "repo": ["r"] * n,
        "path": [f"p{i % n_keys}" for i in range(n)],
        "lsn": pa.array([lsn0 + i for i in range(n)], type=pa.int64()),
        "op": ["insert"] * n,
        "content": [f"c{lsn0 + i}" for i in range(n)],
    })


def _write_atomic(table, path):
    tmp = path + ".inflight"
    pq.write_table(table, tmp)
    os.rename(tmp, path)


def test_follow_consumes_growing_directory(ray_session, tmp_path):
    from etlray.cdc.engine import CDCEngine

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    batches = [_events(60, 1000 * (i + 1)) for i in range(4)]

    def producer():
        for i, t in enumerate(batches):
            time.sleep(0.15)
            _write_atomic(t, str(log_dir / f"epoch-{i:06d}.parquet"))

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=4, content_col="content")
    w = threading.Thread(target=producer)
    w.start()
    res = eng.follow(str(log_dir), poll_interval=0.05, idle_timeout=1.5)
    w.join()
    assert len(res["epochs"]) == 4
    assert res["reason"] == "idle_timeout"

    # equal to a one-shot replay of the same files
    ref = CDCEngine(str(tmp_path / "table_ref"), num_buckets=4)
    for i in range(4):
        ref.apply_log([str(log_dir / f"epoch-{i:06d}.parquet")], epoch_id=i)
    a = eng.read_snapshot().to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = ref.read_snapshot().to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b)

    # restart: nothing new → zero epochs applied (exactly-once per file)
    res2 = eng.follow(str(log_dir), poll_interval=0.05, idle_timeout=0.2)
    assert res2["epochs"] == []


def test_follow_catchup_batching(ray_session, tmp_path):
    """A backlog applied with max_files_per_epoch>1 must (a) produce the
    same table as per-file replay, (b) record member files so a
    restarted follower skips them."""
    from etlray.cdc.engine import CDCEngine

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    batches = [_events(60, 1000 * (i + 1)) for i in range(5)]
    for i, t in enumerate(batches):  # all 5 pre-written: a deep backlog
        _write_atomic(t, str(log_dir / f"epoch-{i:06d}.parquet"))

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=4, content_col="content")
    res = eng.follow(str(log_dir), poll_interval=0.05, idle_timeout=0.2,
                     max_files_per_epoch=3)
    # 5 files → one batch of 3 + one batch of 2 = 2 epochs
    assert [e["files"] for e in res["epochs"]] == [3, 2]
    assert res["epochs"][0]["member_files"] == [
        f"epoch-{i:06d}.parquet" for i in range(3)]

    ref = CDCEngine(str(tmp_path / "table_ref"), num_buckets=4, content_col="content")
    for i in range(5):
        ref.apply_log([str(log_dir / f"epoch-{i:06d}.parquet")], epoch_id=i)
    a = eng.read_snapshot().to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = ref.read_snapshot().to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b)

    # restart: member files are recognized as committed → nothing applies
    eng2 = CDCEngine(str(tmp_path / "table"), num_buckets=None)
    res2 = eng2.follow(str(log_dir), poll_interval=0.05, idle_timeout=0.2,
                       max_files_per_epoch=3)
    assert res2["epochs"] == []


def test_follow_periodic_vacuum(ray_session, tmp_path):
    """vacuum_every=N must GC superseded snapshots mid-tail without
    changing the final table."""
    import glob

    from etlray.cdc.engine import CDCEngine

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for i in range(6):
        _write_atomic(_events(40, 1000 * (i + 1)), str(log_dir / f"e-{i:04d}.parquet"))

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=4, content_col="content")
    res = eng.follow(str(log_dir), poll_interval=0.05, idle_timeout=0.2,
                     vacuum_every=2)
    assert len(res["epochs"]) == 6
    # only the last keep_last=2 epochs' snap dirs may hold files
    live = {os.path.basename(os.path.dirname(os.path.dirname(p)))
            for p in glob.glob(str(tmp_path / "table" / "snap-*" / "*" / "*.parquet"))}
    assert len(live) <= 2 + 1  # keep_last=2 (+ carry-forward refs)

    ref = CDCEngine(str(tmp_path / "table_ref"), num_buckets=4)
    for i in range(6):
        ref.apply_log([str(log_dir / f"e-{i:04d}.parquet")], epoch_id=i)
    a = eng.read_snapshot().to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = ref.read_snapshot().to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b)


def test_follow_skips_inflight_files(ray_session, tmp_path):
    from etlray.cdc.engine import CDCEngine

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    _write_atomic(_events(30, 100), str(log_dir / "epoch-000000.parquet"))
    # a torn half-written file must be skipped, not crash the follower
    with open(log_dir / "epoch-000001.parquet", "wb") as f:
        f.write(b"PAR1\x00\x00\x00garbage")

    eng = CDCEngine(str(tmp_path / "table"), num_buckets=4)
    res = eng.follow(str(log_dir), poll_interval=0.05, idle_timeout=0.3)
    assert len(res["epochs"]) == 1
    assert res["epochs"][0]["epoch"] == "epoch-000000.parquet"
