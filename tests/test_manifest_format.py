"""Manifest v2: O(1) commits (per-epoch record files + tiny pointer),
legacy single-file migration, crash roll-forward, append-only lineage."""

import json
import os

import pytest

from etlray.cdc.manifest import Manifest, write_lineage_jsonl


def _commit(m, eid, files=None, wm=None):
    return m.commit_epoch(eid, files or {0: f"snap-{eid}/bucket_id=0/part-0.parquet"},
                          wm or {0: int(eid) if str(eid).isdigit() else 0},
                          lineage={0: {"rows": 1, "max_lsn": 0, "applied_events": 1}})


def test_commit_is_o1_in_epoch_count(tmp_path):
    m = Manifest(str(tmp_path))
    for i in range(40):
        assert _commit(m, i)
    # pointer file stays tiny no matter how many epochs exist
    assert os.path.getsize(m.path) < 200
    # hot-path queries read pointer + ONE record, not the whole history
    assert m.watermarks() == {0: 39}
    assert m.snapshot_files(7) is not None
    assert m.committed(25) and not m.committed(99)
    # full listing still works (scans the record dir)
    epochs = m.load()["epochs"]
    assert [e["id"] for e in epochs] == list(range(40))


def test_duplicate_commit_noop(tmp_path):
    m = Manifest(str(tmp_path))
    assert _commit(m, "e1")
    assert not _commit(m, "e1")
    assert m.load()["current"] == "e1"


def test_legacy_manifest_reads_and_migrates(tmp_path):
    # hand-write a round-1 style single-file manifest
    legacy = {
        "epochs": [
            {"id": "boot", "files": {"0": "snap-boot/bucket_id=0/part-0.parquet"},
             "watermarks": {"0": 0}, "lineage": {"0": {"rows": 5}},
             "metrics": {}, "committed_at": 1.0},
            {"id": 1, "files": {"0": "snap-1/bucket_id=0/part-0.parquet"},
             "watermarks": {"0": 9}, "lineage": {"0": {"rows": 6}},
             "metrics": {}, "committed_at": 2.0},
        ],
        "current": 1,
    }
    path = tmp_path / "_manifest.json"
    path.write_text(json.dumps(legacy))
    m = Manifest(str(tmp_path))
    # reads work against the legacy format directly
    assert m.committed("boot") and m.committed(1)
    assert m.watermarks() == {0: 9}
    assert m.snapshot_files("boot")[0].endswith("snap-boot/bucket_id=0/part-0.parquet")
    # first new commit migrates to v2 and preserves history
    assert _commit(m, 2)
    assert m.load()["current"] == 2
    assert [e["id"] for e in m.load()["epochs"]] == ["boot", 1, 2]
    assert m.watermarks() == {0: 2}
    assert "epochs" not in json.loads(path.read_text())  # pointer now v2


def test_crash_rollforward(tmp_path):
    """Record written but pointer not updated (crash between the two
    steps) → the next committed() check publishes it."""
    m = Manifest(str(tmp_path))
    _commit(m, "a")
    # simulate the crash: write the record for "b" by hand, leave pointer at "a"
    rec = {"id": "b", "seq": 1, "files": {"0": "snap-b/bucket_id=0/part-0.parquet"},
           "watermarks": {"0": 5}, "lineage": {}, "metrics": {}, "committed_at": 3.0}
    m._atomic_write(m._record_path("b"), rec)
    assert m.committed("b")  # roll-forward happens here
    assert m.load()["current"] == "b"
    assert m.watermarks() == {0: 5}


def test_lineage_jsonl_appends(tmp_path):
    p = str(tmp_path / "_lineage.jsonl")
    write_lineage_jsonl(p, "e1", {0: {"rows": 1}})
    size1 = os.path.getsize(p)
    write_lineage_jsonl(p, "e2", {0: {"rows": 2}, 1: {"rows": 3}})
    lines = [json.loads(x) for x in open(p).read().splitlines()]
    assert [l["epoch"] for l in lines] == ["e1", "e2", "e2"]
    # append-only: the first record's bytes are untouched
    assert open(p, "rb").read(size1) == open(p, "rb").read()[:size1]
