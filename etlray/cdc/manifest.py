"""Commit manifest — exactly-once without a lakehouse.

A snapshot epoch is visible IFF it is recorded in ``_manifest.json``.
The write protocol is write-temp → ``os.replace`` (atomic on POSIX),
and committing an epoch id that is already present is a NO-OP — so a
retried / duplicated driver run of the same epoch cannot double-apply
(the reference's missing piece: its JSON "append" loader re-reads and
rewrites whole files non-atomically,
/root/reference/src/load/json.rs:137-161, and its Delta Merge mode is
unimplemented, src/load/delta.rs:255-267).

Manifest contents per epoch: snapshot directory, per-bucket LSN
high-watermarks (resume = skip events with ``lsn <= watermark``),
and per-bucket lineage (rows, applied-event counts) — the north rule's
"lineage records (source offsets, applied-event counts, checkpoint
epoch)".
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    FILENAME = "_manifest.json"

    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        self.path = os.path.join(table_dir, self.FILENAME)

    # ------------------------------------------------------------------
    def load(self) -> dict:
        if not os.path.exists(self.path):
            return {"epochs": [], "current": None}
        with open(self.path, "r", encoding="utf-8") as f:
            return json.load(f)

    def committed(self, epoch_id: str | int) -> bool:
        return any(e["id"] == epoch_id for e in self.load()["epochs"])

    def current_epoch(self) -> dict | None:
        m = self.load()
        if m["current"] is None:
            return None
        return next(e for e in m["epochs"] if e["id"] == m["current"])

    def watermarks(self) -> dict[int, int]:
        """bucket → max applied LSN, from the current epoch."""
        cur = self.current_epoch()
        if cur is None:
            return {}
        return {int(k): int(v) for k, v in cur.get("watermarks", {}).items()}

    # ------------------------------------------------------------------
    def commit_epoch(
        self,
        epoch_id: str | int,
        files: dict[int, str],
        watermarks: dict[int, int],
        lineage: dict[int, dict] | None = None,
        metrics: dict | None = None,
    ) -> bool:
        """Atomically append an epoch. Returns False (no-op) if the
        epoch is already committed — the exactly-once guarantee.

        ``files`` maps bucket → parquet path RELATIVE to table_dir; an
        epoch's mapping may reference files written by EARLIER epochs
        (incremental carry-forward of untouched buckets)."""
        os.makedirs(self.table_dir, exist_ok=True)
        m = self.load()
        if any(e["id"] == epoch_id for e in m["epochs"]):
            return False
        m["epochs"].append({
            "id": epoch_id,
            "files": {str(k): v for k, v in files.items()},
            "watermarks": {str(k): int(v) for k, v in watermarks.items()},
            "lineage": {str(k): v for k, v in (lineage or {}).items()},
            "metrics": metrics or {},
            "committed_at": time.time(),
        })
        m["current"] = epoch_id
        tmp = self.path + f".tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.path)  # atomic publish
        return True

    def snapshot_files(self, epoch_id: str | int | None = None) -> dict[int, str] | None:
        """bucket → absolute parquet path of a committed snapshot; None
        if nothing committed. ``epoch_id`` gives time travel (reference
        DeltaExtractor ``with_version``,
        /root/reference/src/extract/delta.rs:37-148)."""
        m = self.load()
        target = m["current"] if epoch_id is None else epoch_id
        for e in m["epochs"]:
            if e["id"] == target:
                return {int(k): os.path.join(self.table_dir, v)
                        for k, v in e["files"].items()}
        return None

    def lineage(self, epoch_id: str | int | None = None) -> dict[int, dict]:
        m = self.load()
        target = m["current"] if epoch_id is None else epoch_id
        for e in m["epochs"]:
            if e["id"] == target:
                return {int(k): v for k, v in e.get("lineage", {}).items()}
        return {}


def write_lineage_jsonl(path: str, epoch_id, lineage: dict[int, dict]) -> None:
    """Per-partition lineage records as JSONL (append-only audit log)."""
    tmp = path + f".tmp.{os.getpid()}"
    lines = [json.dumps({"epoch": epoch_id, "bucket": b, **stats})
             for b, stats in sorted(lineage.items())]
    existing = ""
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            existing = f.read()
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(existing + "\n".join(lines) + "\n")
    os.replace(tmp, path)
