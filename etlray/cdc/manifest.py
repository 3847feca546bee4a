"""Commit manifest — exactly-once without a lakehouse.

A snapshot epoch is visible IFF its record exists under ``_epochs/``
AND the ``_manifest.json`` pointer names it (or a later epoch). Commit
protocol per epoch:

1. write ``_epochs/<seq>-<name>.json`` (write-temp → ``os.replace``,
   atomic on POSIX) — the complete epoch record;
2. rewrite the ~100-byte ``_manifest.json`` pointer
   ``{"format": 2, "current": id, "count": n}`` the same way.

Committing an epoch id that already has a record is a NO-OP — so a
retried / duplicated driver run of the same epoch cannot double-apply
(the reference's missing piece: its JSON "append" loader re-reads and
rewrites whole files non-atomically,
/root/reference/src/load/json.rs:137-161, and its Delta Merge mode is
unimplemented, src/load/delta.rs:255-267). A crash between steps 1 and
2 is rolled FORWARD on the next ``committed()`` check (the record is
complete by construction — it is written after every bucket file).

Commit cost is O(1) in the number of historical epochs (one new record
+ the fixed-size pointer): at 10^5 epochs over a 10^10-event log the
old single-file design re-serialized every historical epoch on every
commit. Only explicit version listing (``load()``, time travel) scans
the ``_epochs/`` directory.

Epoch record contents: snapshot directory, per-bucket LSN
high-watermarks (resume = skip events with ``lsn <= watermark``),
and per-bucket lineage (rows, applied-event counts) — the north rule's
"lineage records (source offsets, applied-event counts, checkpoint
epoch)".
"""

from __future__ import annotations

import base64
import json
import os
import time

EPOCH_DIRNAME = "epochs.d"  # no leading underscore: pyarrow discovery hides _-paths


def _epoch_fname(epoch_id) -> str:
    """Filesystem-safe, collision-free name for an epoch id (ids that
    stringify identically — 0 vs "0" — share a record; documented)."""
    tag = base64.urlsafe_b64encode(str(epoch_id).encode()).decode().rstrip("=")
    return f"e-{tag}.json"


class Manifest:
    FILENAME = "_manifest.json"

    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        self.path = os.path.join(table_dir, self.FILENAME)
        self.epoch_dir = os.path.join(table_dir, EPOCH_DIRNAME)

    # -- low-level ------------------------------------------------------
    def _pointer(self) -> dict:
        if not os.path.exists(self.path):
            return {"format": 2, "current": None, "count": 0}
        with open(self.path, "r", encoding="utf-8") as f:
            p = json.load(f)
        if "epochs" in p:  # legacy single-file format (round 1)
            return p
        return p

    def _is_legacy(self, p: dict) -> bool:
        return "epochs" in p

    def _atomic_write(self, path: str, obj: dict) -> None:
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, path)

    def _record_path(self, epoch_id) -> str:
        return os.path.join(self.epoch_dir, _epoch_fname(epoch_id))

    def _read_record(self, epoch_id) -> dict | None:
        p = self._record_path(epoch_id)
        if not os.path.exists(p):
            return None
        with open(p, "r", encoding="utf-8") as f:
            return json.load(f)

    def _migrate_legacy(self, p: dict) -> dict:
        """One-time migration of a round-1 single-file manifest into
        per-epoch records + pointer."""
        os.makedirs(self.epoch_dir, exist_ok=True)
        for i, e in enumerate(p["epochs"]):
            rec = dict(e)
            rec["seq"] = i
            self._atomic_write(self._record_path(e["id"]), rec)
        ptr = {"format": 2, "current": p["current"], "count": len(p["epochs"])}
        self._atomic_write(self.path, ptr)
        return ptr

    # -- queries --------------------------------------------------------
    def load(self) -> dict:
        """Full manifest view {"epochs": [...], "current": id} — scans
        the epoch dir; use only for version listing / debugging (the
        hot-path queries below are O(1))."""
        p = self._pointer()
        if self._is_legacy(p):
            return p
        epochs: list[dict] = []
        if os.path.isdir(self.epoch_dir):
            for name in os.listdir(self.epoch_dir):
                if not name.endswith(".json") or ".tmp." in name:
                    continue
                with open(os.path.join(self.epoch_dir, name), encoding="utf-8") as f:
                    epochs.append(json.load(f))
        epochs.sort(key=lambda e: e.get("seq", 0))
        return {"epochs": epochs, "current": p.get("current")}

    def committed(self, epoch_id: str | int) -> bool:
        p = self._pointer()
        if self._is_legacy(p):
            return any(e["id"] == epoch_id for e in p["epochs"])
        rec = self._read_record(epoch_id)
        if rec is None:
            return False
        # roll-forward: record exists but a crash preceded the pointer
        # update — finish publishing it now
        if p.get("current") is None or rec.get("seq", 0) >= p.get("count", 0):
            self._atomic_write(self.path, {
                "format": 2, "current": rec["id"], "count": rec.get("seq", 0) + 1})
        return True

    def current_epoch(self) -> dict | None:
        p = self._pointer()
        if self._is_legacy(p):
            if p["current"] is None:
                return None
            return next(e for e in p["epochs"] if e["id"] == p["current"])
        if p.get("current") is None:
            return None
        return self._read_record(p["current"])

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
        deltas: dict[int, list[str]] | None = None,
    ) -> bool:
        """Atomically append an epoch. Returns False (no-op) if the
        epoch is already committed — the exactly-once guarantee.

        ``files`` maps bucket → parquet path RELATIVE to table_dir; an
        epoch's mapping may reference files written by EARLIER epochs
        (incremental carry-forward of untouched buckets). ``deltas``
        maps bucket → ordered list of DELTA parquet paths (relative)
        stacked on top of the bucket's base file — written by
        delta-mode applies, folded away by ``CDCEngine.checkpoint``."""
        os.makedirs(self.table_dir, exist_ok=True)
        p = self._pointer()
        if self._is_legacy(p):
            p = self._migrate_legacy(p)
        if self.committed(epoch_id):
            return False
        os.makedirs(self.epoch_dir, exist_ok=True)
        # seq from the MAX existing record, not the pointer count: a
        # crash between record write and pointer publish leaves an
        # orphaned record the pointer never counted — reusing its seq
        # would make two records ambiguous under the sort-by-seq order.
        # The directory scan runs ONCE per Manifest instance (then the
        # cached watermark advances in memory) — rescanning every
        # commit would be O(epochs²) json loads over a long tail.
        if getattr(self, "_max_seq", None) is None:
            self._max_seq = -1
            try:
                for fn in os.listdir(self.epoch_dir):
                    if fn.endswith(".json"):
                        with open(os.path.join(self.epoch_dir, fn)) as f:
                            rec = json.load(f)
                        self._max_seq = max(self._max_seq,
                                            int(rec.get("seq", -1)))
            except OSError:
                pass
        seq = max(int(p.get("count", 0)), self._max_seq + 1)
        self._max_seq = seq
        self._atomic_write(self._record_path(epoch_id), {
            "id": epoch_id,
            "seq": seq,
            "files": {str(k): v for k, v in files.items()},
            "deltas": {str(k): list(v) for k, v in (deltas or {}).items() if v},
            "watermarks": {str(k): int(v) for k, v in watermarks.items()},
            "lineage": {str(k): v for k, v in (lineage or {}).items()},
            "metrics": metrics or {},
            "committed_at": time.time(),
        })
        self._atomic_write(self.path,
                           {"format": 2, "current": epoch_id, "count": seq + 1})
        return True

    def snapshot_files(self, epoch_id: str | int | None = None) -> dict[int, str] | None:
        """bucket → absolute parquet path of a committed snapshot; None
        if nothing committed. ``epoch_id`` gives time travel (reference
        DeltaExtractor ``with_version``,
        /root/reference/src/extract/delta.rs:37-148)."""
        p = self._pointer()
        if self._is_legacy(p):
            target = p["current"] if epoch_id is None else epoch_id
            for e in p["epochs"]:
                if e["id"] == target:
                    return {int(k): os.path.join(self.table_dir, v)
                            for k, v in e["files"].items()}
            return None
        target = p.get("current") if epoch_id is None else epoch_id
        if target is None:
            return None
        rec = self._read_record(target)
        if rec is None:
            return None
        return {int(k): os.path.join(self.table_dir, v)
                for k, v in rec["files"].items()}

    def snapshot_deltas(self, epoch_id: str | int | None = None,
                        absolute: bool = True) -> dict[int, list[str]]:
        """bucket → ordered delta parquet paths stacked on the bucket's
        base file ({} when the snapshot has no outstanding deltas)."""
        p = self._pointer()
        if self._is_legacy(p):
            return {}
        target = p.get("current") if epoch_id is None else epoch_id
        if target is None:
            return {}
        rec = self._read_record(target)
        if rec is None:
            return {}
        out: dict[int, list[str]] = {}
        for k, paths in (rec.get("deltas") or {}).items():
            out[int(k)] = [os.path.join(self.table_dir, v) for v in paths] \
                if absolute else list(paths)
        return out

    def lineage(self, epoch_id: str | int | None = None) -> dict[int, dict]:
        p = self._pointer()
        if self._is_legacy(p):
            target = p["current"] if epoch_id is None else epoch_id
            for e in p["epochs"]:
                if e["id"] == target:
                    return {int(k): v for k, v in e.get("lineage", {}).items()}
            return {}
        target = p.get("current") if epoch_id is None else epoch_id
        if target is None:
            return {}
        rec = self._read_record(target)
        if rec is None:
            return {}
        return {int(k): v for k, v in rec.get("lineage", {}).items()}

    # ------------------------------------------------------------------
    def reset(self) -> None:
        """Start a new manifest lineage (overwrite semantics). Old
        pointer + records move aside as ``.bak`` so prior snapshots
        remain readable by hand."""
        import shutil

        if os.path.exists(self.path):
            shutil.copy(self.path, self.path + ".bak")
            os.remove(self.path)
        if os.path.isdir(self.epoch_dir):
            bak = self.epoch_dir + f".bak.{int(time.time() * 1000)}"
            os.rename(self.epoch_dir, bak)
        self._max_seq = None  # new lineage starts its seq space fresh


def write_lineage_jsonl(path: str, epoch_id, lineage: dict[int, dict]) -> None:
    """Per-partition lineage records as JSONL — true O(new-records)
    append (an audit log tolerates a torn tail line after a crash; the
    manifest, not this file, is the source of truth)."""
    lines = [json.dumps({"epoch": epoch_id, "bucket": b, **stats})
             for b, stats in sorted(lineage.items())]
    if not lines:
        return
    with open(path, "a", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
