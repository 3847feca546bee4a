"""Deterministic CDC fixture generator + single-process oracle applier.

Synthesizes the BASELINE.json input shape: a base Parquet table of
source-code repo files ``(repo, path, commit, lang, content)`` and a
simulated binlog/WAL ``changes`` table
``(lsn:int64, op:insert|update|delete, repo, path, commit, lang,
content)`` with:

* Zipf-skewed hot keys (popular repos receive most updates — the skew
  the north rule demands explicit handling for);
* schema-evolution epochs written as SEPARATE parquet files with
  genuinely different schemas:
    - epoch 0: (lsn, op, repo, path, commit, lang, content)
    - epoch 1: + size:int32 (added column)
    - epoch 2: lang→language (renamed), size:int64 (widened)
* ops are upsert-semantics: insert/update both upsert; delete removes;
  delete of an absent key is a no-op (standard CDC tolerance) — this
  keeps generation fully vectorized (no driver-side state machine).

Everything is seeded (default 42) — same args, same bytes.

The oracle (``oracle_apply``) is an intentionally boring dict replay;
tests compare the engine's distributed result to it by per-row
``sha256(content)`` (BASELINE.json invariant).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "rs", "js", "go", "java", "c", "rb", "ts"]
RENAME_MAP = {"lang": "language"}  # epoch-2 rename, applied at read


_PAD_POOL = np.array([
    ("    # deterministic filler line %02d\n" % i) * (1 + i)
    for i in range(48)
], dtype=object)  # lengths ~35..1680 chars (levels 0..15 identical to
# the original 16-entry pool, so pad_levels<=16 fixtures are unchanged;
# levels up to 48 give the KB-scale "full-size source file" shape the
# payload-pruned scaling run uses). object dtype: a U-dtype pool would
# materialize max-width copies on fancy indexing


def _content(rng_ints: np.ndarray, keys: np.ndarray, lsns: np.ndarray,
             pad_levels: int = 16, pad_repeat: int = 1) -> np.ndarray:
    """Deterministic source-like text, length varying ~100..2000 chars.
    Fully vectorized: ONE numeric stringify (unique id folds key, lsn
    and rng draw) + a 16-entry pad pool — pure-python f-strings made
    10^7-event fixture generation the slowest step."""
    import pandas as pd

    uid = (rng_ints.astype(np.uint64) << np.uint64(24)) ^ \
        (lsns.astype(np.uint64) << np.uint64(4)) ^ (keys.astype(np.uint64) & np.uint64(15))
    head = np.char.add("def fn_", uid.astype("U20"))
    head = np.char.add(head, "(x):\n    return x\n")
    # final concat via pandas OBJECT dtype: np.char would pad every
    # element to the 2200-char max width at 4 bytes/char (≈9 KB/row)
    pad = pd.Series(_PAD_POOL[rng_ints % pad_levels], dtype=object)
    if pad_repeat > 1:
        # blob-scale contents (the payload-pruned exchange's regime):
        # elementwise str repeat keeps generation vectorized
        pad = pad * pad_repeat
    out = pd.Series(head, dtype=object) + pad
    return out.to_numpy()


def _commits(rng: np.random.Generator, n: int) -> list[str]:
    blob = rng.integers(0, 256, size=n * 20, dtype=np.uint8).tobytes().hex()
    return [blob[i * 40:(i + 1) * 40] for i in range(n)]


def generate_fixture(
    out_dir: str,
    n_events: int = 20_000,
    n_keys: int = 4_000,
    n_repos: int = 50,
    n_base: int = 2_000,
    seed: int = 42,
    zipf_a: float = 1.4,
    p_delete: float = 0.2,
    pad_levels: int = 16,
    pad_repeat: int = 1,
) -> dict:
    """``pad_levels`` bounds content size (16 → ~35..560 chars;
    1 → ~35 chars): small contents make the workload CPU-bound rather
    than memory-bandwidth-bound — used by the scaling benchmark, since
    a single VM's memory bus (unlike a real cluster's per-node buses)
    does not multiply with worker count.

    Writes base.parquet + changes_epoch{0,1,2}.parquet into out_dir;
    returns a manifest dict {base, epochs: [paths], n_events, ...}."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- key universe: repo popularity is Zipf-skewed ------------------
    repo_of_key = np.minimum(rng.zipf(zipf_a, size=n_keys) - 1, n_repos - 1)
    repos = np.array([f"org/repo_{i}" for i in range(n_repos)])
    paths = np.array([f"src/m{i % 97}/f_{i}.{LANGS[i % len(LANGS)]}" for i in range(n_keys)])

    # --- base table ----------------------------------------------------
    base_keys = rng.choice(n_keys, size=n_base, replace=False)
    base_r = rng.integers(1, 1 << 31, size=n_base)
    base = pa.table({
        "repo": pa.array(repos[repo_of_key[base_keys]]),
        "path": pa.array(paths[base_keys]),
        "commit": pa.array(_commits(rng, n_base)),
        "lang": pa.array([LANGS[k % len(LANGS)] for k in base_keys]),
        "content": pa.array(_content(base_r, base_keys, np.zeros(n_base, dtype=int), pad_levels, pad_repeat)),
    })
    base_path = os.path.join(out_dir, "base.parquet")
    pq.write_table(base, base_path, row_group_size=10_000)

    # --- change log: Zipf-hot keys, vectorized, CHUNKED ---------------
    # generated and written in ≤4M-event slices: a single-shot 64M-event
    # build materialized ~15 GB of transient unicode arrays and 64M
    # Python strings at once (>1 h); per-chunk memory is bounded and the
    # wall time is linear in events. Each chunk draws from its own
    # seeded stream → same args, same bytes, any chunk size aside.
    import pandas as pd

    chunk_events = 4_000_000
    bounds = [(0, n_events // 3), (n_events // 3, 2 * n_events // 3),
              (2 * n_events // 3, n_events)]
    epoch_paths = []
    for epoch, (lo_e, hi_e) in enumerate(bounds):
        p = os.path.join(out_dir, f"changes_epoch{epoch}.parquet")
        writer = None
        for lo in range(lo_e, hi_e, chunk_events):
            hi = min(lo + chunk_events, hi_e)
            m = hi - lo
            rng_c = np.random.default_rng([seed, 7, lo])
            ev_keys = np.minimum(rng_c.zipf(zipf_a, size=m) - 1, n_keys - 1)
            is_del = rng_c.random(m) < p_delete
            ops = np.where(is_del, "delete",
                           np.where(rng_c.random(m) < 0.5, "insert", "update"))
            lsns = np.arange(lo + 1, hi + 1, dtype=np.int64)
            ev_r = rng_c.integers(1, 1 << 31, size=m)
            contents = _content(ev_r, ev_keys, lsns, pad_levels, pad_repeat)
            commits = np.array(_commits(rng_c, m), dtype=object)
            langs = np.array(LANGS, dtype=object)[ev_keys % len(LANGS)]
            sizes_np = pd.Series(contents).str.len().to_numpy(dtype=np.int64)
            # delete events carry no payload (FIXTURES.md §3.2: null for delete)
            contents = np.where(is_del, None, contents)
            commits = np.where(is_del, None, commits)
            langs = np.where(is_del, None, langs)
            sizes = pd.array(sizes_np, dtype="Int64")
            sizes[is_del] = pd.NA
            cols = {
                "lsn": pa.array(lsns),
                "op": pa.array(ops.tolist()),
                "repo": pa.array(repos[repo_of_key[ev_keys]]),
                "path": pa.array(paths[ev_keys]),
                "commit": pa.array(commits),
                "content": pa.array(contents),
            }
            if epoch < 2:
                cols["lang"] = pa.array(langs)
            else:
                cols["language"] = pa.array(langs)  # renamed column
            if epoch == 1:
                cols["size"] = pa.array(sizes, type=pa.int32())
            elif epoch == 2:
                cols["size"] = pa.array(sizes, type=pa.int64())  # widened
            tbl = pa.table(cols)
            if writer is None:
                writer = pq.ParquetWriter(p, tbl.schema)
            # small row groups → Ray splits the file into parallel read tasks
            writer.write_table(tbl, row_group_size=10_000)
        if writer is not None:
            writer.close()
        else:
            # tiny n_events can make an epoch's range empty — still
            # write a schema'd zero-row file so the returned manifest
            # never references a path that doesn't exist (readers and
            # bench's warm loop crashed with FileNotFoundError)
            cols = {
                "lsn": pa.array([], pa.int64()),
                "op": pa.array([], pa.string()),
                "repo": pa.array([], pa.string()),
                "path": pa.array([], pa.string()),
                "commit": pa.array([], pa.string()),
                "content": pa.array([], pa.string()),
            }
            if epoch < 2:
                cols["lang"] = pa.array([], pa.string())
            else:
                cols["language"] = pa.array([], pa.string())
            if epoch == 1:
                cols["size"] = pa.array([], pa.int32())
            elif epoch == 2:
                cols["size"] = pa.array([], pa.int64())
            pq.write_table(pa.table(cols), p)
        epoch_paths.append(p)

    return {
        "base": base_path,
        "epochs": epoch_paths,
        "n_events": n_events,
        "n_keys": n_keys,
        "seed": seed,
    }


# ---------------------------------------------------------------------------
# oracle: single-process replay, the correctness reference for tests
# ---------------------------------------------------------------------------
def sha256_hex(s: str | None) -> str | None:
    if s is None:
        return None
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def oracle_apply(base_path: str, epoch_paths: list[str],
                 upto_lsn: int | None = None) -> dict[tuple[str, str], dict]:
    """Dict replay in LSN order → {(repo, path): final row dict} with
    unified-schema fields (language, size) and content_sha."""
    state: dict[tuple[str, str], dict] = {}
    base = pq.read_table(base_path).to_pylist()
    for r in base:
        key = (r["repo"], r["path"])
        state[key] = {
            "repo": r["repo"], "path": r["path"], "commit": r["commit"],
            "language": r["lang"], "content": r["content"], "size": None,
            "lsn": 0, "content_sha": sha256_hex(r["content"]),
        }
    events = []
    for p in epoch_paths:
        events.extend(pq.read_table(p).to_pylist())
    events.sort(key=lambda e: e["lsn"])
    for e in events:
        if upto_lsn is not None and e["lsn"] > upto_lsn:
            break
        key = (e["repo"], e["path"])
        if e["op"] == "delete":
            state.pop(key, None)
            continue
        state[key] = {
            "repo": e["repo"], "path": e["path"], "commit": e["commit"],
            "language": e.get("language", e.get("lang")),
            "content": e["content"],
            "size": int(e["size"]) if e.get("size") is not None else None,
            "lsn": int(e["lsn"]),
            "content_sha": sha256_hex(e["content"]),
        }
    return state
