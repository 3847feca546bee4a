"""Delta-tier apply (LSM-style): ``apply_log(mode="delta")`` writes the
epoch's net per-key effect as per-bucket DELTA files instead of
rewriting touched buckets; reads merge base+deltas on the fly;
``checkpoint()`` folds stacks back into base files.

Correctness bar: every scenario must produce a final table IDENTICAL
to the plain merge-mode replay / the single-process oracle — including
deletes (tombstones survive in delta files until the fold) and schema
evolution arriving mid-stack.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from etlray.cdc.engine import CDCEngine
from etlray.cdc.fixture import RENAME_MAP, generate_fixture, oracle_apply

N_EVENTS = 3000


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("delta_fixture")
    return generate_fixture(str(d), n_events=N_EVENTS, n_keys=600,
                            n_base=300, seed=7)


def _state(engine: CDCEngine, **kw) -> dict[tuple[str, str], dict]:
    ds = engine.read_snapshot(**kw)
    table = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    out = {}
    for r in table.to_pylist():
        out[(r["repo"], r["path"])] = r
    assert len(out) == table.num_rows, "duplicate keys in final table!"
    return out


def _boot(tmp_path, name, **kw):
    import ray.data

    eng = CDCEngine(str(tmp_path / name), num_buckets=8,
                    rename_map=RENAME_MAP, **kw)
    return eng


def test_delta_replay_matches_oracle_and_merge(fixture_dir, tmp_path, ray_session):
    import ray.data

    delta = _boot(tmp_path, "delta", max_delta_depth=None)
    delta.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        r = delta.apply_log(p, epoch_id=i, mode="delta")
        assert r["committed"]
    assert delta.manifest.snapshot_deltas(), "delta stacks expected"

    merge = _boot(tmp_path, "merge")
    merge.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        merge.apply_log(p, epoch_id=i)

    a, b = _state(delta), _state(merge)
    assert set(a) == set(b)
    for k in a:
        assert a[k]["content_sha"] == b[k]["content_sha"], k
        assert a[k]["lsn"] == b[k]["lsn"], k

    oracle = oracle_apply(fixture_dir["base"], fixture_dir["epochs"])
    assert set(a) == set(oracle)
    for k, orow in oracle.items():
        assert a[k]["content_sha"] == orow["content_sha"], k


def test_checkpoint_folds_stack(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = _boot(tmp_path, "ckpt", max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        eng.apply_log(p, epoch_id=i, mode="delta")
    before = _state(eng)

    res = eng.checkpoint("fold-1")
    assert res["committed"] and res["folded_buckets"] > 0
    assert eng.manifest.snapshot_deltas() == {}
    assert _state(eng) == before  # fold is a pure representation change

    # idempotent: nothing left to fold
    assert eng.checkpoint("fold-2")["committed"] is False


def test_auto_checkpoint_bounds_depth(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = _boot(tmp_path, "auto", max_delta_depth=2)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        eng.apply_log(p, epoch_id=i, mode="delta")
        depth = max((len(v) for v in
                     eng.manifest.snapshot_deltas().values()), default=0)
        assert depth < 2, "auto-checkpoint must fold at the threshold"

    oracle = oracle_apply(fixture_dir["base"], fixture_dir["epochs"])
    a = _state(eng)
    assert set(a) == set(oracle)
    for k, orow in oracle.items():
        assert a[k]["content_sha"] == orow["content_sha"], k


def test_merge_apply_folds_touched_buckets(fixture_dir, tmp_path, ray_session):
    """A merge-mode epoch on a table with outstanding deltas must fold
    the touched buckets' stacks in (not lose them)."""
    import ray.data

    eng = _boot(tmp_path, "mixed", max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    eng.apply_log(fixture_dir["epochs"][0], epoch_id=0, mode="delta")
    eng.apply_log(fixture_dir["epochs"][1], epoch_id=1, mode="merge")
    eng.apply_log(fixture_dir["epochs"][2], epoch_id=2, mode="delta")

    merge = _boot(tmp_path, "mixed_ref")
    merge.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        merge.apply_log(p, epoch_id=i)

    a, b = _state(eng), _state(merge)
    assert set(a) == set(b)
    for k in a:
        assert a[k]["content_sha"] == b[k]["content_sha"], k


def test_delta_duplicate_delivery_noop(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = _boot(tmp_path, "dup", max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    r1 = eng.apply_log(fixture_dir["epochs"][0], epoch_id=0, mode="delta")
    assert r1["committed"]
    before = _state(eng)
    # same id → manifest no-op; new id, same events → watermark no-op
    assert eng.apply_log(fixture_dir["epochs"][0], epoch_id=0,
                         mode="delta")["committed"] is False
    r3 = eng.apply_log(fixture_dir["epochs"][0], epoch_id="dup-again",
                       mode="delta")
    assert r3["committed"] and r3["touched_buckets"] == 0
    assert _state(eng) == before


def test_read_pushdown_through_merge_on_read(fixture_dir, tmp_path, ray_session):
    import pyarrow.dataset as pads
    import ray.data

    eng = _boot(tmp_path, "push", max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        eng.apply_log(p, epoch_id=i, mode="delta")

    full = _state(eng)
    cols = _state(eng, columns=["repo", "path", "lsn", "content_sha"])
    assert set(cols) == set(full)
    k = next(iter(cols))
    assert set(cols[k]) == {"repo", "path", "lsn", "content_sha"}
    for k in full:
        assert cols[k]["content_sha"] == full[k]["content_sha"]

    pred = pads.field("language") == "py"
    filt = _state(eng, predicate=pred)
    expect = {k: v for k, v in full.items() if v.get("language") == "py"}
    assert set(filt) == set(expect)

    # predicate over a column OUTSIDE the projection: the pruned
    # merge-on-read must still fetch the predicate's columns
    both = _state(eng, columns=["repo", "path", "content_sha"],
                  predicate=pred)
    assert set(both) == set(expect)
    k = next(iter(both))
    assert set(both[k]) == {"repo", "path", "content_sha"}
    for k in expect:
        assert both[k]["content_sha"] == expect[k]["content_sha"]


def test_vacuum_keeps_referenced_delta_files(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = _boot(tmp_path, "vac", max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        eng.apply_log(p, epoch_id=i, mode="delta")
    before = _state(eng)
    eng.vacuum(keep_last=1)
    assert _state(eng) == before  # referenced base + delta files survive


def test_rebalance_folds_delta_stacks(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = _boot(tmp_path, "rebal", max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        eng.apply_log(p, epoch_id=i, mode="delta")
    assert eng.manifest.snapshot_deltas(), "delta stacks expected"
    before = _state(eng)

    r = eng.rebalance(16)
    assert r["committed"] and eng.num_buckets == 16
    # the rebalanced epoch reads THROUGH the stacks (merge-on-read)
    # and commits plain base files — no deltas survive the rewrite
    assert eng.manifest.snapshot_deltas() == {}
    assert _state(eng) == before


def test_compact_preserves_delta_stacks(fixture_dir, tmp_path, ray_session):
    import ray.data

    eng = _boot(tmp_path, "cmpd", max_delta_depth=None)
    eng.bootstrap(ray.data.read_parquet(fixture_dir["base"]))
    for i, p in enumerate(fixture_dir["epochs"]):
        eng.apply_log(p, epoch_id=i, mode="delta")
    before = _state(eng)
    stacks = eng.manifest.snapshot_deltas()
    assert stacks

    r = eng.compact(group_size=4)
    assert r["committed"]
    # compaction merges BASE files only; the stacks carry through and
    # merge-on-read still applies them over the new group files
    assert eng.manifest.snapshot_deltas().keys() == stacks.keys()
    assert _state(eng) == before


def test_predicate_probe_error_text_pinned():
    """The merge-on-read predicate-column probe (etlray/cdc/engine.py
    predicate_cols) regex-parses pyarrow's ``No match for
    FieldRef.Name(...)`` error text to discover filter columns. A
    pyarrow upgrade that rewords the message would silently degrade
    every pruned merge-on-read to all-columns (correctness-safe, perf
    loss) — pin the installed pyarrow's wording so the upgrade fails
    HERE instead."""
    import re

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    schema = pa.schema([pa.field("other", pa.int64())])
    with pytest.raises(Exception) as ei:
        pads.InMemoryDataset(schema.empty_table()).to_table(
            filter=pc.field("some_col") > 1)
    m = re.search(r"No match for FieldRef\.Name\(([^)]*)\)", str(ei.value))
    assert m is not None, (
        "pyarrow reworded the FieldRef error — update the probe regex "
        f"in etlray/cdc/engine.py. Got: {ei.value}")
    assert m.group(1) == "some_col"
