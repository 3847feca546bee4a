"""Wave-pipeline exchange: multi-wave results must equal single-wave
results (combine_fn is associative), applied counts must survive the
combine layer, and ordering must stay deterministic."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etlray.cdc.lww import lww_reduce
from etlray.exchange import hash_exchange, hash_exchange_files


def _events_table(n, n_keys, lsn0=0):
    return pa.table({
        "repo": [f"r{i % 7}" for i in range(n)],
        "path": [f"p{i % n_keys}" for i in range(n)],
        "lsn": pa.array([lsn0 + i for i in range(n)], type=pa.int64()),
        "op": ["insert"] * n,
    })


def _run(ds_or_paths, files, **kw):
    fn = hash_exchange_files if files else hash_exchange
    out = fn(ds_or_paths, ["repo", "path"], 4,
             reduce_fn=lambda t: lww_reduce(t, ["repo", "path"], "lsn"),
             **kw)
    df = out.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    return df[["repo", "path", "lsn"]]


def test_multiwave_matches_single_wave_dataset(ray_session):
    import ray.data

    t = _events_table(5_000, 40)
    ds1 = ray.data.from_arrow(t).repartition(16)
    ds2 = ray.data.from_arrow(t).repartition(16)
    single = _run(ds1, files=False, wave_tasks=1_000)
    multi = _run(ds2, files=False, wave_tasks=3,
                 combine_fn=lambda x: lww_reduce(x, ["repo", "path"], "lsn"))
    assert single.equals(multi)


def test_multiwave_matches_single_wave_files(ray_session, tmp_path):
    paths = []
    for i in range(6):
        p = str(tmp_path / f"ev-{i}.parquet")
        pq.write_table(_events_table(2_000, 30, lsn0=i * 2_000), p,
                       row_group_size=500)
        paths.append(p)
    single = _run(paths, files=True, rows_per_task=700, wave_tasks=1_000)
    multi = _run(paths, files=True, rows_per_task=700, wave_tasks=2,
                 combine_fn=lambda x: lww_reduce(x, ["repo", "path"], "lsn"))
    no_combine = _run(paths, files=True, rows_per_task=700, wave_tasks=2)
    assert single.equals(multi)
    assert single.equals(no_combine)


def test_applied_count_survives_combine_layer(ray_session, tmp_path):
    p = str(tmp_path / "ev.parquet")
    pq.write_table(_events_table(3_000, 10), p, row_group_size=250)

    def reduce_with_applied(t, bucket_id, applied):
        return pa.table({"bucket": pa.array([bucket_id], type=pa.int32()),
                         "applied": pa.array([applied], type=pa.int64())})

    for wave_tasks in (1_000, 2):  # single-wave fast path vs wave pipeline
        refs = hash_exchange_files(
            [p], ["repo", "path"], 4, reduce_with_applied,
            pass_bucket_id=True, pass_applied=True, as_refs=True,
            rows_per_task=250, wave_tasks=wave_tasks,
            combine_fn=lambda x: lww_reduce(x, ["repo", "path"], "lsn"))
        import ray
        stats = pa.concat_tables(ray.get(refs)).to_pandas()
        # every event lands in exactly one bucket; applied counts the rows
        # ENTERING each bucket (pre-combine), so they sum to the input size
        assert int(stats["applied"].sum()) == 3_000


def test_cdc_apply_multiwave_equivalence(ray_session, tmp_path):
    """Full engine apply with the wave pipeline forced on (tiny
    rows_per_task → many units) matches a plain single-wave apply."""
    import ray.data

    from etlray.cdc.engine import CDCEngine

    base = _events_table(500, 50)
    ev_path = str(tmp_path / "epoch1.parquet")
    pq.write_table(_events_table(4_000, 50, lsn0=500), ev_path,
                   row_group_size=100)

    tables = {}
    for name, knobs in (("a", {}),  # auto: single wave on this size
                        ("b", {"rows_per_task": 100, "wave_tasks": 3})):
        eng = CDCEngine(str(tmp_path / f"table_{name}"), num_buckets=8,
                        content_col="__none__", **knobs)
        eng.bootstrap(ray.data.from_arrow(base))
        eng.apply_log([ev_path], epoch_id=1)
        tables[name] = (eng.read_snapshot().to_pandas()
                        .sort_values(["repo", "path"]).reset_index(drop=True))
    assert tables["a"].equals(tables["b"])
    # 4000 events over 350 distinct (repo,path) keys → the final table
    # has one live row per key seen
    assert len(tables["b"]) == len(
        {(r, p) for r, p in zip(tables["b"]["repo"], tables["b"]["path"])})
