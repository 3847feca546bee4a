"""Property tests for the payload-pruned exchange's locator math:
_split_file's (__src_file, __src_row) stamping, _fetch_file_payloads'
row-group-pruned reads, and _attach_contents' keyed scatter must agree
bit-for-bit for ANY row-group layout and need pattern."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from etlray.cdc.engine import _attach_contents, _fetch_file_payloads
from etlray.exchange import SRC_FILE_COL, SRC_ROW_COL, row_group_offsets


def _write_file(path: str, n_rows: int, rg_size: int, salt: int) -> list:
    contents = [f"content-{salt}-{i}" if i % 7 else None
                for i in range(n_rows)]
    t = pa.table({"content": pa.array(contents, type=pa.string())})
    pq.write_table(t, path, row_group_size=rg_size)
    return contents


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_fetch_and_attach_reconstruct_exactly(tmp_path_factory, data):
    tmp = tmp_path_factory.mktemp("prune_math")
    n_files = data.draw(st.integers(1, 3))
    layouts = []
    for fi in range(n_files):
        n_rows = data.draw(st.integers(1, 120))
        rg_size = data.draw(st.integers(1, 50))
        p = os.path.join(str(tmp), f"f{fi}.parquet")
        layouts.append((p, _write_file(p, n_rows, rg_size, fi)))

    nb = data.draw(st.integers(1, 4))
    # random need pattern: each bucket wants a random subset of rows
    # from random files
    need_tables = []
    expected = {}  # (file, row) -> content
    for b in range(nb):
        fs, rs = [], []
        for fi, (p, contents) in enumerate(layouts):
            k = data.draw(st.integers(0, len(contents)))
            rows = sorted(data.draw(st.sets(
                st.integers(0, len(contents) - 1),
                min_size=0, max_size=k)))
            for r in rows:
                fs.append(fi)
                rs.append(r)
                expected[(fi, r)] = contents[r]
        need_tables.append(pa.table({
            SRC_FILE_COL: pa.array(fs, type=pa.int32()),
            SRC_ROW_COL: pa.array(rs, type=pa.int64())}))

    # per-file fetch (exactly what the epoch orchestration submits)
    parts_by_bucket: list[list] = [[] for _ in range(nb)]
    for fi, (p, _c) in enumerate(layouts):
        outs = _fetch_file_payloads(p, fi, "content", None, nb,
                                    *need_tables)
        outs = outs if nb > 1 else [outs]
        for b, part in enumerate(outs):
            parts_by_bucket[b].append(part)

    for b in range(nb):
        parts = [p for p in parts_by_bucket[b] if p.num_rows]
        contents = pa.concat_tables(
            parts, promote_options="permissive") if parts else None
        nt = need_tables[b]
        # writer-side table: the bucket's rows with nulled content
        t = pa.table({
            SRC_FILE_COL: nt[SRC_FILE_COL],
            SRC_ROW_COL: nt[SRC_ROW_COL],
            "content": pa.nulls(nt.num_rows, type=pa.string()),
        })
        got = _attach_contents(t, contents, "content")
        assert SRC_FILE_COL not in got.column_names
        fs = nt[SRC_FILE_COL].to_pylist()
        rs = nt[SRC_ROW_COL].to_pylist()
        for fi, r, c in zip(fs, rs, got["content"].to_pylist()):
            assert c == expected[(fi, r)], (fi, r)


def test_row_group_offsets_matches_split_stamp(tmp_path, ray_session):
    """_split_file's locator stamping and row_group_offsets must agree:
    reading stamped chunks back in row-group order reproduces 0..n-1."""
    import ray

    from etlray.exchange import _split_file

    p = os.path.join(str(tmp_path), "f.parquet")
    n = 97
    pq.write_table(pa.table({"k": pa.array(range(n))}), p,
                   row_group_size=10)
    md = pq.ParquetFile(p).metadata
    sizes, starts = row_group_offsets(md)
    assert int(starts[-1]) == n and int(sizes.sum()) == n
    # stamp via the real split task, one chunk of all row groups
    parts = _split_file(p, list(range(md.num_row_groups)), ["k"], 1,
                        None, None, file_index=3)
    t = parts[0]
    assert t[SRC_FILE_COL].to_pylist() == [3] * n
    assert t[SRC_ROW_COL].to_pylist() == list(range(n))
    assert t["k"].to_pylist() == list(range(n))


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_chunked_take_matches_flat_take(data):
    """_chunked_take over arbitrary chunk layouts == combine-then-take.
    The production caller passes ascending unique indices (winning row
    ordinals), so that's the distribution generated here."""
    from etlray.cdc.engine import _chunked_take

    chunk_lens = data.draw(st.lists(st.integers(0, 7), min_size=1,
                                    max_size=6))
    n = sum(chunk_lens)
    vals, off = [], 0
    for ln in chunk_lens:
        vals.append(pa.array([f"v{off + i}" if (off + i) % 5 else None
                              for i in range(ln)], type=pa.string()))
        off += ln
    ca = pa.chunked_array(vals, type=pa.string())
    idx = np.array(sorted(data.draw(st.sets(
        st.integers(0, n - 1), max_size=n))), dtype=np.int64) \
        if n else np.array([], dtype=np.int64)
    got = _chunked_take(ca, idx)
    want = ca.combine_chunks().take(pa.array(idx))
    assert got.to_pylist() == want.to_pylist()
    assert got.type == want.type

def test_attach_contents_multi_slice_interleaved(monkeypatch):
    """The byte-bounded slice scatter (blob-scale fix: combining either
    side whole overflows int32 offsets >2 GB) must agree with the
    single-slice result for interleaved hit / carry-forward rows —
    including rows that already CARRY content (merge-mode base-snapshot
    rows have real payloads; only pruned event rows scatter)."""
    import etlray.cdc.engine as eng

    monkeypatch.setattr(eng, "_ATTACH_SLICE_BYTES", 20)  # → multi-row slices

    n = 20
    # even rows carry inline content (no locator), odd rows are pruned
    sf = [None if i % 2 == 0 else 0 for i in range(n)]
    rows = [None if i % 2 == 0 else i for i in range(n)]
    orig = [f"carry-{i}" if i % 2 == 0 else None for i in range(n)]
    t = pa.table({
        SRC_FILE_COL: pa.array(sf, type=pa.int32()),
        SRC_ROW_COL: pa.array(rows, type=pa.int64()),
        "content": pa.array(orig, type=pa.string()),
    })
    hit_rows = [i for i in range(n) if i % 2 == 1]
    contents = pa.table({
        SRC_FILE_COL: pa.array([0] * len(hit_rows), type=pa.int32()),
        SRC_ROW_COL: pa.array(hit_rows, type=pa.int64()),
        # multi-chunk content side to exercise _chunked_take per slice
        "content": pa.chunked_array([
            pa.array([f"fetched-{r}" for r in hit_rows[:4]]),
            pa.array([f"fetched-{r}" for r in hit_rows[4:]]),
        ]),
    })
    got = eng._attach_contents(t, contents, "content")
    want = [f"carry-{i}" if i % 2 == 0 else f"fetched-{i}"
            for i in range(n)]
    assert got["content"].to_pylist() == want
    assert got["content"].num_chunks >= 2  # sliced output stays chunked
    assert SRC_FILE_COL not in got.column_names


def test_setop_date32_keys(ray_session):
    """date32 (parquet's default DATE) set-op keys: the null fill must
    build from int32 — int64→date32 raises ArrowNotImplementedError."""
    import datetime

    import ray.data

    from etlray.stages import SetOpTransform

    d = datetime.date
    left = ray.data.from_arrow(pa.table({
        "d": pa.array([d(2024, 1, 1), d(2024, 1, 2), None],
                      type=pa.date32())}))
    right = ray.data.from_arrow(pa.table({
        "d": pa.array([d(2024, 1, 2), None], type=pa.date32())}))
    exc = [r["d"] for r in
           SetOpTransform(right, op="except").apply(left).take_all()]
    inter = sorted(
        (r["d"] for r in
         SetOpTransform(right, op="intersect").apply(left).take_all()),
        key=lambda v: (v is None, v))
    assert exc == [d(2024, 1, 1)]
    assert inter == [d(2024, 1, 2), None]


def test_fan_out_small_never_executes_unsized_plans(ray_session):
    """fan_out_small must stay metadata-only: Dataset.size_bytes()
    EXECUTES the plan when metadata can't infer a size (a map_batches
    output), which would materialize arbitrarily large inputs. An
    unsized plan must come back untouched without running the map fn."""
    import ray.data

    from etlray.stages.common import fan_out_small

    calls = {"n": 0}

    def bomb(t: pa.Table) -> pa.Table:
        calls["n"] += 1
        return t

    ds = ray.data.from_arrow(
        pa.table({"x": list(range(100))})).map_batches(
            bomb, batch_format="pyarrow")
    out = fan_out_small(ds)
    assert out is ds            # untouched: size unknown from metadata
    assert calls["n"] == 0      # and nothing executed driver-side


def test_attach_contents_skewed_rows_respect_byte_budget(monkeypatch):
    """Slice boundaries must come from CUMULATIVE ACTUAL bytes: with a
    global-mean step, a clustered run of huge rows inside one slice
    could exceed the int32-offset limit the slicing exists to avoid.
    Each output chunk's payload must stay <= max(budget, one row)."""
    import etlray.cdc.engine as eng

    budget = 2000
    monkeypatch.setattr(eng, "_ATTACH_SLICE_BYTES", budget)

    n = 60
    # tiny rows everywhere, a clustered run of huge rows in the middle
    sizes = [4] * 20 + [900] * 20 + [4] * 20
    sf = [0 if i % 3 == 0 else None for i in range(n)]
    rows = [i if i % 3 == 0 else None for i in range(n)]
    orig = [None if i % 3 == 0 else "o" * sizes[i] for i in range(n)]
    t = pa.table({
        SRC_FILE_COL: pa.array(sf, type=pa.int32()),
        SRC_ROW_COL: pa.array(rows, type=pa.int64()),
        "content": pa.array(orig, type=pa.string()),
    })
    hit_rows = [i for i in range(n) if i % 3 == 0]
    contents = pa.table({
        SRC_FILE_COL: pa.array([0] * len(hit_rows), type=pa.int32()),
        SRC_ROW_COL: pa.array(hit_rows, type=pa.int64()),
        "content": pa.array(["f" * sizes[r] for r in hit_rows]),
    })
    got = eng._attach_contents(t, contents, "content")
    want = [("f" if i % 3 == 0 else "o") * sizes[i] for i in range(n)]
    assert got["content"].to_pylist() == want
    col = got["content"]
    assert col.num_chunks >= 2
    max_row = max(sizes) * 2  # concat carries orig null + fetched value
    for ch in col.chunks:
        payload = sum(len(v) for v in ch.to_pylist() if v is not None)
        assert payload <= max(budget, max_row)
