"""Deterministic sampling and token-shard packing (SQL-oracled in
scripts/check_oracles.py: sample_docs_deterministic,
pack_token_shards_docs, corpus_clean)."""

import numpy as np
import pyarrow as pa

from etlray.functions.sampling import deterministic_sample, pack_token_shards
from etlray.sources import MemorySource


def test_deterministic_sample_stable_and_salted(ray_session):
    rows = [{"id": i} for i in range(2000)]
    a = deterministic_sample(MemorySource(rows).read(), "id", 0.3,
                             salt="s1").take_all()
    b = deterministic_sample(MemorySource(rows).read(), "id", 0.3,
                             salt="s1").take_all()
    # identical SELECTION (row order across blocks is not part of the
    # contract — Ray's preserve_order is off by default)
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)
    assert 0.2 < len(a) / 2000 < 0.4                      # ~rate
    c = deterministic_sample(MemorySource(rows).read(), "id", 0.3,
                             salt="s2").take_all()
    assert {r["id"] for r in a} != {r["id"] for r in c}   # salt changes mix


def test_deterministic_sample_sip_matches_rate(ray_session):
    rows = [{"id": i} for i in range(2000)]
    out = deterministic_sample(MemorySource(rows).read(), "id", 0.5,
                               method="sip").take_all()
    assert 0.4 < len(out) / 2000 < 0.6


def test_pack_token_shards_running_sum(ray_session):
    import ray.data

    # two blocks to exercise the cross-block offset
    t1 = pa.table({"doc": [0, 1, 2], "ntok": [400, 400, 400]})
    t2 = pa.table({"doc": [3, 4], "ntok": [400, 400]})
    ds = ray.data.from_arrow(t1).union(ray.data.from_arrow(t2))
    out = pack_token_shards(ds, "ntok", budget=1000).take_all()
    got = {r["doc"]: r["shard_idx"] for r in out}
    # exclusive cumsum: 0,400,800,1200,1600 -> //1000 = 0,0,0,1,1
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_zip_with_index_across_blocks(ray_session):
    import ray.data

    t1 = pa.table({"k": ["a", "b", "c"]})
    t2 = pa.table({"k": ["d", "e"]})
    ds = ray.data.from_arrow(t1).union(ray.data.from_arrow(t2))
    from etlray.functions.sampling import zip_with_index

    out = zip_with_index(ds).take_all()
    got = {r["k"]: r["row_idx"] for r in out}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}


def test_explode_with_ordinality(ray_session):
    import ray.data

    from etlray.stages import ExplodeTransform

    t = pa.table({"id": [1, 2, 3, 4],
                  "xs": [[10, 20], [], None, [30]]})
    ds = ray.data.from_arrow(t)
    out = ExplodeTransform("xs", out_col="x", with_ordinality=True) \
        .apply(ds).take_all()
    rows = sorted((r["id"], r["ordinality"], r["x"]) for r in out)
    # empty and null lists vanish (unnest semantics)
    assert rows == [(1, 0, 10), (1, 1, 20), (4, 0, 30)]


def test_weighted_sample_biased_and_deterministic(ray_session):
    import numpy as np

    from etlray.functions.sampling import weighted_sample
    from etlray.sources import MemorySource

    # 20 heavy docs (w=1000) vs 180 light (w=1): the sample should be
    # dominated by heavy ids, and two runs must agree exactly
    rows = [{"id": i, "w": 1000 if i < 20 else 1} for i in range(200)]
    a = weighted_sample(MemorySource(rows).read(), "id", "w", k=20,
                        salt="s").take_all()
    b = weighted_sample(MemorySource(rows).read(), "id", "w", k=20,
                        salt="s").take_all()
    ids_a = sorted(r["id"] for r in a)
    assert ids_a == sorted(r["id"] for r in b)
    assert len(ids_a) == 20
    heavy = sum(1 for i in ids_a if i < 20)
    assert heavy >= 15  # inclusion probability ∝ weight

    # zero/NULL weights are excluded
    rows2 = [{"id": 1, "w": 0}, {"id": 2, "w": None}, {"id": 3, "w": 5}]
    out = weighted_sample(MemorySource(rows2).read(), "id", "w",
                          k=3).take_all()
    assert [r["id"] for r in out] == [3]
