"""ANN: brute-force cosine top-k baseline + IVF pruning path."""

import numpy as np
import pytest

from etlray.functions import ann as A
from etlray.sources import MemorySource


@pytest.fixture(scope="module")
def vec_rows():
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    return vecs, [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]


def _exact_topk(vecs, q, k):
    qu = q / np.linalg.norm(q)
    vu = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vu @ qu
    return set(np.argsort(-sims)[:k].tolist())


def test_brute_force_matches_numpy(vec_rows, ray_session):
    vecs, rows = vec_rows
    ds = MemorySource(rows).read()
    queries = vecs[:2]
    out = A.brute_force_topk(ds, queries, k=5).take_all()
    for qi in range(2):
        got = {r["vec_id"] for r in out if r["query_id"] == qi}
        assert got == _exact_topk(vecs, vecs[qi], 5)
    # self-match is rank 1 with cosine ~1
    best = max((r for r in out if r["query_id"] == 0), key=lambda r: r["cosine"])
    assert best["vec_id"] == 0 and best["cosine"] == pytest.approx(1.0, abs=1e-5)


def test_ivf_high_recall(vec_rows, ray_session):
    vecs, rows = vec_rows
    ds = MemorySource(rows).read()
    queries = vecs[:3]
    out = A.ivf_topk(ds, queries, k=5, n_clusters=8, nprobe=4).take_all()
    recalls = []
    for qi in range(3):
        got = {r["vec_id"] for r in out if r["query_id"] == qi}
        truth = _exact_topk(vecs, vecs[qi], 5)
        recalls.append(len(got & truth) / 5)
    assert np.mean(recalls) >= 0.6  # approximate, but far above random


def test_cosine_sim_join_exact(ray_session):
    import numpy as np

    from etlray.functions.ann import cosine_sim_join
    from etlray.sources import MemorySource

    rng = np.random.default_rng(3)
    v = rng.standard_normal(8).astype(np.float32)
    rows = [
        {"vec_id": 1, "embedding": v.tolist()},
        {"vec_id": 2, "embedding": (v * 2.0).tolist()},        # cosine 1
        {"vec_id": 3, "embedding": (-v).tolist()},             # cosine -1
        {"vec_id": 4, "embedding": rng.standard_normal(8).astype(np.float32).tolist()},
    ]
    out = cosine_sim_join(MemorySource(rows).read(), threshold=0.9).take_all()
    pairs = {(r["vec_id_a"], r["vec_id_b"]): r["cosine"] for r in out}
    assert pairs == {(1, 2): 1.0}
