"""Dedup family: exact, MinHash-LSH, SimHash, embedding-cosine."""

import numpy as np
import pytest

from etlray.functions import dedup as D
from etlray.sources import MemorySource


@pytest.fixture()
def corpus_ds():
    base = ("the quick brown fox jumps over the lazy dog "
            "and then runs far away into the deep green forest")
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                       # exact dup of 1
        {"doc_id": 3, "text": base + " tonight"},          # near dup of 1
        {"doc_id": 4, "text": "completely unrelated text about databases "
                              "and distributed query engines at scale"},
        {"doc_id": 5, "text": base},                       # exact dup of 1
    ]
    return MemorySource(rows).read()


def test_exact_dedup_keeps_min_id(corpus_ds, ray_session):
    out = D.exact_dedup(corpus_ds, num_buckets=4).take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3, 4]  # 2 and 5 collapse into 1


def test_minhash_lsh_finds_near_dups(corpus_ds, ray_session):
    pairs = D.minhash_lsh_candidates(corpus_ds, jaccard_threshold=0.7,
                                     bands=16, num_perm=64).take_all()
    got = {(r["doc_id"], r["dup_of"]) for r in pairs}
    assert (2, 1) in got and (5, 1) in got      # exact dups always surface
    assert (3, 1) in got                        # near dup caught
    assert all(r["dup_of"] != 4 and r["doc_id"] != 4 for r in pairs)


def test_minhash_bands_not_dividing_num_perm(corpus_ds, ray_session):
    # 64 perms / 12 bands → 5 rows per band, 4 trailing perms unused —
    # valid under the pre-vectorization byte-slicing banding and must
    # stay valid (regression: reshape ValueError in _band_hash_matrix)
    pairs = D.minhash_lsh_candidates(corpus_ds, jaccard_threshold=0.7,
                                     bands=12, num_perm=64).take_all()
    got = {(r["doc_id"], r["dup_of"]) for r in pairs}
    assert (2, 1) in got and (5, 1) in got


def test_simhash_exact_groups(corpus_ds, ray_session):
    pairs = D.simhash_dup_groups(corpus_ds).take_all()
    got = {(r["doc_id"], r["dup_of"]) for r in pairs}
    assert (2, 1) in got and (5, 1) in got


def test_simhash_near_bits():
    a = D.simhash64("the quick brown fox jumps over the lazy dog")
    b = D.simhash64("the quick brown fox jumps over the lazy cat")
    c = D.simhash64("totally different content here entirely")
    ham_ab = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    ham_ac = bin((a ^ c) & ((1 << 64) - 1)).count("1")
    assert ham_ab < ham_ac


def test_embedding_near_dups(ray_session):
    rng = np.random.default_rng(0)
    v1 = rng.standard_normal(16).astype(np.float32)
    rows = [
        {"vec_id": 1, "embedding": v1.tolist()},
        {"vec_id": 2, "embedding": (v1 + 0.001).tolist()},     # near dup
        {"vec_id": 3, "embedding": rng.standard_normal(16).astype(np.float32).tolist()},
    ]
    ds = MemorySource(rows).read()
    pairs = D.embedding_near_dups(ds, cosine_threshold=0.99).take_all()
    got = {(r["vec_id"], r["dup_of"]) for r in pairs}
    assert (2, 1) in got
    assert not any(3 in p for p in got)


def test_ngram_jaccard_pairs_exact(corpus_ds, ray_session):
    out = D.ngram_jaccard_pairs(corpus_ds, threshold=0.7).take_all()
    got = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in out}
    assert got[(1, 2)] == 1.0 and got[(1, 5)] == 1.0 and got[(2, 5)] == 1.0
    assert 0.7 <= got[(1, 3)] < 1.0          # near dup, exact value
    assert not any(4 in p for p in got)      # unrelated doc never pairs
    # exact symmetric ground truth: J(1,3) via the same shingle sets
    s1 = D.codepoint_shingles(corpus_ds.take_all()[0]["text"])
    s3 = D.codepoint_shingles(corpus_ds.take_all()[2]["text"])
    inter = len(np.intersect1d(s1, s3, assume_unique=True))
    assert got[(1, 3)] == pytest.approx(inter / (len(s1) + len(s3) - inter))


def test_codepoint_shingles_short_and_unicode():
    assert len(D.codepoint_shingles("ab")) == 1        # padded single shingle
    a = D.codepoint_shingles("你好世界你好世界")
    b = D.codepoint_shingles("你好世界你好世界")
    assert np.array_equal(a, b)


def test_dup_clusters_transitive(ray_session):
    # pairs: 1-2, 2-3 (one component), 7-9 (another); 5 absent
    import ray.data

    pairs = ray.data.from_items([
        {"doc_id": 2, "dup_of": 1},
        {"doc_id": 3, "dup_of": 2},
        {"doc_id": 9, "dup_of": 7},
    ])
    out = D.dup_clusters(pairs).take_all()
    got = {(r["doc_id"], r["canonical_id"]) for r in out}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}


def test_dup_clusters_root_only_node_kept(ray_session):
    # a node that is only ever a union root must still appear
    import ray.data

    pairs = ray.data.from_items([{"doc_id": 8, "dup_of": 5}])
    out = D.dup_clusters(pairs).take_all()
    assert {(r["doc_id"], r["canonical_id"]) for r in out} == {(5, 5), (8, 5)}


def test_keep_canonical_filters_corpus(corpus_ds, ray_session):
    pairs = D.minhash_lsh_candidates(corpus_ds, jaccard_threshold=0.8)
    members = D.dup_clusters(pairs)
    kept = D.keep_canonical(corpus_ds, members).take_all()
    ids = sorted(r["doc_id"] for r in kept)
    # 1,2,3,5 form one near-dup cluster (canonical 1); 4 is unrelated
    assert ids == [1, 4]


def test_dup_clusters_empty_pairs(ray_session):
    import pyarrow as pa
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "dup_of": pa.array([], type=pa.int64())}))
    members = D.dup_clusters(empty)
    assert members.count() == 0
    docs = ray.data.from_items([{"doc_id": 1, "text": "x"}])
    assert D.keep_canonical(docs, members).count() == 1  # passthrough

def test_dup_clusters_distributed_matches_unionfind(ray_session):
    # a long chain (multi-round propagation), a star, and a singleton pair
    import ray.data

    chain = [{"doc_id": i + 1, "dup_of": i} for i in range(100, 112)]
    star = [{"doc_id": i, "dup_of": 500} for i in (501, 502, 503)]
    pairs = ray.data.from_items(chain + star + [{"doc_id": 9, "dup_of": 7}])
    want = sorted((r["doc_id"], r["canonical_id"])
                  for r in D._dup_clusters_unionfind(
                      pairs.materialize(), "doc_id", "dup_of").take_all())
    got = sorted((r["doc_id"], r["canonical_id"])
                 for r in D.dup_clusters_distributed(
                     pairs, num_buckets=4).take_all())
    assert got == want
    # dispatcher picks the distributed path when forced
    forced = sorted((r["doc_id"], r["canonical_id"])
                    for r in D.dup_clusters(
                        pairs, driver_pair_limit=0).take_all())
    assert forced == want


def test_dup_clusters_distributed_empty(ray_session):
    import pyarrow as pa
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "dup_of": pa.array([], type=pa.int64())}))
    assert D.dup_clusters(empty, driver_pair_limit=0).count() == 0


def test_dup_clusters_distributed_end_to_end(corpus_ds, ray_session):
    # same corpus as test_keep_canonical_filters_corpus, distributed path
    pairs = D.minhash_lsh_candidates(corpus_ds, jaccard_threshold=0.8)
    members = D.dup_clusters(pairs, driver_pair_limit=0)
    kept = D.keep_canonical(corpus_ds, members).take_all()
    assert sorted(r["doc_id"] for r in kept) == [1, 4]

def test_embedding_near_dups_multiband_recall(ray_session):
    # 150 planted pairs at cosine 0.95-0.97 — the threshold-boundary
    # band where the round-2 single 12-plane code had ~28% recall;
    # multi-band OR (r=8, B=16) must catch >=95% (expected ~1-1e-4)
    import ray.data

    rng = np.random.default_rng(42)
    n, d = 150, 64
    base = rng.standard_normal((n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    target = rng.uniform(0.951, 0.97, size=n).astype(np.float32)
    w = rng.standard_normal((n, d)).astype(np.float32)
    w -= (w * base).sum(axis=1, keepdims=True) * base     # orthogonalize
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    partner = target[:, None] * base + np.sqrt(1 - target[:, None] ** 2) * w
    vecs = np.concatenate([base, partner])
    ids = np.concatenate([np.arange(n), np.arange(n) + 10_000])
    ds = ray.data.from_items([
        {"vec_id": int(i), "embedding": v.tolist()}
        for i, v in zip(ids, vecs)])
    out = D.embedding_near_dups(ds, cosine_threshold=0.95).take_all()
    got = {(min(r["vec_id"], r["dup_of"]), max(r["vec_id"], r["dup_of"]))
           for r in out}
    # exact cosines of the planted pairs (float32 arithmetic drifts a
    # hair off `target`, so recompute which pairs truly qualify)
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    planted_cos = (u[:n] * u[n:]).sum(axis=1)
    qualifying = {(i, i + 10_000) for i in np.flatnonzero(planted_cos >= 0.95)}
    caught = len(qualifying & got)
    assert caught / max(len(qualifying), 1) >= 0.95
    # precision is exact by construction: every emitted pair's true
    # cosine must clear the threshold
    sim = u @ u.T
    idx = {int(v): k for k, v in enumerate(ids)}
    assert all(sim[idx[a], idx[b]] >= 0.95 - 1e-6 for a, b in got)


def _planted_pairs(n, d, seed=42):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    target = rng.uniform(0.951, 0.97, size=n).astype(np.float32)
    w = rng.standard_normal((n, d)).astype(np.float32)
    w -= (w * base).sum(axis=1, keepdims=True) * base
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    partner = target[:, None] * base + \
        np.sqrt(1 - target[:, None] ** 2) * w
    vecs = np.concatenate([base, partner])
    ids = np.concatenate([np.arange(n), np.arange(n) + 10_000])
    return ids, vecs


def test_embedding_code_only_matches_inline(ray_session):
    """candidates="code_only" (4-exchange vector-fetch verify) must
    emit the SAME pair set as "inline" with cosines equal to float32
    rounding — only the routing differs (round-3 VERDICT #5)."""
    import ray.data

    ids, vecs = _planted_pairs(60, 32, seed=7)
    ds = ray.data.from_items([
        {"vec_id": int(i), "embedding": v.tolist()}
        for i, v in zip(ids, vecs)])

    def run(mode):
        out = D.embedding_near_dups(ds, cosine_threshold=0.95,
                                    candidates=mode).take_all()
        return {(r["vec_id"], r["dup_of"]): r["cosine"] for r in out}

    inline, code_only = run("inline"), run("code_only")
    assert set(inline) == set(code_only)
    for k in inline:
        assert abs(inline[k] - code_only[k]) < 1e-5


def test_embedding_code_only_recall_dim512(ray_session):
    """Wide vectors: auto mode must dispatch to code_only
    (512·4·16 = 32 KiB/row > 16 KiB limit) and keep the multi-band
    recall bar at dim-512."""
    import ray.data

    n = 80
    ids, vecs = _planted_pairs(n, 512)
    ds = ray.data.from_items([
        {"vec_id": int(i), "embedding": v.tolist()}
        for i, v in zip(ids, vecs)])
    assert D._peek_vector_dim(ds, "embedding") == 512
    out = D.embedding_near_dups(ds, cosine_threshold=0.95).take_all()
    got = {(min(r["vec_id"], r["dup_of"]), max(r["vec_id"], r["dup_of"]))
           for r in out}
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    planted_cos = (u[:n] * u[n:]).sum(axis=1)
    qualifying = {(i, i + 10_000)
                  for i in np.flatnonzero(planted_cos >= 0.95)}
    assert len(qualifying & got) / max(len(qualifying), 1) >= 0.95
    # precision: every emitted pair's true cosine clears the threshold
    sim = u @ u.T
    idx = {int(v): k for k, v in enumerate(ids)}
    assert all(sim[idx[a], idx[b]] >= 0.95 - 1e-5 for a, b in got)


def test_ngram_jaccard_dense_matches_sparse(ray_session):
    """The dense matmul fast path and the inverted-index path must
    produce identical pairs AND identical float64 jaccard values (c is
    an exact integer below 2^24 in float32, so the J division sees the
    same operands on both paths)."""
    import ray.data

    from etlray.functions.dedup import ngram_jaccard_pairs

    rows = [{"doc_id": 1, "text": "the quick brown fox jumps over it"},
            {"doc_id": 2, "text": "the quick brown fox jumps over itx"},
            {"doc_id": 3, "text": "a completely different document body"},
            {"doc_id": 4, "text": "the quick brown fox jumps over it"},
            {"doc_id": 5, "text": None},
            {"doc_id": 6, "text": "a completely different document bodz"}]

    def run(dense):
        ds = ray.data.from_items(rows)
        out = ngram_jaccard_pairs(ds, threshold=0.5, dense=dense).take_all()
        return sorted((r["doc_id_a"], r["doc_id_b"], r["jaccard"])
                      for r in out)

    d, s = run(True), run(False)
    assert d == s and len(d) >= 2
    assert all(a < b for a, b, _ in d)
