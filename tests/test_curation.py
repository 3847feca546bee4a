"""Corpus-curation operators (SQL-oracled in scripts/check_oracles.py:
decontaminate_docs, chunk_docs, split_train_val, top_ngrams_docs)."""

import numpy as np
import pyarrow as pa
import ray

from etlray.functions.curation import (
    KNUTH,
    assign_split,
    benchmark_grams,
    chunk_documents,
    contamination_hits,
    decontaminate,
    norm_tokens,
    token_ngrams,
    top_ngrams,
)
from etlray.sources import MemorySource


def test_norm_tokens_matches_sql_semantics():
    assert norm_tokens("  Hello\t\nWorld  ") == ["hello", "world"]
    assert norm_tokens("") == [""]          # string_split('', ' ') = ['']
    assert norm_tokens(None) == [""]
    assert token_ngrams(["a", "b", "c"], 2) == ["a b", "b c"]
    assert token_ngrams(["a"], 2) == []


def test_decontamination_finds_overlap(ray_session):
    bench_rows = [{"doc_id": 0, "text": "the quick brown fox jumps"}]
    corpus_rows = [
        {"doc_id": 1, "text": "a slow red dog sits quietly"},          # clean
        {"doc_id": 2, "text": "look the quick brown fox ran away"},    # hit
        {"doc_id": 3, "text": "QUICK  Brown\tFOX jumps high"},         # hit (norm)
    ]
    grams = benchmark_grams(MemorySource(bench_rows).read(), n=3)
    assert "the quick brown" in grams
    ref = ray.put(grams)
    hits = contamination_hits(MemorySource(corpus_rows).read(), ref, n=3)
    got = {r["doc_id"]: r["n_hits"] for r in hits.take_all()}
    assert set(got) == {2, 3}
    clean = decontaminate(MemorySource(corpus_rows).read(), ref, n=3)
    assert {r["doc_id"] for r in clean.take_all()} == {1}


def test_chunking_covers_text_with_overlap(ray_session):
    text = "x" * 1000
    ds = MemorySource([{"doc_id": 7, "text": text},
                       {"doc_id": 8, "text": ""}]).read()
    rows = sorted(chunk_documents(ds, size=500, stride=400).take_all(),
                  key=lambda r: (r["doc_id"], r["chunk_idx"]))
    d7 = [r for r in rows if r["doc_id"] == 7]
    assert [len(r["chunk"]) for r in d7] == [500, 500, 200]   # starts 0/400/800
    assert [r["chunk_idx"] for r in d7] == [0, 1, 2]
    d8 = [r for r in rows if r["doc_id"] == 8]
    assert len(d8) == 1 and d8[0]["chunk"] == ""              # empty → 1 empty chunk


def test_assign_split_deterministic_and_stratified():
    t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    out = assign_split(t)
    lab = out["split"].to_pylist()
    assert lab == assign_split(t)["split"].to_pylist()        # pure function
    ids = np.arange(1000, dtype=np.int64)
    expect = np.where((ids * KNUTH) % 10 == 0, "val", "train")
    assert lab == list(expect)
    frac = lab.count("val") / 1000
    assert 0.05 < frac < 0.15                                  # ~1/10


def test_top_ngrams_counts_and_tiebreak(ray_session):
    rows = [{"text": "a b c"}, {"text": "a b c"}, {"text": "a b d"}]
    out = top_ngrams(MemorySource(rows).read(), n=2, k=10).take_all()
    got = {(r["gram"], r["cnt"]) for r in out}
    assert ("a b", 3) in got and ("b c", 2) in got and ("b d", 1) in got
    # descending count, gram ascending on ties
    cnts = [r["cnt"] for r in out]
    assert cnts == sorted(cnts, reverse=True)
    assert isinstance(out[0]["cnt"], int)


def test_tfidf_top_terms_small(ray_session):
    from etlray.functions.curation import tfidf_top_terms
    from etlray.sources import MemorySource

    rows = [{"doc_id": 1, "text": "apple banana apple"},
            {"doc_id": 2, "text": "banana cherry"},
            {"doc_id": 3, "text": "cherry durian durian durian"}]
    out = tfidf_top_terms(MemorySource(rows).read(), k=2).take_all()
    import math

    got = {(r["doc_id"], r["term"]): r["tfidf"] for r in out}
    # 'apple' appears twice in doc 1 and nowhere else: tf=2, df=1
    assert got[(1, "apple")] == round(2 * math.log(3 / 1), 6)
    # 'banana' is in two docs: df=2
    assert got[(1, "banana")] == round(1 * math.log(3 / 2), 6)
    assert got[(3, "durian")] == round(3 * math.log(3 / 1), 6)
    per_doc = {}
    for d, _ in got:
        per_doc[d] = per_doc.get(d, 0) + 1
    assert all(v == 2 for v in per_doc.values())  # k=2 rows per doc


def test_approx_top_ngrams_matches_exact_below_capacity(ray_session):
    from etlray.functions.curation import approx_top_ngrams, top_ngrams
    from etlray.sources import MemorySource

    rows = [{"text": "the cat sat on the mat"},
            {"text": "the cat sat on the rug"},
            {"text": "a dog ran in the park"}] * 4
    ds = MemorySource(rows).read()
    exact = top_ngrams(ds, n=3, k=5).take_all()
    approx = approx_top_ngrams(MemorySource(rows).read(), n=3, k=5,
                               capacity=1 << 12).to_pylist()
    assert [(r["gram"], r["cnt"]) for r in exact] == \
        [(r["gram"], r["cnt"]) for r in approx]
