"""Corpus-curation operators for training-data pipelines.

Benchmark decontamination, fixed-stride chunking, deterministic
stratified splits and global n-gram statistics — the stages between
raw-corpus dedup and token-shard packing that a 100 TB pretraining
pipeline needs. All operators are map_batches-first: tokenization and
gram extraction run per Arrow batch with numpy partial-combine, so the
only all-to-all is the final (tiny) count aggregate.

No reference counterpart (silvanoneto/etl-rs stops at generic
transforms, src/transform/common.rs); semantics follow the public
Gopher / Llama data-prep recipes (token-n-gram decontamination against
held-out benchmark sets; fixed-stride character chunking;
multiplicative-hash train/val splits).

Scale notes (100 TB):
* Decontamination broadcasts the benchmark gram set once via
  ``ray.put`` — correct when the benchmark is ≪ the corpus (the normal
  case: benchmarks are MBs, corpora are TBs). If the benchmark itself
  were huge, swap the broadcast for a gram-hash-partitioned semi-join
  through ``hash_exchange`` instead.
* Chunking and split assignment are embarrassingly parallel (no
  shuffle at all); output is ∝ input per batch.
* ``top_ngrams`` pre-counts per batch (np.unique partial combine)
  before one hash aggregate over unique grams, then sorts only the
  aggregated table — never raw gram occurrences.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray

# RE2's \s is exactly [\t\n\f\r ] — narrower than Python re's Unicode
# \s (no \v, no U+00A0, …). Both the DuckDB oracle and the Arrow
# kernels in norm_tokens_list run RE2, so the Python helper must use
# the RE2 class or the two tokenizers diverge on Unicode whitespace.
_WS = re.compile(r"[\t\n\f\r ]+")


def norm_tokens(text: str | None) -> list[str]:
    """lower → collapse whitespace → trim → split(' ').

    Exactly mirrors the oracle SQL
    ``string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ')``
    so gram strings compare byte-equal between engines — including on
    Unicode whitespace, which RE2's ``\\s`` does NOT match (see _WS).
    """
    if text is None:
        return [""]
    return _WS.sub(" ", text.lower()).strip(" ").split(" ")


def token_ngrams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def norm_tokens_list(col) -> pa.ListArray:
    """Vectorized ``norm_tokens`` over a whole column → list<string>:
    utf8_lower → RE2 ``\\s+``-collapse → trim → split(' '), all Arrow
    C kernels (and RE2 is the SAME engine the DuckDB oracle runs, so
    the token streams agree byte-for-byte — verified against the
    per-doc Python path over every fixture doc). Null texts tokenize
    like ``norm_tokens(None)`` = [""]."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.fill_null(pc.cast(col, pa.string()), "")
    s = pc.utf8_lower(s)
    s = pc.replace_substring_regex(s, r"\s+", " ")
    s = pc.utf8_trim(s, " ")
    out = pc.split_pattern(s, pattern=" ")
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def gram_array(tokens: pa.ListArray, n: int):
    """Vectorized token-n-gram assembly over a batch: the flattened
    token array is joined elementwise against its n shifted slices
    (one C kernel call), and window positions straddling a doc
    boundary are masked out. Returns ``(grams StringArray, doc_index
    int64 ndarray)`` — per-doc Python loops never touch the hot path."""
    import pyarrow.compute as pc

    offs = tokens.offsets.to_numpy().astype(np.int64)
    base = int(offs[0])
    offs = offs - base
    w = int(offs[-1]) - n + 1
    if w <= 0:
        return pa.array([], type=pa.string()), np.array([], dtype=np.int64)
    vals = tokens.values
    parts = [vals.slice(base + j, w) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    starts = np.arange(w)
    doc_of = np.searchsorted(offs, starts, side="right") - 1
    valid = starts + n <= offs[doc_of + 1]
    if valid.all():
        return grams, doc_of
    return grams.filter(pa.array(valid)), doc_of[valid]


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------
def benchmark_grams(ds, n: int, text_col: str = "text") -> frozenset[str]:
    """Distinct token n-grams of the (small) benchmark dataset.

    Gram extraction runs distributed per batch with per-batch
    dedup; only unique gram strings come back to the driver."""
    def grams(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g, _doc = gram_array(norm_tokens_list(t[text_col]), n)
        return pa.table({"gram": pc.unique(g)})

    acc: set[str] = set()
    for b in ds.map_batches(grams, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        acc.update(b["gram"].to_pylist())
    return frozenset(acc)


class _ContaminationStage:
    """Actor-pool stage: the broadcast gram set is fetched,
    deserialized and hash-indexed ONCE per actor in ``__init__`` (a
    bare ``ray.get`` inside the batch fn would re-deserialize the
    whole set per batch, and a per-batch ``pc.is_in`` would rebuild
    the benchmark hash table per batch — the pandas Index builds its
    table once and caches it). Per batch, membership is one O(grams)
    C lookup pass over the vectorized gram stream."""

    def __init__(self, bench_ref, n: int, id_col: str, text_col: str,
                 mode: str) -> None:
        import pandas as pd

        bench = ray.get(bench_ref) \
            if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        self.bench_index = pd.Index(np.asarray(sorted(bench), dtype=object))
        self.bench_index.get_indexer_for(np.array(["_warm"], dtype=object))
        self.n = n
        self.id_col = id_col
        self.text_col = text_col
        self.mode = mode

    def __call__(self, t: pa.Table) -> pa.Table:
        grams, doc_of = gram_array(norm_tokens_list(t[self.text_col]),
                                   self.n)
        n_docs = t.num_rows
        if len(doc_of) == 0:
            hit = np.array([], dtype=bool)
        else:
            gnp = grams.to_numpy(zero_copy_only=False)
            hit = self.bench_index.get_indexer_for(gnp) >= 0
        if self.mode == "hits":
            # count DISTINCT hitting grams per doc: hits are rare, so
            # dedupe only the hit subset. The id column keeps the
            # CALLER's type (hardcoded int64 crashed string/uuid ids
            # and skewed the empty-batch schema — same contract as
            # _TfidfStage)
            idtype = t.schema.field(self.id_col).type
            ida = t[self.id_col]
            if isinstance(ida, pa.ChunkedArray):
                ida = ida.combine_chunks()
            if not hit.any():
                return pa.table({self.id_col: pa.array([], idtype),
                                 "n_hits": pa.array([], pa.int64())})
            import pandas as pd

            hd = pd.DataFrame({"d": doc_of[hit], "g": gnp[hit]})
            per_doc = hd.drop_duplicates().groupby("d", sort=True).size()
            return pa.table({
                self.id_col: ida.take(pa.array(per_doc.index.to_numpy())),
                "n_hits": pa.array(per_doc.to_numpy(), pa.int64())})
        contam = np.zeros(n_docs, dtype=bool)
        if hit.any():
            contam[np.unique(doc_of[hit])] = True
        return t.filter(pa.array(~contam))


def contamination_hits(ds, bench_ref, n: int, id_col: str = "doc_id",
                       text_col: str = "text", concurrency: int = 2):
    """Per doc: how many of its DISTINCT n-grams appear in the
    benchmark set. Docs with zero hits are dropped (they're clean)."""
    return ds.map_batches(_ContaminationStage, batch_format="pyarrow",
                          fn_constructor_args=(bench_ref, n, id_col,
                                               text_col, "hits"),
                          concurrency=concurrency)


def decontaminate(ds, bench_ref, n: int, id_col: str = "doc_id",
                  text_col: str = "text", concurrency: int = 2):
    """Corpus minus every doc sharing ≥1 token n-gram with the benchmark."""
    return ds.map_batches(_ContaminationStage, batch_format="pyarrow",
                          fn_constructor_args=(bench_ref, n, id_col,
                                               text_col, "filter"),
                          concurrency=concurrency)


# ---------------------------------------------------------------------------
# fixed-stride chunking (context-window preparation)
# ---------------------------------------------------------------------------
def chunk_documents(ds, size: int = 500, stride: int = 400,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Overlapping character chunks: starts 0, stride, 2·stride, …
    while start < max(len, 1); each chunk is text[start:start+size].

    Empty docs emit one empty chunk (parity with the oracle's
    ``generate_series(1, greatest(length(text),1), stride)``). Work and
    output are ∝ batch size — no shuffle, no state."""
    def chunks(t: pa.Table) -> pa.Table:
        # id column keeps the caller's type (string/uuid ids crashed
        # on the previous hardcoded int64)
        idtype = t.schema.field(id_col).type
        ids_out, idx_out, chunk_out = [], [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            s = txt or ""
            for ci, start in enumerate(range(0, max(len(s), 1), stride)):
                ids_out.append(did)
                idx_out.append(ci)
                chunk_out.append(s[start:start + size])
        return pa.table({id_col: pa.array(ids_out, idtype),
                         "chunk_idx": pa.array(idx_out, pa.int64()),
                         "chunk": pa.array(chunk_out, pa.string())})

    return ds.map_batches(chunks, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic stratified split
# ---------------------------------------------------------------------------
KNUTH = 2654435761  # Knuth multiplicative hash constant


def assign_split(t: pa.Table, id_col: str = "doc_id", mod: int = 10,
                 val_bucket: int = 0, name: str = "split") -> pa.Table:
    """'val' where (id·KNUTH) mod ``mod`` == ``val_bucket``, else
    'train' — stable across runs, engines and partitionings (pure
    arithmetic on the id; no RNG state).

    The key is computed in uint64 (wrapping mod 2^64) — matching a
    ``(CAST(id AS UBIGINT) * 2654435761) % mod`` oracle for ANY id;
    int64 would silently wrap differently above ids ≈ 3.5e9 while
    DuckDB BIGINT errors. Requires non-negative ids (asserted)."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) and ids.min() < 0:
        raise ValueError("assign_split requires non-negative ids "
                         "(uint64 key arithmetic)")
    with np.errstate(over="ignore"):
        key = (ids.astype(np.uint64) * np.uint64(KNUTH)) % np.uint64(mod)
    lab = np.where(key == val_bucket, "val", "train")
    return t.append_column(name, pa.array(lab, pa.string()))


# ---------------------------------------------------------------------------
# global n-gram statistics
# ---------------------------------------------------------------------------
def top_ngrams(ds, n: int = 5, k: int = 20, text_col: str = "text",
               num_buckets: int = 32):
    """Top-k most frequent token n-grams corpus-wide.

    Three-level exact aggregation, never sorting the full gram table:
    1. per batch, extract grams and pre-count with ``np.unique`` (the
       map-side combiner) — the shuffle carries unique grams per
       block, not raw occurrences;
    2. one ``hash_exchange`` on the gram with Arrow's C++ group-by as
       both the wave ``combine_fn`` and the bucket reduce (a gram
       lands in exactly one bucket, so bucket-local top-k is exact);
    3. a final sort+limit over the ``num_buckets × k`` survivors.
    Ties at the k boundary break on the gram string for determinism.
    (Measured 4.7× faster than Ray's sort-based groupby aggregate on
    the same input — string sort shuffles dominate there.)"""
    import pyarrow.compute as pc

    from etlray.exchange import hash_exchange
    from etlray.stages import LimitTransform, SortTransform

    def partial(t: pa.Table) -> pa.Table:
        grams, _doc = gram_array(norm_tokens_list(t[text_col]), n)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(grams)     # one Arrow C hash-count pass
        return pa.table({"gram": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    def gsum(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "gram").aggregate([("cnt", "sum")])
        return pa.table({"gram": g["gram"], "cnt": g["cnt_sum"]})

    def bucket_topk(t: pa.Table) -> pa.Table:
        t = gsum(t)
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("gram", "ascending")])
        return t.take(idx[:k])

    ds = ds.map_batches(partial, batch_format="pyarrow")
    red = hash_exchange(ds, ["gram"], num_buckets=num_buckets,
                        reduce_fn=bucket_topk, combine_fn=gsum,
                        bucket_col=None)
    red = SortTransform(["cnt", "gram"], descending=[True, False]).apply(red)
    return LimitTransform(k).apply(red)


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------
def doc_frequencies(ds, text_col: str = "text", num_buckets: int = 32,
                    with_doc_count: bool = False):
    """(term, df) over the corpus — df = number of DOCS containing the
    term. Per batch: tokenize (Arrow kernels), dedupe (doc, term) pairs,
    pre-count per term — the exchange carries unique terms per block,
    never raw token occurrences. One hash exchange on the term sums the
    partials.

    ``with_doc_count=True`` adds an ``nd`` column that piggybacks each
    batch's DOC count on its first term row (0 elsewhere): plain sums
    are associative, so ``sum(nd)`` over the final table is the corpus
    doc count — callers that need N (TF-IDF) get it from the SAME text
    pass instead of a second full scan. Every doc yields ≥1 token (null
    and empty text tokenize to [""]), so each non-empty batch has a
    carrier row."""
    import pandas as pd
    import pyarrow.compute as pc

    from etlray.exchange import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        terms, doc_of = gram_array(norm_tokens_list(t[text_col]), 1)
        if len(doc_of) == 0:
            cols = {"term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64())}
            if with_doc_count:
                cols["nd"] = pa.array([], pa.int64())
            return pa.table(cols)
        # distinct (doc, term) then count per term — Arrow C++ hash
        # group-bys end to end (a pandas drop_duplicates over the
        # object-dtype token stream was ~4× the whole pipeline's cost)
        u = pa.table({"d": pa.array(doc_of), "t": terms}) \
            .group_by(["d", "t"]).aggregate([])
        vc = pc.value_counts(u["t"].combine_chunks())
        cols = {"term": vc.field("values"),
                "df": pc.cast(vc.field("counts"), pa.int64())}
        if with_doc_count:
            nd = np.zeros(len(vc), dtype=np.int64)
            nd[0] = t.num_rows
            cols["nd"] = pa.array(nd)
        return pa.table(cols)

    def dsum(t: pa.Table) -> pa.Table:
        aggs = [("df", "sum")] + ([("nd", "sum")] if with_doc_count else [])
        g = pa.TableGroupBy(t, "term").aggregate(aggs)
        cols = {"term": g["term"], "df": g["df_sum"]}
        if with_doc_count:
            cols["nd"] = g["nd_sum"]
        return pa.table(cols)

    pre = ds.map_batches(partial, batch_format="pyarrow")
    return hash_exchange(pre, ["term"], num_buckets=num_buckets,
                         reduce_fn=dsum, combine_fn=dsum, bucket_col=None)


class _TfidfStage:
    """Actor-pool stage: the broadcast (term → df) map plus the corpus
    doc count are fetched and hash-indexed ONCE per actor in
    ``__init__``. Per batch: vectorized tf counts per (doc, term), one
    Index lookup pass for df, score = tf · ln(N/df) rounded to
    ``round_to`` decimals (rounded on BOTH engines so cross-engine
    float noise cannot reorder the top-k), then a C-sorted per-doc
    head(k) with (score desc, term asc) tie-breaking."""

    def __init__(self, df_ref, n_docs: int, k: int, id_col: str,
                 text_col: str, round_to: int) -> None:
        import pandas as pd

        df_tbl = ray.get(df_ref) if isinstance(df_ref, ray.ObjectRef) \
            else df_ref
        self.index = pd.Index(df_tbl["term"])
        self.df = df_tbl["df"].to_numpy()
        self.n_docs = n_docs
        self.k = k
        self.id_col = id_col
        self.text_col = text_col
        self.round_to = round_to

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        # preserve the caller's id type (string uuids, int32, …) —
        # a hardcoded int64 would break the id_col parameter's promise
        idt = t.schema.field(self.id_col).type
        empty = pa.table({self.id_col: pa.array([], idt),
                          "term": pa.array([], pa.string()),
                          "tfidf": pa.array([], pa.float64())})
        terms, doc_of = gram_array(norm_tokens_list(t[self.text_col]), 1)
        if len(doc_of) == 0:
            return empty
        # tf per (doc, term) via Arrow C++ hash group-by — the token
        # stream never touches object-dtype pandas (see partial())
        g = pa.table({"d": pa.array(doc_of), "t": terms}) \
            .group_by(["d", "t"]).aggregate([([], "count_all")])
        tf = pd.DataFrame({"d": g["d"].to_numpy(),
                           "t": g["t"].to_numpy(zero_copy_only=False),
                           "tf": g["count_all"].to_numpy()})
        pos = self.index.get_indexer_for(tf["t"].to_numpy())
        # every term of every doc is in the corpus df table by
        # construction; a miss would mean the two tokenizer passes
        # disagree — surface it rather than emit a wrong score
        if (pos < 0).any():
            raise AssertionError("term missing from corpus df table")
        score = np.round(
            tf["tf"].to_numpy() * np.log(self.n_docs / self.df[pos]),
            self.round_to)
        tf["tfidf"] = score
        top = tf.sort_values(["d", "tfidf", "t"],
                             ascending=[True, False, True], kind="stable") \
            .groupby("d", sort=False).head(self.k)
        ids = t[self.id_col].combine_chunks() \
            if isinstance(t[self.id_col], pa.ChunkedArray) else t[self.id_col]
        return pa.table({
            self.id_col: ids.take(pa.array(top["d"].to_numpy())),
            "term": pa.array(top["t"].to_numpy(), pa.string()),
            "tfidf": pa.array(top["tfidf"].to_numpy(), pa.float64())})


def tfidf_top_terms(ds, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text", round_to: int = 6,
                    concurrency: int = 2):
    """Per-doc top-k terms by TF-IDF (tf · ln(N/df), natural log) —
    corpus keyword extraction for training-data analysis. Docs with
    NULL text are the caller's concern (pre-filter them; N is
    ``ds.count()``).

    Scale shape: two passes over text. Pass 1 builds the (term, df)
    vocabulary distributed (``doc_frequencies``) and broadcasts it
    once via ``ray.put`` — correct while the vocabulary ≪ corpus (the
    normal case: vocab grows ~Heaps' law, sublinear in corpus size).
    For a vocabulary too large to broadcast, swap pass 2's lookup for
    a term-hash-partitioned join of the (doc, term, tf) stream against
    the df table through ``hash_exchange`` and a per-doc re-gather —
    the same fallback documented on decontamination. Pass 2 is an
    actor pool: the df index builds once per actor, each batch is
    vectorized pandas/numpy. No driver-side row loop anywhere."""
    # N rides the df pass (nd piggyback column) — no second scan of text
    df_tbl = doc_frequencies(ds, text_col=text_col, with_doc_count=True)
    import pandas as pd

    parts = [b.to_pandas() for b in df_tbl.iter_batches(batch_format="pyarrow")]
    vocab = pd.concat(parts, ignore_index=True) if parts else \
        pd.DataFrame({"term": [], "df": [], "nd": []})
    n_docs = int(vocab["nd"].sum()) if len(vocab) else 0
    df_ref = ray.put(vocab.drop(columns=["nd"]))
    return ds.map_batches(
        _TfidfStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(df_ref=df_ref, n_docs=n_docs, k=k,
                                   id_col=id_col, text_col=text_col,
                                   round_to=round_to))


def approx_top_ngrams(ds, n: int = 5, k: int = 20, text_col: str = "text",
                      capacity: int = 1 << 19) -> pa.Table:
    """Approximate corpus-wide top-k token n-grams — the zero-shuffle
    Misra-Gries companion to the exact exchange-based ``top_ngrams``:
    each block reduces to one bounded summary row (per-batch
    ``np.unique`` pre-count, MG compress), the driver folds all
    summaries with one vectorized groupby-sum + single compress.

    EXACT (identical to ``top_ngrams``) while the corpus's distinct
    gram count stays ≤ capacity — the regime the SQL oracle checks —
    and a bounded undercount beyond, where the exact path's gram-hash
    exchange becomes the expensive step this sketch avoids. Ties at
    the k boundary break on the gram string, matching the exact
    operator."""
    from etlray.functions.sketch import (MisraGries, _mg_fold,
                                         mg_summary_table)

    def part(t: pa.Table) -> pa.Table:
        grams, _doc = gram_array(norm_tokens_list(t[text_col]), n)
        s = MisraGries(capacity)
        s.add_array(grams.to_numpy(zero_copy_only=False))
        return mg_summary_table(s)

    m = _mg_fold(ds.map_batches(part, batch_format="pyarrow",
                                zero_copy_batch=True), capacity)
    top = m.top(k)
    return pa.table({"gram": pa.array([g for g, _ in top], pa.string()),
                     "cnt": pa.array([c for _, c in top], pa.int64())})


def truncate_tokens(ds, max_tokens: int, text_col: str = "text",
                    out_col: str = "text_trunc"):
    """Token-budget truncation: keep each doc's first ``max_tokens``
    normalized tokens (lower → whitespace-collapse → split — the same
    normalization every other token operator here uses, so budgets
    compose with token_count / pack_token_shards). All Arrow C kernels
    (split → list_slice → binary_join), shuffle-free, output ∝ input.
    NULL text normalizes to "" — pre-filter if SQL-NULL parity matters."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        toks = norm_tokens_list(t[text_col])
        joined = pc.binary_join(pc.list_slice(toks, 0, max_tokens), " ")
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, joined)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
