"""Text-analysis stages for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All stages are vectorized ``map_batches`` bodies (pyarrow.compute regex
kernels / numpy) — no Python loop over rows in any hot path except the
winnowing fingerprint, which is numpy-windowed per doc.

No counterpart exists in the reference (it has no scalar-function
library, SURVEY.md §2.7); these are the operations the 100 TB
training-data tier needs on the ``documents`` table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------
_WS_TOKEN_RE = r"\S+"
_BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(arr, pattern: str = _WS_TOKEN_RE) -> pa.Array:
    """Vectorized token count: number of regex matches per string
    (whitespace tokens by default; pass _BPE_TOKEN_RE for a BPE-ish
    split of letters / digits / punctuation runs)."""
    return pc.count_substring_regex(arr, pattern)


def add_token_counts(t: pa.Table, col: str = "text") -> pa.Table:
    t = t.append_column("n_tokens", _cc(token_count(t[col])))
    t = t.append_column("n_bpe_tokens", _cc(token_count(t[col], _BPE_TOKEN_RE)))
    return t


def _cc(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / digit / stopword ratios)
# ---------------------------------------------------------------------------
_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
_STOP_RE = r"(?i)\b(?:" + "|".join(_STOPWORDS) + r")\b"
_PUNCT_RE = r"[!-/:-@\[-`{-~]"
_DIGIT_RE = r"[0-9]"


def quality_features(t: pa.Table, col: str = "text") -> pa.Table:
    """Append char_count, word_count, avg_word_len, punct_ratio,
    digit_ratio, stop_ratio, quality_score — all Arrow kernels."""
    s = t[col]
    chars = pc.cast(pc.utf8_length(s), pa.float64())
    words = pc.cast(pc.count_substring_regex(s, _WS_TOKEN_RE), pa.float64())
    punct = pc.cast(pc.count_substring_regex(s, _PUNCT_RE), pa.float64())
    digit = pc.cast(pc.count_substring_regex(s, _DIGIT_RE), pa.float64())
    stops = pc.cast(pc.count_substring_regex(s, _STOP_RE), pa.float64())
    safe_chars = pc.max_element_wise(chars, 1.0)
    safe_words = pc.max_element_wise(words, 1.0)
    avg_wl = pc.divide(chars, safe_words)
    punct_ratio = pc.divide(punct, safe_chars)
    digit_ratio = pc.divide(digit, safe_chars)
    stop_ratio = pc.divide(stops, safe_words)
    # heuristic composite in [0, 1]: long-enough, word-shaped, some
    # stopwords, not punctuation/digit soup
    len_score = pc.min_element_wise(pc.divide(words, 100.0), 1.0)
    wl_score = pc.if_else(pc.and_(pc.greater_equal(avg_wl, 3.0),
                                  pc.less_equal(avg_wl, 12.0)), 1.0, 0.5)
    noise = pc.min_element_wise(pc.add(punct_ratio, digit_ratio), 1.0)
    score = pc.multiply(pc.multiply(len_score, wl_score),
                        pc.subtract(1.0, pc.multiply(noise, 0.5)))
    score = pc.add(pc.multiply(score, 0.8),
                   pc.multiply(pc.min_element_wise(stop_ratio, 0.5), 0.4))
    for name, col_arr in [("char_count", chars), ("word_count", words),
                          ("avg_word_len", avg_wl), ("punct_ratio", punct_ratio),
                          ("digit_ratio", digit_ratio), ("stop_ratio", stop_ratio),
                          ("quality_score", score)]:
        t = t.append_column(name, _cc(col_arr))
    return t


# ---------------------------------------------------------------------------
# language ID (n-gram / stopword heuristic)
# ---------------------------------------------------------------------------
#: per-language marker words — tiny, fast, adequate for bucketing;
#: a real pipeline would swap in fasttext via an actor-pool stage.
_LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to", "that", "with", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "para"],
    "pt": ["o", "a", "os", "que", "um", "uma", "não", "para"],
}
_CJK_RE = r"[一-鿿]"


class LangIdStage:
    """Actor-pool stage: compiles per-language regexes ONCE per actor
    (__init__), scores each batch with vectorized regex counts.

    Output column ``lang_pred`` ∈ {en,de,fr,es,pt,zh,unknown}.
    """

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.lang_res = {
            lang: r"(?i)\b(?:" + "|".join(ws) + r")\b"
            for lang, ws in _LANG_MARKERS.items()
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        s = t[self.text_col]
        words = np.maximum(
            pc.count_substring_regex(s, _WS_TOKEN_RE).to_numpy(zero_copy_only=False), 1)
        scores = np.stack([
            pc.count_substring_regex(s, rx).to_numpy(zero_copy_only=False) / words
            for rx in self.lang_res.values()
        ])
        langs = np.array(list(self.lang_res.keys()))
        best = np.argmax(scores, axis=0)
        best_score = scores[best, np.arange(scores.shape[1])]
        cjk = pc.count_substring_regex(s, _CJK_RE).to_numpy(zero_copy_only=False)
        chars = np.maximum(pc.utf8_length(s).to_numpy(zero_copy_only=False), 1)
        pred = np.where(cjk / chars > 0.05, "zh",
                        np.where(best_score > 0.01, langs[best], "unknown"))
        return t.append_column("lang_pred", pa.array(pred.tolist(), type=pa.string()))


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash / winnowing)
# ---------------------------------------------------------------------------
_MOD = np.uint64(0xFFFFFFFFFFFFFFC5)  # large prime < 2^64
_BASE = np.uint64(1000003)


def _rolling_hashes(codes: np.ndarray, window: int) -> np.ndarray:
    """All w-gram polynomial hashes of a uint8 code sequence, vectorized
    via a sliding window view and a powers dot-product (mod 2^64 wrap)."""
    if len(codes) < window:
        return np.array([np.sum(codes.astype(np.uint64) *
                                _BASE ** np.arange(len(codes), dtype=np.uint64))],
                        dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(codes, window).astype(np.uint64)
    powers = _BASE ** np.arange(window, dtype=np.uint64)  # wraps mod 2^64
    return win @ powers


def doc_fingerprint(text: str | None, window: int = 8) -> int | None:
    """Winnowing-style fingerprint: min rolling-window hash of the
    normalized text — stable under small appends/prepends."""
    if text is None:
        return None
    norm = " ".join(text.lower().split())
    codes = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
    if len(codes) == 0:
        return 0
    return int(_rolling_hashes(codes, window).min() & np.uint64(0x7FFFFFFFFFFFFFFF))


def add_fingerprint(t: pa.Table, col: str = "text", window: int = 8) -> pa.Table:
    fps = [doc_fingerprint(v, window) for v in t[col].to_pylist()]
    return t.append_column("fingerprint", pa.array(fps, type=pa.int64()))


def repetition_features(t: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 quality
    filters), vectorized over the batch: ``n_lines`` (non-empty),
    ``dup_line_frac`` (1 − distinct/total non-empty lines) and
    ``top_word_frac`` (most frequent lowercase token's share). All
    counts are integers, so a SQL oracle reproduces the exact
    fractions. No per-row Python: lines/tokens flatten once per batch
    through Arrow list kernels + pandas C groupbys."""
    import numpy as np
    import pandas as pd

    s = t[col]
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    n = len(s)

    # ---- lines ------------------------------------------------------
    lines = pc.split_pattern(s, pattern="\n")
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lines)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    lp = parents[keep]
    lv = np.asarray(flat.to_pandas(), dtype=object)[keep]
    total = np.bincount(lp, minlength=n).astype(np.float64)
    if len(lp):
        dd = pd.DataFrame({"p": lp, "v": lv}).drop_duplicates()
        distinct = np.bincount(dd["p"].to_numpy(), minlength=n).astype(np.float64)
    else:
        distinct = np.zeros(n)
    dup_line = np.where(total > 0, 1.0 - distinct / np.maximum(total, 1.0), 0.0)

    # ---- tokens -----------------------------------------------------
    toks = pc.split_pattern_regex(pc.utf8_lower(s), pattern=r"\s+")
    tparents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    tflat = pc.list_flatten(toks)
    tkeep = pc.not_equal(tflat, "").to_numpy(zero_copy_only=False)
    tp = tparents[tkeep]
    tv = np.asarray(tflat.to_pandas(), dtype=object)[tkeep]
    ttotal = np.bincount(tp, minlength=n).astype(np.float64)
    top = np.zeros(n)
    if len(tp):
        cnt = pd.DataFrame({"p": tp, "v": tv}).groupby(["p", "v"],
                                                       sort=False).size()
        mx = cnt.groupby(level=0).max()
        top[mx.index.to_numpy()] = mx.to_numpy().astype(np.float64)
    top_word = np.where(ttotal > 0, top / np.maximum(ttotal, 1.0), 0.0)

    t = t.append_column("n_lines", pa.array(total.astype(np.int64)))
    t = t.append_column("dup_line_frac", pa.array(dup_line, type=pa.float64()))
    t = t.append_column("top_word_frac", pa.array(top_word, type=pa.float64()))
    return t


_PII_PATTERNS = [
    # order matters (applied sequentially, identical in the SQL oracle)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://\S+", "<URL>"),
    (r"\d{6,}", "<NUM>"),
]


def redact_pii(t: pa.Table, col: str = "text",
               out_col: str = "text_redacted") -> pa.Table:
    """Redact emails / URLs / long digit runs — the standard corpus
    scrubbing pass before training. Vectorized
    ``pc.replace_substring_regex`` (RE2), and DuckDB's
    ``regexp_replace(..., 'g')`` runs the same RE2 engine, so a SQL
    oracle reproduces the output byte-for-byte."""
    s = t[col]
    for pat, repl in _PII_PATTERNS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    return t.append_column(out_col, _cc(s))


def levenshtein_bytes(a_col, b_col) -> "pa.Array":
    """Byte-based Levenshtein distance between two string arrays —
    DuckDB ``levenshtein()`` semantics exactly (probed: it counts
    UTF-8 BYTES, ``levenshtein('é','e') = 2``; NULL if either side is
    NULL). Vectorized across the batch: the classic DP runs over the
    two PADDED byte matrices with every cell update a numpy op over
    all rows at once — O(maxlen_a × maxlen_b) numpy calls regardless
    of batch size, no per-row Python. Each row's answer is harvested
    the moment the DP row index reaches that row's length, so memory
    stays O(rows × maxlen_b)."""
    import numpy as np

    a = a_col.to_pylist() if hasattr(a_col, "to_pylist") else list(a_col)
    b = b_col.to_pylist() if hasattr(b_col, "to_pylist") else list(b_col)
    n = len(a)
    # dtype pinned: an empty batch would otherwise default to float64
    # and pa.array(mask=...) requires a boolean mask
    null = np.array([x is None or y is None for x, y in zip(a, b)],
                    dtype=bool)
    ab = [x.encode("utf-8") if isinstance(x, str) else b"" for x in a]
    bb = [y.encode("utf-8") if isinstance(y, str) else b"" for y in b]
    la = np.fromiter((len(x) for x in ab), dtype=np.int64, count=n)
    lb = np.fromiter((len(y) for y in bb), dtype=np.int64, count=n)
    La, Lb = (int(la.max()) if n else 0), (int(lb.max()) if n else 0)
    A = np.zeros((n, La), dtype=np.uint8)
    B = np.zeros((n, Lb), dtype=np.uint8)
    for i, x in enumerate(ab):
        A[i, :len(x)] = np.frombuffer(x, dtype=np.uint8)
    for i, y in enumerate(bb):
        B[i, :len(y)] = np.frombuffer(y, dtype=np.uint8)
    res = np.zeros(n, dtype=np.int64)
    rng = np.arange(n)
    cur = np.tile(np.arange(Lb + 1, dtype=np.int64), (n, 1))
    done = la == 0
    res[done] = lb[done]
    js = np.arange(1, Lb + 1, dtype=np.int64)
    for i in range(1, La + 1):
        prev = cur
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]            # (n, 1)
        cost = (ai != B).astype(np.int64)    # (n, Lb)
        sub = prev[:, :-1] + cost
        dele = prev[:, 1:] + 1
        np.minimum(sub, dele, out=sub)
        # the insertion recurrence cur_j = min(sub_{j-1}, cur_{j-1}+1)
        # unrolls to cur_j = j + min(i, prefix-min_{m<=j}(sub_{m-1}-m))
        # — a running min, so one accumulate replaces the j loop
        if Lb:
            pm = np.minimum.accumulate(sub - js[None, :], axis=1)
            cur[:, 1:] = js[None, :] + np.minimum(i, pm)
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
    import pyarrow as pa

    return pa.array(np.where(null, 0, res), type=pa.int64(), mask=null)


def add_levenshtein(t: pa.Table, col_a: str, col_b: str,
                    out_col: str = "edit_distance") -> pa.Table:
    """map_batches adapter for :func:`levenshtein_bytes`."""
    return t.append_column(out_col,
                           levenshtein_bytes(t[col_a], t[col_b]))


def dedup_delimited(t: pa.Table, col: str = "text",
                    delimiter: str = "\n",
                    out_col: str = "text_dedup") -> pa.Table:
    """Within-row duplicate-segment removal, first occurrence kept —
    the Gopher-style repetition scrub generalized over any delimiter
    (newline for duplicate LINES, space for duplicate TOKENS). SQL
    oracle: split → first-occurrence ordinal per (row, segment) →
    string_agg back in ordinal order.

    Vectorized across the batch: ONE Arrow split, a pandas C
    ``duplicated`` over (parent_row, segment), one ``np.bincount``
    for the surviving offsets and ONE ``binary_join`` back — no
    per-row Python. NULL inputs stay NULL."""
    import pandas as pd

    s = _cc(t[col])
    lists = pc.split_pattern(s, pattern=delimiter)
    flat = lists.values
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = ~pd.DataFrame(
        {"p": parent,
         "s": flat.to_pandas()}).duplicated().to_numpy()
    kept_child = flat.filter(pa.array(keep))
    counts = np.bincount(parent[keep], minlength=len(s))
    # rows where the split itself is NULL contribute no children;
    # give them an empty segment list and re-mask after the join
    offsets = np.zeros(len(s) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(
            offsets, pc.cast(kept_child, pa.large_string())),
        pa.scalar(delimiter, pa.large_string()))
    null_mask = pc.is_null(s)
    joined = pc.if_else(null_mask, pa.scalar(None, pa.large_string()),
                        joined)
    return t.append_column(out_col, pc.cast(joined, pa.string()))
