"""Text analysis: token counts, quality features, lang-id, fingerprint."""

import pyarrow as pa

from etlray.functions import text as T
from etlray.sources import MemorySource


def test_token_count():
    arr = pa.array(["a b  c", " x ", "", None, "one,two"])
    assert T.token_count(arr).to_pylist() == [3, 1, 0, None, 1]
    assert T.token_count(arr, T._BPE_TOKEN_RE).to_pylist() == [3, 1, 0, None, 3]


def test_quality_features_shapes():
    t = pa.table({"text": ["The quick brown fox jumps over the lazy dog.",
                           "1234 5678 !!!", ""]})
    out = T.quality_features(t)
    row = out.to_pylist()[0]
    assert row["word_count"] == 9.0
    assert 0 <= row["quality_score"] <= 1.2
    junk = out.to_pylist()[1]
    assert junk["digit_ratio"] > 0.5
    assert junk["quality_score"] < row["quality_score"]


def test_langid_on_clear_text(ray_session):
    rows = [
        {"doc_id": 1, "text": "the cat and the dog is in the house of that man"},
        {"doc_id": 2, "text": "der Hund und die Katze ist nicht in das Haus"},
        {"doc_id": 3, "text": "le chat et les chiens est dans la maison"},
        {"doc_id": 4, "text": "el perro y la casa es una que los por para"},
        {"doc_id": 5, "text": "这是一个中文句子 关于猫和狗的故事 非常有趣"},
    ]
    ds = MemorySource(rows).read().map_batches(
        T.LangIdStage, fn_constructor_args=("text",),
        batch_format="pyarrow", concurrency=1)
    got = {r["doc_id"]: r["lang_pred"] for r in ds.take_all()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh"}


def test_fingerprint_stability():
    a = T.doc_fingerprint("hello world this is a document")
    b = T.doc_fingerprint("hello   world THIS is a document")  # ws/case normalized
    assert a == b
    c = T.doc_fingerprint("a completely different text body")
    assert a != c
    assert T.doc_fingerprint(None) is None
    assert T.doc_fingerprint("") == 0


def test_repetition_features_exact_fractions():
    import pyarrow as pa

    from etlray.functions.text import repetition_features

    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["a\nb\na\n\na",          # 4 non-empty, 2 distinct
                           "x y x x",                # top word 3/4
                           ""]})
    out = repetition_features(t)
    assert out["n_lines"].to_pylist() == [4, 1, 0]
    dl = out["dup_line_frac"].to_pylist()
    assert dl[0] == 1.0 - 2 / 4 and dl[1] == 0.0 and dl[2] == 0.0
    tw = out["top_word_frac"].to_pylist()
    assert tw[0] == 3 / 4 and tw[1] == 3 / 4 and tw[2] == 0.0


def test_redact_pii():
    import pyarrow as pa

    from etlray.functions.text import redact_pii

    t = pa.table({"text": ["mail me at a.b+c@example.org now",
                           "see https://x.io/path?q=1 and id 1234567",
                           "clean text 123"]})
    out = redact_pii(t)["text_redacted"].to_pylist()
    assert out == ["mail me at <EMAIL> now",
                   "see <URL> and id <NUM>",
                   "clean text 123"]


def _lev_ref(a: str, b: str) -> int:
    """Textbook byte DP — the oracle for the vectorized kernel."""
    x, y = a.encode(), b.encode()
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i]
        for j, cy in enumerate(y, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (cx != cy)))
        prev = cur
    return prev[-1]


def test_levenshtein_matches_bruteforce_and_nulls():
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etlray.functions.text import levenshtein_bytes

    @given(pairs=st.lists(
        st.tuples(st.text("abcé中 ", max_size=10),
                  st.text("abcé中 ", max_size=10)),
        min_size=1, max_size=30))
    @settings(max_examples=30, deadline=None)
    def check(pairs):
        a = pa.array([p[0] for p in pairs])
        b = pa.array([p[1] for p in pairs])
        got = levenshtein_bytes(a, b).to_pylist()
        want = [_lev_ref(*p) for p in pairs]
        assert got == want

    check()
    got = levenshtein_bytes(pa.array([None, "ab", None]),
                            pa.array(["x", None, None])).to_pylist()
    assert got == [None, None, None]


def test_json_scalar_extract_regex_vs_strict(ray_session):
    import pyarrow as pa

    from etlray.sources import MemorySource
    from etlray.stages import JsonScalarExtractTransform

    rows = pa.table({"id": list(range(6)), "props": [
        '{"k": 87, "x": 1}', '{"k": -3.5e2}', '{"k": null}',
        '{"x": 1}', None, '{"k": "12"}',
    ]})
    for strict in (False, True):
        got = {r["id"]: r["k"] for r in JsonScalarExtractTransform(
            "props", "k", out_type="float64", strict=strict).apply(
            MemorySource(rows).read()).take_all()}
        assert got == {0: 87.0, 1: -350.0, 2: None, 3: None, 4: None,
                       5: 12.0}, strict
    # string extraction unescapes; strict handles nesting the regex
    # fast path documents away
    rows2 = pa.table({"id": [0, 1], "props": [
        '{"k": "a\\"b"}', '{"nested": {"k": "inner"}, "k": "top"}',
    ]})
    got = {r["id"]: r["k"] for r in JsonScalarExtractTransform(
        "props", "k", out_type="string", strict=True).apply(
        MemorySource(rows2).read()).take_all()}
    assert got[0] == 'a"b'
    assert got[1] == "top"


def test_dedup_delimited_first_occurrence(ray_session):
    """Duplicate segments drop, first occurrence and order kept;
    NULL stays NULL; empty string and single-segment rows pass."""
    import pyarrow as pa

    from etlray.functions.text import dedup_delimited

    t = pa.table({"text": ["a b a c b", None, "", "x x x", "one"]})
    got = dedup_delimited(t, "text", " ", "d")["d"].to_pylist()
    assert got == ["a b c", None, "", "x", "one"]
    # newline-delimited (the Gopher duplicate-LINE scrub)
    t2 = pa.table({"text": ["l1\nl2\nl1\nl3", "only"]})
    got2 = dedup_delimited(t2, "text")["text_dedup"].to_pylist()
    assert got2 == ["l1\nl2\nl3", "only"]


def test_levenshtein_empty_batch():
    """Ray Data regularly produces 0-row blocks (post-filter, small
    partitions); the NULL mask must be boolean even then — an empty
    list otherwise defaults to float64 and pa.array(mask=...) raises."""
    import pyarrow as pa

    from etlray.functions.text import levenshtein_bytes

    out = levenshtein_bytes(pa.array([], pa.string()),
                            pa.array([], pa.string()))
    assert len(out) == 0


def test_json_extract_int64_matches_duckdb_cast(ray_session):
    """int64 extraction == DuckDB CAST(props->>'$.k' AS BIGINT) on BOTH
    paths: integer strings convert exactly (2^53-safe), fractional
    values round HALF AWAY FROM ZERO ('2.5' -> 3, '-2.5' -> -3)."""
    import duckdb
    import pyarrow as pa

    from etlray.sources import MemorySource
    from etlray.stages import JsonScalarExtractTransform

    docs = ['{"k": 1.9}', '{"k": 2.5}', '{"k": -2.5}', '{"k": 7}',
            '{"k": 9007199254740993}', '{"k": null}', '{"x": 1}', None]
    rows = pa.table({"id": list(range(len(docs))),
                     "props": pa.array(docs, pa.string())})
    con = duckdb.connect()
    con.register("t", rows)
    want = dict(con.execute(
        "SELECT id, CAST(props->>'$.k' AS BIGINT) FROM t").fetchall())
    for strict in (False, True):
        got = {r["id"]: r["k"] for r in JsonScalarExtractTransform(
            "props", "k", out_type="int64", strict=strict).apply(
            MemorySource(rows).read()).take_all()}
        assert got == want, strict


def test_json_to_i64_fuzz_vs_duckdb():
    """Property: _json_to_i64 on a numeric STRING == DuckDB
    CAST(varchar AS BIGINT) — exact for integer strings, half away
    from zero for fractional ones (bounded |x| so neither side
    overflows; shortest-repr floats keep text and double parses in
    agreement at the .5 boundaries)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etlray.stages.common import _json_to_i64

    con = duckdb.connect()
    # |x| >= 1e-4 keeps repr out of exponent form: DuckDB 1.0.0 casts
    # tiny exponent-form strings with a cascaded per-digit rounding
    # ('5.960464477539063e-08' -> 1, probed), a quirk we neither
    # reproduce nor rely on
    nums = st.one_of(
        st.integers(-2**62, 2**62),
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e12, max_value=1e12).filter(
            lambda x: x == 0.0 or abs(x) >= 1e-4))

    @given(v=nums)
    @settings(max_examples=200, deadline=None)
    def check(v):
        s = repr(v) if isinstance(v, float) else str(v)
        want = con.execute("SELECT CAST(? AS BIGINT)", [s]).fetchone()[0]
        assert _json_to_i64(s) == want, s

    check()
