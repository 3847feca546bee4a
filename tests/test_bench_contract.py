"""The driver parses bench.py's LAST stdout line from an
exactly-2000-char tail capture — rounds 3 and 4 both recorded
``"parsed": null`` because the contract line outgrew the window.
These tests pin the guarantee: the line always fits and always parses,
at any query count."""

import json

import bench
from etlray.queries import QUERIES


def _roundtrip(line: str) -> dict:
    assert len(line) <= 1800, f"contract line {len(line)} chars"
    # simulate the driver: take the last 2000 chars of a stdout whose
    # final line is the contract line, then json-parse the last line
    stdout = "x" * 5000 + "\n" + line + "\n"
    tail = stdout[-2000:]
    return json.loads(tail.strip().splitlines()[-1])


def test_contract_line_small_query_set():
    line = bench.contract_line(12.345, 1_234_567.8,
                               {"q1": 1.234, "q2": 0.567}, 0.1, 32)
    parsed = _roundtrip(line)
    assert parsed["metric"] == "cdc_replay_sec"
    assert parsed["value"] == 12.345
    assert parsed["events_per_sec"] == 1234567.8
    assert parsed["queries"] == {"q1": 1.23, "q2": 0.57}
    assert parsed["num_cpus"] == 32


def test_contract_line_real_registry():
    # the REAL query registry (130+ names) degrades to a parseable line
    # that KEEPS a registry-order per-query prefix (the headline
    # pipelines stay visible) plus the true total in n_queries; the
    # detail line keeps the full map at 3 dp
    queries = {k: 123.456 for k in QUERIES}
    line = bench.contract_line(99.999, 9_999_999.9, queries, 0.1, 32)
    parsed = _roundtrip(line)
    assert parsed["value"] == 99.999
    assert parsed["events_per_sec"] == 9999999.9
    assert parsed["n_queries"] == len(QUERIES)
    kept = parsed["queries"]
    assert 0 < len(kept) < len(QUERIES)
    # prefix in registry order, values at 1 dp
    assert list(kept) == list(QUERIES)[:len(kept)]
    assert all(v == 123.5 for v in kept.values())


def test_contract_line_pathological_query_count():
    # even 500 long-named queries can't break the parse; the kept
    # prefix shrinks to whatever fits
    queries = {f"very_long_query_name_number_{i:04d}": 12.345
               for i in range(500)}
    line = bench.contract_line(1.0, 2.0, queries, 0.001, 8)
    parsed = _roundtrip(line)
    assert parsed["value"] == 1.0 and parsed["n_queries"] == 500
    if "queries" in parsed:
        assert list(parsed["queries"]) == list(queries)[:len(parsed["queries"])]


def test_contract_line_unshrinkable_names_drop_the_map():
    # absurd single-entry width: the loop must terminate and still
    # emit a parseable line even if that means no queries map at all
    queries = {("q" * 2500): 1.0}
    line = bench.contract_line(1.0, 2.0, queries, 0.001, 8)
    parsed = _roundtrip(line)
    assert parsed["n_queries"] == 1 and "queries" not in parsed
