"""Pins the bench-output contract that protects per-round perf evidence.

Round 5's official total was lost because the single full JSON line
outgrew the driver's ~2000-char stdout tail capture (BENCH_r05.json
``parsed: null``). The contract now: ``bench.py`` prints the full detail
JSON early, writes it to ``bench_out.json``, and prints a compact summary
as the FINAL stdout line. These tests pin (a) the summary stays well
under the capture window even with an absurdly large catalog, and (b) the
summary is the last thing ``main`` emits.
"""

from __future__ import annotations

import ast
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _fake_full(n_queries: int) -> dict:
    qs = {f"query_with_a_rather_long_name_{i:04d}": 123.456 for i in range(n_queries)}
    return {
        "metric": "headline_queries_total_wall",
        "value": 99999.999,
        "materialized_total_wall": 88888.888,
        "materialized_n": n_queries - 2,
        "unit": "sec",
        "partial": False,
        "queries": qs,
        "queries_median": qs,
        "errors": {},
        "repeats_min": 3,
        "sf": 100.0,
    }


def test_summary_line_under_500_chars_even_at_500_queries():
    line = bench.summary_line(_fake_full(500))
    assert len(line) < 500
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == 99999.999
    assert parsed["n_queries"] == 500
    # round-8: the honest full-materialization total rides in the
    # summary, labeled with its coverage
    assert parsed["materialized_total_wall"] == 88888.888
    assert parsed["materialized_n"] == 498


def test_summary_line_materialized_keys_survive_absence():
    """A materialize-disabled run must still emit the keys (null/0) so
    the driver artifact's schema is stable across modes."""
    full = _fake_full(10)
    del full["materialized_total_wall"]
    del full["materialized_n"]
    parsed = json.loads(bench.summary_line(full))
    assert parsed["materialized_total_wall"] is None
    assert parsed["materialized_n"] == 0


def test_summary_line_is_parseable_with_errors_and_null_total():
    full = _fake_full(36)
    full["value"] = None
    full["partial"] = True
    full["errors"] = {"some_query": "RuntimeError: boom"}
    parsed = json.loads(bench.summary_line(full))
    assert parsed["value"] is None
    assert parsed["partial"] is True
    assert parsed["n_errors"] == 1


def test_main_prints_summary_last():
    """Static check: the final print() in bench.main is the summary line.

    Cheaper than a subprocess JVM spin-up, and pins exactly the property
    the driver depends on — whatever lands last on stdout must be the
    compact line.
    """
    src = open(os.path.join(os.path.dirname(bench.__file__) or ".", "bench.py")).read()
    tree = ast.parse(src)
    main_fn = next(
        n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    prints = [
        n
        for n in ast.walk(main_fn)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Name)
        and n.func.id == "print"
        # ignore stderr prints (per-query failure logs)
        and not any(k.arg == "file" for k in n.keywords)
    ]
    last = max(prints, key=lambda n: n.lineno)
    # last stdout print must be print(summary_line(...))
    arg = last.args[0]
    assert isinstance(arg, ast.Call)
    assert isinstance(arg.func, ast.Name) and arg.func.id == "summary_line"


def test_bench_writes_detail_file_contract():
    """bench.main writes bench_out.json next to bench.py (source-pinned)."""
    src = open(os.path.join(os.path.dirname(bench.__file__) or ".", "bench.py")).read()
    assert "bench_out.json" in src


def test_bench_out_matches_latest_round_artifact():
    """Round-8 verdict item 2 (recurred from round 7): the committed
    ``bench_out.json`` must describe the SAME run as the latest official
    ``BENCH_r{N}.json`` artifact, so BENCH_NOTES can never again analyze
    a different run than the one the driver recorded. The driver writes
    BENCH_r{N}.json from bench.py's stdout (whose detail lands in
    bench_out.json); committing a stale bench_out with a newer artifact
    is exactly the mismatch this pins."""
    import glob
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    assert arts, "no BENCH_r*.json artifacts"
    with open(arts[-1]) as f:
        art = json.load(f)
    parsed = art.get("parsed")
    if not parsed or parsed.get("value") is None:
        # r05-style tail-capture loss: nothing comparable (the summary
        # contract above prevents recurrence)
        return
    with open(os.path.join(here, "bench_out.json")) as f:
        out = json.load(f)
    latest_round = int(re.search(r"BENCH_r(\d+)", arts[-1]).group(1))
    notes = os.path.join(here, f"BENCH_NOTES_r{latest_round + 1:d}.md")
    if os.path.exists(notes):
        with open(notes) as f:
            notes_text = f.read()
        if out.get("value") is not None and str(out["value"]) in notes_text:
            # the documented PRE-CLOSE run for the upcoming round: newer
            # than the latest driver artifact by design (the driver's own
            # close run restores the bench_out == BENCH_r{N} invariant).
            # A bench_out matching NEITHER the artifact NOR the notes
            # still fails below — the original stale-analysis class.
            return
    for field in (
        "metric",
        "value",
        "materialized_total_wall",
        "materialized_n",
        "unit",
        "partial",
        "repeats_min",
        "sf",
    ):
        assert parsed.get(field) == out.get(field), (
            field,
            parsed.get(field),
            out.get(field),
        )
    assert parsed["n_queries"] == len(out["queries"])
    assert parsed["n_errors"] == len(out["errors"])


def test_per_query_lines_survive_tail_capture():
    """Round-14 (r13 verdict item 2): per-query timings must reach the
    driver through its ~2000-char stdout tail. Pins: every line parses
    standalone, stays under the chunk budget, centisecond values round-trip,
    and the SLOWEST queries sit in the LAST line (the guaranteed-surviving
    one, right before the summary)."""
    timings = {f"query_with_a_rather_long_name_{i:04d}": i / 100.0 for i in range(80)}
    lines = bench.per_query_lines(timings)
    assert lines
    merged = {}
    for line in lines:
        assert len(line) <= 600
        parsed = json.loads(line)
        assert set(parsed) == {"queries_cs"}
        merged.update(parsed["queries_cs"])
    assert merged == {n: int(round(t * 100)) for n, t in timings.items()}
    last_chunk = json.loads(lines[-1])["queries_cs"]
    assert max(merged.values()) in last_chunk.values()
    first_chunk = json.loads(lines[0])["queries_cs"]
    assert min(merged.values()) in first_chunk.values()


def test_per_query_lines_empty_and_single():
    assert bench.per_query_lines({}) == []
    (line,) = bench.per_query_lines({"q": 1.234})
    assert json.loads(line) == {"queries_cs": {"q": 123}}
