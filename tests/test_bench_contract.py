"""Contract tests for bench.py's driver-facing output.

The driver records only a bounded tail of bench stdout (2000 chars
observed in BENCH_r06.json) and json-parses the final line. Round 6's
inline per-query samples dict pushed that line past the capture and
the round's perf artifact came back "parsed": null with 11 of 36
queries clipped (VERDICT r6 task 1). These tests pin the contract:
the FINAL stdout line is the compact {metric, value, unit, queries,
sf} object, it fits the tail budget even at worst-case float widths
for every benchable query name, and the sample distributions live in
the BENCH_SAMPLES.json sidecar instead.
"""

from __future__ import annotations

import json

import bench

DRIVER_TAIL_CHARS = 2000


def _registry_names() -> list[str]:
    import __spark_entry__ as E
    from tests.parity_registry import PARITY_QUERIES

    return sorted({*E.queries(), *PARITY_QUERIES, *bench.SPECIAL})


def test_headline_names_resolve():
    names = set(_registry_names())
    missing = [n for n in bench.HEADLINE if n not in names]
    assert missing == []


def test_compact_line_fits_driver_tail_at_worst_case_widths():
    # Worst case the compact line actually reaches: every HEADLINE name
    # (the set bench emits; the full registry is ~80 names and would
    # not fit, which is why HEADLINE growth must re-run this test) with
    # the widest value bench can emit (round(x, 3) of a five-digit-
    # second wall -> 9 chars).
    times = {n: 99999.999 for n in [*bench.HEADLINE]}
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    # Headroom: the line itself plus its trailing newline must fit the
    # tail even if the driver's capture shrinks somewhat.
    assert len(line) + 1 <= DRIVER_TAIL_CHARS - 200, len(line)


def test_driver_tail_parse_roundtrip():
    # Simulate the driver: keep the last 2000 chars of a stdout that
    # has warmup noise before the final line, parse the last line.
    times = {n: 12.345 for n in bench.HEADLINE}
    final = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    stdout = "warmup chatter\n" * 500 + final + "\n"
    tail = stdout[-DRIVER_TAIL_CHARS:]
    parsed = json.loads(tail.strip().rsplit("\n", 1)[-1])
    assert parsed["metric"] == "headline_queries_total_wall"
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_samples_go_to_sidecar_not_stdout(tmp_path, monkeypatch):
    # The samples dict must never ride the stdout line again; bench
    # writes it to the sidecar. Exercise the exact emit path with
    # SPARK_GRAFT_BENCH_ONLY narrowing to zero queries so no Spark
    # work runs — which also exercises the clobber guard: a diagnostic
    # subset run must NOT touch the repo's committed BENCH_SAMPLES.json
    # (only the explicit SPARK_GRAFT_BENCH_SAMPLES target opts in).
    import importlib.util
    import io
    import os
    import sys

    monkeypatch.setenv("SPARK_GRAFT_BENCH_ONLY", "no_such_query")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PASSES", "1")
    target = tmp_path / "BENCH_SAMPLES.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SAMPLES", str(target))
    repo_sidecar = os.path.join(os.path.dirname(bench.__file__),
                                "BENCH_SAMPLES.json")
    before = open(repo_sidecar, "rb").read() if os.path.exists(repo_sidecar) \
        else None
    spec = importlib.util.spec_from_file_location(
        "bench_copy", os.path.join(os.path.dirname(bench.__file__), "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cap = io.StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        mod.main()
    finally:
        sys.stdout = old
    out_line = cap.getvalue().strip().rsplit("\n", 1)[-1]
    parsed = json.loads(out_line)
    assert "samples" not in parsed
    assert parsed["queries"] == {}
    side = json.load(open(target, encoding="utf-8"))
    assert "samples" in side
    # atomic write (ADVICE r7): the temp file must not linger — the
    # sidecar was os.replace'd into place, so a crash mid-dump would
    # have left the previous artifact intact, never a truncated one
    assert not os.path.exists(str(target) + ".tmp")
    after = open(repo_sidecar, "rb").read() if os.path.exists(repo_sidecar) \
        else None
    assert after == before  # the committed artifact was not clobbered
