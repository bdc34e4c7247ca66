"""bench.py error isolation — the round-4 lesson as a pinned contract.

A single broken query (bad name, fixture drift, anything) must not
zero out the whole benchmark: the harness records it under "errors",
keeps measuring the rest, prints the JSON line, and signals via exit
code.  Round 4 lost its entire BENCH file to one loader break; this
keeps that class of failure partial and diagnosable.
"""

from __future__ import annotations

import json

from .conftest import SF_SMOKE


def test_bench_isolates_broken_queries(spark, monkeypatch, capsys):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF_SMOKE)
    monkeypatch.setenv("BENCH_QUERIES", "pricing_summary,no_such_query")
    rc = bench.main()
    line = [
        ln for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ][-1]
    d = json.loads(line)
    assert rc == 1  # errors present -> nonzero, but AFTER printing JSON
    assert "pricing_summary" in d["queries"]  # the good query measured
    assert d["queries"]["pricing_summary"] > 0
    assert "no_such_query" in d["errors"]  # the bad one recorded
    assert d["value"] > 0  # total reflects measured queries


def test_bench_clean_run_exits_zero(spark, monkeypatch, capsys):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF_SMOKE)
    monkeypatch.setenv("BENCH_QUERIES", "top_k_global")
    rc = bench.main()
    line = [
        ln for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ][-1]
    d = json.loads(line)
    assert rc == 0 and "errors" not in d
    assert set(d["queries"]) == {"top_k_global"}
