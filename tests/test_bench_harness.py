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


def test_bench_records_pg_roundtrip_sink_marker(spark, monkeypatch, capsys):
    """A green etl_pg_roundtrip row must say WHICH engine it exercised:
    'postgres-copy' (live server) or 'parquet-fallback' (no toolchain) —
    the silent-fallback finding from VERDICT r7 item 4."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF_SMOKE)
    monkeypatch.setenv("BENCH_QUERIES", "etl_pg_roundtrip")
    monkeypatch.setenv("BENCH_E2E", "0")
    rc = bench.main()
    line = [
        ln for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ][-1]
    d = json.loads(line)
    assert rc == 0
    assert d["pg_roundtrip_sink"] in ("postgres-copy", "parquet-fallback")
    from parquet_to_postgres_spark.pg import postgres_available

    want = "postgres-copy" if postgres_available() else "parquet-fallback"
    assert d["pg_roundtrip_sink"] == want


def test_bench_composite_block(spark, monkeypatch, capsys):
    """BENCH_COMPOSITE=1 adds the curate_corpus funnel: wall-clock, the
    ordered per-stage counts (monotone non-increasing after 'input'),
    and the shard-manifest total (VERDICT r7 item 5)."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", SF_SMOKE)
    monkeypatch.setenv("BENCH_QUERIES", "top_k_global")
    monkeypatch.setenv("BENCH_E2E", "0")
    monkeypatch.setenv("BENCH_COMPOSITE", "1")
    rc = bench.main()
    line = [
        ln for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ][-1]
    d = json.loads(line)
    assert rc == 0
    comp = d["composite"]
    assert comp["sec"] > 0
    counts = list(comp["stages"].values())
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts[1:], counts[2:]))
    assert comp["shards_total"] == counts[-1]
