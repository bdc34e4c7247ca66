"""The shared driver-thread overlap helper (concurrency.overlap) —
the r15 review consolidation of three hand-rolled scaffoldings.

The invariants under test are exactly the ones the bespoke copies got
wrong or diverged on: threads are ALWAYS joined (even when the main
thread raises), no error is swallowed, and main's error outranks
background errors."""

from __future__ import annotations

import threading
import time

import pytest

from parquet_to_postgres_spark.concurrency import overlap


def test_overlap_returns_main_and_background_results():
    out, bg = overlap([lambda: "a", lambda: "b"], lambda: "m")
    assert out == "m"
    assert bg == ["a", "b"]


def test_overlap_defaults_to_noop_main():
    out, bg = overlap([lambda: 1, lambda: 2])
    assert out is None
    assert bg == [1, 2]


def test_overlap_background_error_reraised_by_position():
    def boom():
        raise ValueError("bg-1")

    with pytest.raises(ValueError, match="bg-1"):
        overlap([lambda: "ok", boom, lambda: "ok2"], lambda: "m")


def test_overlap_main_error_wins_and_threads_are_joined():
    finished = threading.Event()

    def slow_bg():
        time.sleep(0.3)
        finished.set()
        raise RuntimeError("bg loses")

    def main():
        raise KeyError("main wins")

    with pytest.raises(KeyError, match="main wins"):
        overlap([slow_bg], main)
    # the join-in-finally contract: by the time overlap raised, the
    # background thread had completed — nothing left running
    assert finished.is_set()


def test_overlap_joins_before_raising_background_error():
    order: list[str] = []

    def bg_fail():
        order.append("fail")
        raise RuntimeError("first")

    def bg_slow():
        time.sleep(0.2)
        order.append("slow-done")

    with pytest.raises(RuntimeError, match="first"):
        overlap([bg_fail, bg_slow])
    assert "slow-done" in order  # the healthy thread ran to completion


def test_ann_prep_overlap_matches_sequential(spark, monkeypatch):
    """r15: ann_topk_all_methods overlaps its two prep checkpoints and
    the IVF dimension probe on driver threads (guide §2.6).  The legs
    are independent jobs, so the overlapped result must be row-identical
    to the sequential ordering it replaced — pinned here by monkey-
    patching the module's overlap symbol with a sequential twin."""
    import parquet_to_postgres_spark.llm.similarity as S
    from .conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus = emb.where("vec_id >= 5")
    queries = emb.where("vec_id < 5")

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    got = canon(S.ann_topk_all_methods(corpus, queries, k=5))

    def sequential(background, main=lambda: None):
        r = main()
        return r, [fn() for fn in background]

    monkeypatch.setattr(S, "overlap", sequential)
    want = canon(S.ann_topk_all_methods(corpus, queries, k=5))
    assert got == want
