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
