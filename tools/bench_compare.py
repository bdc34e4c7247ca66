"""Compare a bench JSON line against the BASELINE.md medians table and
flag per-query regressions — the same check the judge applies.

Usage:
    python bench.py > /tmp/bench.json && \
    python tools/bench_compare.py /tmp/bench.json [ratio_threshold]

Exit 0 iff every common query is within threshold (default 2.0 — the
driver bound; use 1.25 for the stricter self-imposed bar).
"""

from __future__ import annotations

import json
import re
import sys


def baseline_medians(path: str = "BASELINE.md") -> dict[str, float]:
    out: dict[str, float] = {}
    for line in open(path):
        m = re.match(r"\| (\w+) \| ([0-9.]+) \|$", line.strip())
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def main() -> int:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdin"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    bench = json.loads(open(bench_path).read().strip().splitlines()[-1])
    base = baseline_medians()
    if not base:
        print("no baseline table parsed from BASELINE.md", file=sys.stderr)
        return 2

    bad = []
    rows = []
    for name, sec in sorted(bench["queries"].items()):
        b = base.get(name)
        ratio = sec / b if b else None
        rows.append((name, sec, b, ratio))
        if ratio is not None and ratio > threshold:
            bad.append(name)
    missing_baseline = [n for n, _, b, _ in rows if b is None]
    missing_bench = sorted(set(base) - set(bench["queries"]))

    for name, sec, b, ratio in rows:
        flag = " <-- REGRESSION" if name in bad else ""
        rs = f"{ratio:.2f}x" if ratio is not None else "  no-baseline"
        print(f"{name:32s} {sec:7.3f}s  base {b or float('nan'):7.3f}s  {rs}{flag}")
    total_base = sum(b for _, _, b, _ in rows if b)
    total_bench = sum(s for _, s, b, _ in rows if b)
    if total_base:
        print(
            f"\nTOTAL (common queries): {total_bench:.1f}s vs "
            f"{total_base:.1f}s baseline = {total_bench / total_base:.2f}x"
        )
    if missing_baseline:
        print(f"no baseline entry: {missing_baseline}")
    if missing_bench:
        print(f"in baseline but not benched: {missing_bench}")
    if bench.get("errors"):
        print(f"BENCH ERRORS: {bench['errors']}")
        return 1
    if bad:
        print(f"\n{len(bad)} queries over {threshold}x: {bad}")
        return 1
    print(f"\nall queries within {threshold}x of baseline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
