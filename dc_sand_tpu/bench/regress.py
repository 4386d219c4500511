"""Benchmark regression tracking (SURVEY.md §4.2 "Regression" row).

``python -m dc_sand_tpu.bench.regress`` compares the newest result of
each benchmark under ``bench/results/`` against the previous one and
flags drops beyond tolerance.  Results files are written per run by
``BenchResult.save`` keyed by commit + timestamp.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

TOLERANCE = 0.10  # flag >10% throughput drop


def load_results(results_dir: str = "bench/results"):
    by_name = defaultdict(list)
    for path in sorted(glob.glob(os.path.join(results_dir, "*.json"))):
        try:
            with open(path) as f:
                rec = json.loads(f.readline())
            ts = int(path.rsplit("_", 1)[1].split(".")[0])
            by_name[rec["name"]].append((ts, rec, path))
        except (ValueError, KeyError, IndexError):
            continue
    for name in by_name:
        by_name[name].sort(key=lambda t: t[0])
    return by_name


def main(results_dir: str = "bench/results") -> int:
    by_name = load_results(results_dir)
    if not by_name:
        print(f"no results under {results_dir}")
        return 0
    failed = False
    for name, runs in sorted(by_name.items()):
        _, latest, _ = runs[-1]
        if len(runs) < 2:
            print(f"{name}: {latest['value']:.4g} {latest['unit']} "
                  "(first recording)")
            continue
        _, prev, _ = runs[-2]
        ratio = latest["value"] / prev["value"] if prev["value"] else 0
        mark = "OK"
        if ratio < 1 - TOLERANCE:
            mark = "REGRESSION"
            failed = True
        elif ratio > 1 + TOLERANCE:
            mark = "improved"
        print(f"{name}: {latest['value']:.4g} {latest['unit']} "
              f"({ratio - 1:+.1%} vs prev) [{mark}]")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
