"""Compare two bench.py JSON artifacts and print per-query deltas.

Usage:
    python -m tools.bench_compare BENCH_r02.json bench_out.json [--threshold 1.4]

Lists regressions (new/old >= threshold AND absolute slowdown >= 0.5 s),
improvements at the same bar, and inventory changes. Exit code 1 if any
regression — usable as a gate.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.4)
    ap.add_argument("--abs-floor", type=float, default=0.5)
    args = ap.parse_args()

    def load(path):
        d = json.load(open(path))
        if "queries" in d:
            return d["queries"]
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return d["parsed"]["queries"]
        raise SystemExit(f"{path}: no per-query timings (driver tail-only record?)")

    old = load(args.old)
    new = load(args.new)
    shared = sorted(set(old) & set(new))
    valid = [n for n in shared if old[n] > 0 and new[n] > 0]

    regressions, improvements = [], []
    for n in valid:
        ratio = new[n] / old[n]
        if ratio >= args.threshold and new[n] - old[n] >= args.abs_floor:
            regressions.append((n, old[n], new[n], ratio))
        elif 1 / ratio >= args.threshold and old[n] - new[n] >= args.abs_floor:
            improvements.append((n, old[n], new[n], ratio))

    t_old = sum(old[n] for n in valid)
    t_new = sum(new[n] for n in valid)
    print(f"shared queries: {len(valid)}  aggregate {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.2f}x)")
    print(f"added: {sorted(set(new) - set(old))or '-'}")
    print(f"removed: {sorted(set(old) - set(new)) or '-'}")
    for tag, rows in (("REGRESSION", regressions), ("improvement", improvements)):
        for n, o, v, r in sorted(rows, key=lambda x: -abs(x[3] - 1)):
            print(f"{tag:11s} {n:28s} {o:7.2f}s -> {v:7.2f}s ({r:.2f}x)")
    raise SystemExit(1 if regressions else 0)


if __name__ == "__main__":
    main()
