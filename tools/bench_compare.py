"""Compare two bench.py JSON outputs: per-query deltas, regressions first.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
Exit code 1 if any query slowed by more than the threshold ratio (default
1.3x) AND by more than 0.5s absolute (filters run-to-run noise on tiny
queries).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1]) if "=" in a else float(args.pop())
    old = json.load(open(args[0]))["queries"]
    new = json.load(open(args[1]))["queries"]

    rows = []
    for name in sorted(set(old) | set(new)):
        a, b = old.get(name), new.get(name)
        if a is None or b is None or a <= 0 or b <= 0:
            rows.append((float("inf"), name, a, b, "added" if a is None else "removed" if b is None else "error"))
            continue
        rows.append((b / a, name, a, b, ""))

    regressions = 0
    for ratio, name, a, b, note in sorted(rows, reverse=True):
        if note:
            print(f"  {name:30s} {note}")
            continue
        flag = ""
        if ratio > threshold and (b - a) > 0.5:
            flag = " REGRESSION"
            regressions += 1
        elif ratio < 1 / threshold and (a - b) > 0.5:
            flag = " improved"
        print(f"  {name:30s} {a:7.2f} -> {b:7.2f}  ({ratio:5.2f}x){flag}")

    ta = sum(v for v in old.values() if v > 0)
    tb = sum(v for v in new.values() if v > 0)
    print(f"\ntotal: {ta:.1f}s -> {tb:.1f}s; {regressions} regression(s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
