"""Merge the round-9 per-cell decade captures (.bench/r9_decade/) into
one sf10 -> sf100 table with per-decade ratios and alpha = log10(ratio).
Cells are named <fixture>_<query>[ _runN ].json; _run1/_run2 pairs are
kept as distinct rows (index build+query vs cold-process warm-index).
Usage: python tools/merge_r9.py"""

from __future__ import annotations

import glob
import json
import math
import os

BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "r9_decade"
)


def load_cells(prefix: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for p in sorted(glob.glob(os.path.join(BENCH, f"{prefix}_*.json"))):
        name = os.path.basename(p)[len(prefix) + 1 : -5]
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        (q, v), = d["median"].items()
        key = name if name.endswith(("_run1", "_run2")) else q
        if v >= 0:
            out[key] = v
    return out


def main() -> None:
    sf10 = load_cells("sf10")
    sf100 = load_cells("sf100")
    with open(os.path.join(BENCH, "MERGED_r9.json"), "w") as f:
        json.dump({"sf10_cold": sf10, "sf100_cold": sf100}, f, indent=1, sort_keys=True)
    print(f"{'query':38s} {'sf10':>8s} {'sf100':>8s} {'ratio':>6s} {'alpha':>6s}")
    for name in sorted(set(sf10) | set(sf100), key=lambda n: -sf100.get(n, -1)):
        v10, v100 = sf10.get(name, float("nan")), sf100.get(name, float("nan"))
        r = v100 / v10 if v10 and v10 == v10 and v100 == v100 else float("nan")
        a = math.log10(r) if r and r == r and r > 0 else float("nan")
        print(f"{name:38s} {v10:8.1f} {v100:8.1f} {r:6.1f} {a:6.2f}")


if __name__ == "__main__":
    main()
