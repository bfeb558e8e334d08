"""Merge the per-query isolated sf100 capture files with the sf10 controls
and print the heavy-tail decade table (sf10 cold -> sf100 cold, per-decade
ratio). Control files are applied in order, so later captures (re-runs
after a fix, e.g. the file-sink streaming drains) supersede earlier ones.
Usage: python tools/merge_sf100.py"""

from __future__ import annotations

import glob
import json
import os

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench")

#: sf10 controls, oldest first — later files win per query
CONTROLS = [
    "BENCH_DETAIL_sf10_heavy_r8.json",
    "BENCH_DETAIL_sf10_heavy_r8b.json",
    "BENCH_DETAIL_sf10_heavy_r8c.json",  # file-sink streaming drains
    "BENCH_DETAIL_sf10_heavy_r8d.json",  # size-adapted neardup drain
    "BENCH_DETAIL_sf10_heavy_r8e.json",  # chunked bloom merge
    "BENCH_DETAIL_sf10_heavy_r8f.json",  # round-8 widening: 4 more families
    "BENCH_DETAIL_sf10_heavy_r8g.json",  # events/CDC/as-of widening
    "BENCH_DETAIL_sf10_heavy_r8h.json",  # q1 decade row
    "BENCH_DETAIL_sf10_heavy_r8i.json",  # dedup_normalized post-62x-fix
    "BENCH_DETAIL_sf10_heavy_r8j.json",  # curation_pipeline composite row
]


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)["median"]


def main() -> None:
    sf100: dict[str, float] = {}
    for p in sorted(glob.glob(os.path.join(BENCH, "sf100_detail", "*.json"))):
        sf100.update({k: v for k, v in load(p).items() if v >= 0})
    sf10: dict[str, float] = {}
    for name in CONTROLS:
        p = os.path.join(BENCH, name)
        if os.path.exists(p):
            sf10.update({k: v for k, v in load(p).items() if v >= 0})
    with open(os.path.join(BENCH, "BENCH_DETAIL_sf100_heavy_r8.json"), "w") as f:
        json.dump({"sf10_cold": sf10, "sf100_cold": sf100}, f, indent=1, sort_keys=True)
    print(f"{'query':28s} {'sf10':>8s} {'sf100':>8s} {'ratio':>6s}")
    for name, v100 in sorted(sf100.items(), key=lambda kv: -kv[1]):
        v10 = sf10.get(name, -1)
        r = v100 / v10 if v10 and v10 > 0 and v100 > 0 else float("nan")
        print(f"{name:28s} {v10:8.1f} {v100:8.1f} {r:6.1f}")


if __name__ == "__main__":
    main()
