"""Benchmark harness: times every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT machine-parsable JSON line as the LAST stdout line:
    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "n_queries": N, "sf": 0.1, "detail": "BENCH_DETAIL.json"}
and writes per-query timings (all repeats + the median actually reported)
to BENCH_DETAIL.json next to this file. The old format inlined all ~111
per-query timings into the line, which overflowed the driver's capture and
left four rounds of perf evidence unparsed.

Each query is timed $SPARK_GRAFT_BENCH_REPS times (default 3) and the
MEDIAN is reported, so one-off cold-start attribution (JIT/codegen warm-up
landing on whichever query runs first) can't masquerade as a regression.

Materialization is a noop-sink write — full computation of every output
column, no driver-side collect bottleneck.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from mover_spark.session import get_spark

REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("mover-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown queries: {unknown}")
        qs = {n: qs[n] for n in names}
    excl = os.environ.get("SPARK_GRAFT_BENCH_EXCLUDE", "").strip()
    if excl:
        names = [n.strip() for n in excl.split(",") if n.strip()]
        unknown = [n for n in names if n not in entrymod.queries()]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_EXCLUDE unknown queries: {unknown}")
        qs = {n: f for n, f in qs.items() if n not in names}
    # Fixed warm-up protocol at the smallest fixture: one query per
    # execution mode (whole-stage codegen agg, Arrow pandas-UDF, Structured
    # Streaming micro-batch) so first-use JIT/interpreter startup lands here
    # instead of inflating whichever suite query runs that mode first.
    all_qs = entrymod.queries()  # warm-ups run even under a _BENCH_ONLY subset
    for warm in (
        "q1_pricing_summary",      # whole-stage codegen agg
        "dedup_minhash_lsh",       # Arrow pandas-UDF kernels
        "embedding_cosine_pairs",  # blocked-matmul mapInPandas tiles
        "streaming_tumbling",      # Structured Streaming micro-batch
    ):
        try:
            all_qs[warm](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    # SPARK_GRAFT_BENCH_COLD=1 (see below) keeps its own detail series:
    # a cold capture must never overwrite (or be diffed against) the
    # committed warm series — the two disagree by exactly the session-memo
    # price the knob exists to isolate (VERDICT r12 next #4)
    cold = os.environ.get("SPARK_GRAFT_BENCH_COLD", "") == "1"
    detail_default = "BENCH_DETAIL_COLD.json" if cold else "BENCH_DETAIL.json"
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", os.path.join(REPO_DIR, detail_default)
    )
    # previous committed medians, read BEFORE this run overwrites the file:
    # the mover flags below make per-query regressions vs the last capture
    # tooling-visible instead of a narrative claim (VERDICT r11 next #6 —
    # the round-11 close note said "the three biggest movers are all
    # untouched" while the capture's #1 mover was touched code)
    prev_median: dict[str, float] = {}
    prev_cold = False
    try:
        with open(detail_path) as f:
            prev_detail = json.load(f)
        prev_median = prev_detail.get("median", {})
        prev_cold = bool(prev_detail.get("cold", False))
    except Exception:
        pass

    def loadavg():
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:
            return None

    def steal_jiffies():
        """Cumulative CPU steal jiffies (col 8 of /proc/stat's cpu line).
        On shared tenancy (this sandbox is a Firecracker guest) co-tenant
        steal moves in multi-minute epochs and can inflate every query in
        a capture 2x+; recording the per-query delta makes host drift a
        committed, inspectable column instead of a narrative claim."""
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except Exception:
            return None

    # SPARK_GRAFT_BENCH_COLD=1: release the session-scoped operator memos
    # before each query so every query pays its own full cost — ORDER-
    # INDEPENDENT numbers for attribution work (solo A/Bs approximate
    # this). NOT the default: the warm suite is the committed time series
    # (rounds 1-12), and real interactive sessions do hit the memos; the
    # round-12 close showed a window rotation alone re-deals ~20 s of
    # medians among cache-consumer queries, which is what this knob
    # isolates.

    def clear_session_caches():
        from mover_spark.operators.dedup import clear_dedup_caches
        from mover_spark.operators.retrieval import clear_retrieval_caches
        from mover_spark.operators.similarity import clear_similarity_caches
        from mover_spark.operators.text import clear_text_caches

        clear_dedup_caches()
        clear_retrieval_caches()
        clear_similarity_caches()
        clear_text_caches()

    runs: dict[str, list[float]] = {}
    timings: dict[str, float] = {}
    load: dict[str, list[float] | None] = {}
    steal: dict[str, int | None] = {}
    for name, fn in qs.items():
        if cold:
            clear_session_caches()
        load[name] = loadavg()  # host noise sampled at each query's start
        s0 = steal_jiffies()
        samples: list[float] = []
        for _ in range(reps):
            t0 = time.time()
            try:
                materialize(fn(spark, sf_dir))
                samples.append(round(time.time() - t0, 3))
            except Exception as exc:  # a broken query must not sink the suite
                print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
                break
        s1 = steal_jiffies()
        steal[name] = (s1 - s0) if (s0 is not None and s1 is not None) else None
        runs[name] = samples
        timings[name] = round(statistics.median(samples), 3) if len(samples) == reps else -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # movers: median moved >1.5x in either direction vs the previous
    # committed detail (only pairs where both sides are >= 0.2 s — below
    # that, scheduler jitter dominates and every flag would be noise).
    # Only like-vs-like (ADVICE r12): a cold capture diffed against a warm
    # prev flags the memo price of every cache-consumer query as a
    # spurious mover — when the modes differ, skip the computation and say
    # so instead of poisoning this file for the next comparison too.
    mode_mismatch = bool(prev_median) and prev_cold != cold
    movers = {} if mode_mismatch else {
        name: {"prev": prev_median[name], "now": t,
               "ratio": round(t / prev_median[name], 2)}
        for name, t in timings.items()
        if name in prev_median
        and t >= 0.2 and prev_median[name] >= 0.2
        and (t > 1.5 * prev_median[name] or prev_median[name] > 1.5 * t)
    }
    with open(detail_path, "w") as f:
        json.dump(
            {
                "sf": float(sf),
                "reps": reps,
                "cpus": cpus,
                "total_median_sec": total,
                "median": timings,
                "runs": runs,
                "loadavg_at_start": load,
                "steal_jiffies": steal,
                "movers_vs_prev": movers,
                "movers_mode_mismatch": mode_mismatch,
                "cold": cold,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    # a warm run reports the committed cold companion's total alongside,
    # so the per-round capture line carries BOTH series (VERDICT r12 #4).
    # Only when the companion was captured at THIS run's core count: the
    # committed cold series is a 32-core capture, and re-printing it next
    # to an 8-core warm run labeled it as that run's cold measurement
    # (VERDICT r13 wrong #2 — BENCH_r13_c8 carried a stale 32-core
    # "cold_total_sec"). A mismatched capture is reported stale, with the
    # cpus it was actually taken at.
    companion = {}
    if not cold:
        try:
            with open(os.path.join(REPO_DIR, "BENCH_DETAIL_COLD.json")) as f:
                cd = json.load(f)
            cold_cpus = cd.get("cpus")
            if cold_cpus == cpus:
                companion = {
                    "cold_total_sec": cd["total_median_sec"],
                    "cold_detail": "BENCH_DETAIL_COLD.json",
                }
            else:
                companion = {
                    "cold_total_stale": cd["total_median_sec"],
                    "cold_stale_cpus": cold_cpus,
                    "cold_detail": "BENCH_DETAIL_COLD.json",
                }
        except Exception:
            pass
    line = json.dumps(
        {
            "metric": "suite_seconds",
            "value": total,
            "unit": "sec",
            "n_queries": len(timings),
            "n_errors": sum(1 for t in timings.values() if t < 0),
            "sf": float(sf),
            "cpus": cpus,
            # the driver's per-query perf/scaling contract (VERDICT r13
            # next #1): compact name -> median-seconds map, ~4 KB at 171
            # queries — far below the all-reps inline form that overflowed
            # the capture in rounds 9-12. Reps/loadavg/steal stay in the
            # detail file.
            "per_query": timings,
            "detail": os.path.basename(detail_path),
            "loadavg": loadavg(),
            "movers_gt_1.5x": sorted(movers),
            **({"movers_mode_mismatch": True} if mode_mismatch else {}),
            **({"cold": True} if cold else {}),
            **companion,
        }
    )
    # the machine-parsable result is the LAST stdout line, flushed, with
    # console progress disabled session-wide so nothing trails it
    print(line, flush=True)


if __name__ == "__main__":
    main()
