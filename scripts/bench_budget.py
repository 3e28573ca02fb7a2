"""sf1 bench-budget tripwire (VERDICT r05 task 6).

The round-5 shingle regression was visible in the driver's BENCH json but
nothing FAILED — the plan-shape tests all passed and the wall-time drift
was argued away as noise. This is the loud version: re-time the sf1
headliners and compare each against a recorded budget with generous
(2x) headroom, so a plan-shape regression of the round-5 magnitude
(minhash 2.0→2.9s, +45%) trips only when it is far outside spread, while
ordinary machine noise (the recorded spreads are 0.02-0.55s) never does.

Budgets are measured sf1 medians IN THIS SCRIPT'S OWN CONTEXT on the
reference hardware (32-core local mode, idle); re-record them (--record)
after any deliberate plan change. Ambient load is printed with the result
so a breach can be judged against machine state (BENCH json carries the
same load_avg fields).

Round-7 noise model (measured, see SURVEY §6): there is NO machine-level
idle-start ramp on this host — a fixed all-core job profiles identically
from a 12-min-idle box and a hot one. What does vary run-to-run is
in-JVM JIT: the first execution of a codegen path is ~10× slower, and C2
compile threads competing with 32 executor threads occasionally leave a
heavy query 1.5-2× slow through all three timed runs of a fresh JVM
(observed once: ngram 6.8s vs 4.1s back-to-back). Hence (a) an all-core
burn precedes the first timed region, (b) a breach is only reported if
it PERSISTS on an immediate same-JVM re-time (by then compilation has
settled; a genuine plan regression does not recover), and (c) budgets
must be recorded by THIS script, not copied from bench.py's
deeper-warmup context.

Usage:
  python scripts/bench_budget.py            # check, exit 1 on breach
  python scripts/bench_budget.py --record   # print refreshed budget dict
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf1"
)
SF10_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf10"
)

# measured sf1 medians (sec) in THIS script's context on the 32-core
# reference machine; budget = 2x — generous against noise, tight against a
# 45%-class regression compounding unnoticed across rounds. ALL budgets +
# CALIB_REF_SEC re-recorded as one set in round 12 (the tokenizer
# split-first rewrite touched every token-family plan; per policy budgets
# are re-recorded after any deliberate plan change, on the same host-day
# as the calib reference they normalize against).
BUDGET_SEC = {
    "dedup_minhash_lsh": 1.9,
    "text_fingerprint": 0.4,
    "dedup_ngram_jaccard": 4.5,
    "dedup_substring_spans": 1.4,
    "q5_local_supplier": 1.3,
    "q3_shipping_priority": 1.4,
}
HEADROOM = 2.0

# sf10 budgets (VERDICT r11 task 6): the five slowest sf10 queries — the
# tier where text_inverted_index drifted 2× across rounds with an identical
# plan and nothing mechanical would have caught a real regression. Medians
# measured in THIS script's context (idle 32-core reference box, r12, after
# the probed-adaptive G8 default and the setsim GC work landed); same 2×
# headroom and calib normalization as the sf1 set. knn_graph_lsh_adaptive
# is the LIBRARY default (not a registry key) — resolved by import below.
SF10_BUDGET_SEC = {
    "dedup_minhash_lsh": 7.3,
    "dedup_setsim_prefix": 49.1,
    "rank_neardup_pagerank": 10.5,
    "text_inverted_index": 1.2,
    "knn_graph_lsh_adaptive": 40.1,
}
SF10_RUNS = 2  # sf10 queries are 5-50s each; 2 timed runs after warm

# Host-speed normalization (VERDICT r09 / ADVICE): the absolute budgets
# above are meaningful only relative to the host throughput of the day
# they were recorded — round 9 measured the SAME host swinging its
# data-free sha2-64M all-core floor 0.55→1.4s within one day (virtualized
# neighbors). Without normalization a slow-host day breaches spuriously
# and a fast-host day can hide a real plan regression inside the 2x
# headroom. The calib floor is re-measured (min of 3) in every run and
# each breach threshold is scaled by calib_now / CALIB_REF_SEC, clamped
# to [0.5, 3] so a broken calib measurement can never widen the budget
# unboundedly or collapse it to zero. CALIB_REF_SEC is the floor measured
# in the SAME run that recorded the budgets (--record prints both).
CALIB_REF_SEC = 1.22


def _calib(spark) -> float:
    """The fixed data-free all-core sha2-64M yardstick (same job as
    bench.py's context calib) — min of 3 so one scheduling hiccup can't
    inflate the day's ratio."""
    ts = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 64_000_000, 1, 32).selectExpr(
            "count(sha2(cast(id as string), 256)) as n"
        ).collect()
        ts.append(time.time() - t0)
    return min(ts)


def _sched_probe(spark) -> float:
    """Median latency of 10 trivial 32-task jobs — the per-JOB dispatch
    yardstick (SCHED_DIAG_r10.json): VM instances vary 10-20x in task-launch
    latency (~20 ms healthy, ~220 ms degraded) while calib moves only
    1.5-2x. Multi-stage queries carry n_stages × dispatch on top of their
    compute, so on a degraded-dispatch instance a breach is a host artifact
    unless it persists relative to BOTH yardsticks."""
    ts = []
    for _ in range(10):
        t0 = time.time()
        spark.range(0, 32, 1, 32).selectExpr("sum(id) as s").collect()
        ts.append(time.time() - t0)
    return sorted(ts)[5]


def _best_time(fn, spark, runs: int = 3, sf_dir: str = SF1_DIR) -> float:
    """Min of N timed runs — the standard noise-robust wall-time statistic:
    ambient load only ever ADDS time, so the minimum is the closest
    observable to the machine-idle cost the budget encodes."""
    fn(spark, sf_dir).count()  # warm (JIT + page cache)
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        ts.append(time.time() - t0)
    return min(ts)


def main() -> int:
    from australian_company_etl_spark.plans import all_queries
    from australian_company_etl_spark.session import get_spark

    record = "--record" in sys.argv[1:]
    spark = get_spark()
    qs = all_queries()
    load_before = [round(x, 2) for x in os.getloadavg()]
    # all-core burn BEFORE any timed region: executor warmup + insurance
    # against environments that DO throttle from idle (this host measurably
    # does not — SURVEY §6 round-7 correction). Runs AFTER load_before so
    # the burn can't mask genuine ambient load in the inconclusive-under-
    # load verdict below.
    from scripts.benchutil import cpu_burn

    cpu_burn(spark)
    calib = _calib(spark)
    ratio = max(0.5, min(3.0, calib / CALIB_REF_SEC))
    sched = _sched_probe(spark)
    measured: dict[str, float] = {}
    breaches: list[str] = []
    for name, budget in BUDGET_SEC.items():
        limit = budget * HEADROOM * ratio
        t = _best_time(qs[name], spark)
        if not record and t > limit:
            # confirm before reporting: a fresh JVM occasionally leaves one
            # heavy query 1.5-2x slow through all three timed runs (C2
            # compile threads competing with the executors); by now the
            # codegen paths are fully compiled, so a re-time separates that
            # one-off from a genuine plan regression, which persists.
            t = min(t, _best_time(qs[name], spark))
            if t > limit:
                breaches.append(
                    f"{name}: {t:.2f}s > {budget}*{HEADROOM}*{ratio:.2f} "
                    f"calib-normalized budget"
                )
        measured[name] = round(t, 3)
    from australian_company_etl_spark.plans.similarity import knn_graph_lsh_adaptive

    sf10_measured: dict[str, float] = {}
    if os.path.isdir(SF10_DIR):
        sf10_fns = dict(qs)
        sf10_fns["knn_graph_lsh_adaptive"] = knn_graph_lsh_adaptive
        for name, budget in SF10_BUDGET_SEC.items():
            limit = budget * HEADROOM * ratio
            t = _best_time(sf10_fns[name], spark, runs=SF10_RUNS, sf_dir=SF10_DIR)
            if not record and t > limit:
                t = min(t, _best_time(sf10_fns[name], spark, runs=SF10_RUNS, sf_dir=SF10_DIR))
                if t > limit:
                    breaches.append(
                        f"{name}[sf10]: {t:.2f}s > {budget}*{HEADROOM}*{ratio:.2f} "
                        f"calib-normalized budget"
                    )
            sf10_measured[name] = round(t, 3)
    load = [round(x, 2) for x in os.getloadavg()]
    print(
        json.dumps(
            {
                "measured_sec": measured,
                "sf10_measured_sec": sf10_measured,
                "calib_sha2_64m": round(calib, 3),
                "calib_ref": CALIB_REF_SEC,
                "calib_ratio": round(ratio, 3),
                "sched_probe_32task_median": round(sched, 4),
                "load_avg_before": load_before,
                "load_avg_after": load,
            }
        )
    )
    if record:
        print("BUDGET_SEC =", json.dumps({k: round(v, 1) for k, v in measured.items()}))
        print(
            "SF10_BUDGET_SEC =",
            json.dumps({k: round(v, 1) for k, v in sf10_measured.items()}),
        )
        print("CALIB_REF_SEC =", round(calib, 2))
        return 0
    if breaches:
        # a breach measured on an already-busy box is not a verdict — judge
        # by the PRE-RUN load (during the run our own Spark stages dominate
        # loadavg, so the after reading can't separate self from ambient).
        # Even moderate ambient load (4-8 on 32 cores) was measured
        # inflating these CPU-bound queries ~70%, so the clean-verdict bar
        # is a genuinely quiet box: 1-min load under cpus/8.
        cpus = os.cpu_count() or 8
        if load_before[0] > 0.125 * cpus:
            print("INCONCLUSIVE: budget exceeded but machine under heavy load")
            for b in breaches:
                print(" ", b)
            return 2
        if sched > 0.1:
            # degraded-dispatch VM instance (SCHED_DIAG_r10.json): each of
            # the headliners' stages carries ~sched of pure launch latency
            # that the calib ratio cannot see; a breach here is a host
            # artifact unless it reproduces on a healthy-dispatch day
            print(
                f"INCONCLUSIVE: budget exceeded but per-job dispatch is "
                f"degraded (sched median {sched:.3f}s > 0.1s)"
            )
            for b in breaches:
                print(" ", b)
            return 2
        print("BENCH BUDGET BREACH (plan regression at sf1):")
        for b in breaches:
            print(" ", b)
        return 1
    print("OK: all sf1 and sf10 headliners within budget")
    return 0


if __name__ == "__main__":
    sys.exit(main())
