"""Fresh-JVM floor probe for the q3 open observation (VERDICT r08 task 2).

Protocol (the SURVEY §6 round-8 probe, now committed as a script so the
re-measure is reproducible): must be started on a genuinely idle box
(1-min load < 1 — the script exits 2 otherwise, mirroring bench_budget's
"inconclusive" contract), in a FRESH JVM. Then:

  1. ~5s all-core sha2 burn (executor-thread + codegen-infra warmup);
  2. each probed query once at sf0.001 and once untimed at sf1
     (tiered-JIT warm at full-scale row counts — the SURVEY §6 noise
     model's dominant first-run effect);
  3. N timed iterations per query (default 20), cache cleared before
     each, full execution through the noop sink.

Reports per query: min (the converged floor), settled (median of the
last half, after C2 has fully quiesced), all raw runs, and load
averages before/after. q5_local_supplier rides along as the
never-drifted CONTROL: if the control's floor moved the same way, the
environment moved, not q3.

Usage: python scripts/q3_probe.py [out.json] [n_iters]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBED = ["q3_shipping_priority", "q5_local_supplier"]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "Q3_PROBE.json"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    load_start = [round(x, 2) for x in os.getloadavg()]
    if load_start[0] >= 1.0:
        print(f"INCONCLUSIVE: 1-min load {load_start[0]} >= 1.0 — rerun on an idle box", file=sys.stderr)
        return 2

    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans import all_queries
    from scripts.benchutil import cpu_burn
    from scripts.make_benchdata import ensure

    spark = get_spark(app_name="aus-etl-q3-probe")
    queries = all_queries()
    burn_sec = cpu_burn(spark)

    # data-free machine yardstick (the SURVEY §6 round-7 calibration job):
    # sha2 over 64M generated rows, all cores. Its converged floor tracks
    # the HOST's all-core CPU-dense throughput independent of any plan or
    # parquet layout — round 7 measured 0.55-0.65s; round 9 measured
    # 0.79-0.91s on the same job, which is what closed the q3 observation
    # as a host-level shift (virtualized neighbors), not a plan effect.
    calib = []
    for _ in range(8):
        t0 = time.perf_counter()
        spark.range(0, 64_000_000, 1, 32).selectExpr(
            "count(sha2(cast(id as string), 256)) as n"
        ).collect()
        calib.append(round(time.perf_counter() - t0, 3))

    large_dir = ensure(spark)
    warm_dir = "/root/testdata/sf0.001"

    for name in PROBED:
        queries[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        queries[name](spark, large_dir).write.mode("overwrite").format("noop").save()

    result: dict = {
        "metric": "q3_floor_probe",
        "n_iters": n_iters,
        "burn_sec": burn_sec,
        "calib_sha2_64m": calib,
        "load_avg_start": load_start,
        "queries": {},
    }
    for name in PROBED:
        runs = []
        for _ in range(n_iters):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, large_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        tail = runs[n_iters // 2 :]
        result["queries"][name] = {
            "min": min(runs),
            "settled_median_last_half": round(statistics.median(tail), 3),
            "runs": runs,
        }
        print(f"# {name}: min {min(runs)}s settled {statistics.median(tail)}s", file=sys.stderr)
    result["load_avg_end"] = [round(x, 2) for x in os.getloadavg()]

    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, out_path)
    print(json.dumps({k: v for k, v in result.items() if k != "queries"} | {
        "queries": {n: {"min": q["min"], "settled": q["settled_median_last_half"]} for n, q in result["queries"].items()}
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
