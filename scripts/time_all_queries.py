"""Time EVERY registry query at one SF through the noop sink (guide §1.4).

Optimization-round instrumentation (r12): the bench covers 12 headliners;
this script gives the full per-operator baseline the round's checklist needs.
Methodology matches bench.py: one untimed warm run per query (plan + codegen
compile), then min-of-N timed runs with the cache cleared before each, all
through `noop` so the computation is timed, not a sink. Jobs are labelled so
the UI/REST view maps back to queries.

Usage:
    python scripts/time_all_queries.py [sf_dir] [out.json] [--runs N]
    python scripts/time_all_queries.py --only q5_local_supplier,q3_...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_path = args[1] if len(args) > 1 else "time_all_out.json"
    runs = 2
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))

    from australian_company_etl_spark.plans import all_queries
    from australian_company_etl_spark.session import get_spark
    from scripts.benchutil import cpu_burn

    spark = get_spark(app_name="time-all-queries")
    queries = all_queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    cpu_burn(spark)
    # host yardstick (same as bench.py): compare calib before comparing runs
    calib = []
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(0, 64_000_000, 1, 32).selectExpr(
            "count(sha2(cast(id as string), 256)) as n"
        ).collect()
        calib.append(round(time.perf_counter() - t0, 3))

    times: dict[str, float] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(queries):
        fn = queries[name]
        try:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            rs = []
            for i in range(runs):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"timed{i}:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                rs.append(round(time.perf_counter() - t0, 3))
            times[name] = min(rs)
            spreads[name] = round(max(rs) - min(rs), 3)
            print(f"# {name}: {times[name]}s (spread {spreads[name]}s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)

    out = {
        "sf_dir": sf_dir,
        "runs": runs,
        "calib_sha2_64m": calib,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "total_sec": round(sum(times.values()), 3),
        "times": dict(sorted(times.items(), key=lambda kv: -kv[1])),
        "spreads": spreads,
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"total_sec": out["total_sec"], "n": len(times), "errors": len(errors), "calib": calib}))


if __name__ == "__main__":
    main()
