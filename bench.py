"""Headline benchmark — one JSON line for the driver.

Runs the SURVEY §6 headliners (TPC-H core, minhash dedup, ANN brute force,
text analysis, event-time agg) at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is forced end-to-end through the
`noop` sink (full execution, no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINERS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "dedup_minhash_lsh",
    "ann_brute_topk",
    "text_langid",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "events_tumbling_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from australian_company_etl_spark.session import get_spark
    from australian_company_etl_spark.plans import all_queries

    spark = get_spark(app_name="aus-etl-bench")
    queries = all_queries()

    # JVM/codegen warmup outside the timed region: run every headliner once
    # at the smallest SF so the timed loop measures throughput, not
    # per-plan codegen/JIT
    warm_dir = "/root/testdata/sf0.001" if os.path.isdir("/root/testdata/sf0.001") else sf_dir
    for name in HEADLINERS:
        queries[name](spark, warm_dir).write.mode("overwrite").format("noop").save()

    # min of 2 timed runs per query: machine noise at this data scale is of
    # the same order as the queries themselves, and the driver records one
    # number. The cache is cleared before every run so internal persists
    # from the previous run can't turn the second run into a cache read —
    # each timed run does the full compute with warmed codegen/JIT.
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINERS:
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
        times[name] = best
        total += best
        print(f"# {name}: {best}s", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
